package graft.tools

import org.apache.spark.sql.SparkSession

/** Config-matrix probe for the stateful streaming gates: times the SAME
  * st06 (watermarked stream-stream join) and st04 (custom-state
  * sessionization) queries under different state-store configurations to
  * separate what of their cost is fixed per-micro-batch state machinery
  * (config: provider choice, state partition count) from what is plan.
  *
  * Streaming state partition count is pinned at query start by
  * `spark.sql.shuffle.partitions`, so each matrix row gets a FRESH
  * SparkSession (stop + rebuild, not `newSession` — the provider class is
  * also session-scoped). Every row runs the identical drain (AvailableNow
  * into a memory sink) twice and reports the steady (2nd) time; the
  * result row count is printed so a config that silently changes results
  * would be caught (the oracle itself stays untouched — this probe never
  * replaces the correctness gate).
  *
  * Output: one JSON line per row,
  * `{"probe":"stream_config","query":...,"provider":...,"partitions":N,
  *   "single":s,"steady":s,"rows":n}`.
  */
object StreamConfigProbe {
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Default: the two custom-state gates; override with explicit query
    // names as args (e.g. st07_stream_hll st08_stream_cms for the bounded
    // sketch-state cells).
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("st06_stream_join", "st04_stream_sessionize")
    val matrix: Seq[(String, Option[String], Int)] = Seq(
      ("hdfs", None, cpus.toInt),
      ("hdfs", None, 8),
      ("hdfs", None, 2),
      ("rocksdb", Some(RocksDb), cpus.toInt),
      ("rocksdb", Some(RocksDb), 8))
    matrix.foreach { case (label, provider, parts) =>
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.warehouse.dir",
          s"${sys.props("java.io.tmpdir")}/graft-probe-warehouse-${ProcessHandle.current().pid()}")
        .config("spark.ui.enabled", "false")
      provider.foreach(p => b.config("spark.sql.streaming.stateStore.providerClass", p))
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        queries.foreach { q =>
          val fn = graft.SparkEntry.queries(q)
          var rows = 0L
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            rows = fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(s"""{"probe":"stream_config","query":"$q","provider":"$label",""" +
            s""""partitions":$parts,"single":${times.head},"steady":${times.last},"rows":$rows}""")
        }
      } finally spark.stop()
    }
  }
}
