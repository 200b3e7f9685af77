package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan-audit handle: print the executed plan of named SparkEntry queries
  * (default sf0.001) so operator plan shapes can be inspected without
  * writing a throwaway main. Usage:
  * `runMain graft.tools.ExplainProbe q03_join_inner_agg [more names...]`
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // Same engine defaults + partition parameterization as Bench/Verify,
    // so dumped plans show the shapes the bench actually runs (a probe
    // session without SparkDefaults showed pre-optimization join
    // strategies and mis-stated the plan record).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.SparkDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Dev A/B knob: SPARK_GRAFT_EXPLAIN_CONF="k=v;k2=v2" overrides
    // runtime-settable confs AFTER SparkDefaults, so a dump pair can
    // show a plan with and without one engine default (e.g. the 64 MB
    // broadcast ceiling vs Spark's 10 MB stock value).
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach {
      _.split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_groupby_agg")
    names.foreach { n =>
      // Operators that eagerly materialize inside CacheScope.scoped
      // (link prediction, the dedup pair builders) hide their real plan
      // behind the checkpoint — explaining the returned frame shows one
      // `Scan ExistingRDD` (the r19 g28 dump gap). The hook prints the
      // PRE-materialization plan, which is the plan the gate actually
      // executes when it runs.
      graft.operators.CacheScope.preMaterializeHook = Some { inner =>
        println(s"===== $n (formatted, scoped body pre-materialization) =====")
        println(inner.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        println(s"===== $n (formatted) =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } finally graft.operators.CacheScope.preMaterializeHook = None
    }
    spark.stop()
  }
}
