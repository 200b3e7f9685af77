package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite in the forked test JVM. */
object SparkTestHarness {
  lazy val spark: SparkSession = {
    // Engine-tuning defaults shared with Bench/Verify/ScaleBench live in
    // graft.SparkDefaults — one definition, no drift.
    val s = SparkDefaults(SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the per-round lazy-checkpoint discipline emits one
    // "RDD was locally checkpointed ... cannot be recomputed" WARN per
    // released block, which flooded the driver's captured test tail with
    // megabytes of log I/O (r19 verdict: the recorded `sbt test` was cut
    // off mid-run). The suites assert on results, never on log text.
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkTestHarness {
  lazy val spark: SparkSession = SparkTestHarness.spark
}
