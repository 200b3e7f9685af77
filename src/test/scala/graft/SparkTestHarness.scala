package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite in the forked test JVM. */
object SparkTestHarness {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      // Stages whose largest generated method would exceed HotSpot's
      // ~8K-bytecode JIT cap run in the RAW bytecode interpreter if
      // compiled — fall back per-stage instead (the wide-encode cliff,
      // SCALE_RECORD.md r15). Mirrors the Bench/Verify/ScaleBench config.
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestHarness {
  lazy val spark: SparkSession = SparkTestHarness.spark
}
