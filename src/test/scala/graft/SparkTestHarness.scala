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
      // Our TypedImperative aggregates keep BOUNDED-SMALL per-group state
      // (top-k heaps, label/h-index histograms); big-state aggregates
      // (gram matrix, vector sums, grouped sketches) run at low group
      // cardinality. The 128-key default forces per-vertex and per-query
      // aggregation into sort-based fallback, whose spill machinery is
      // what actually OOMed the 16k-query ADC probe — hash aggregation
      // is both faster and safer for this state shape (SCALE_RECORD.md r15).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
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
