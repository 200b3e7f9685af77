package graft

import org.apache.spark.sql.SparkSession

/** Engine-tuning defaults every graft session builder applies — ONE
  * definition so the four entry points (Bench, Verify, ScaleBench, the
  * test harness) can never drift onto different engine configs than the
  * ones the SCALE_RECORD measurements and PlanSpec pins were taken under.
  *
  *  - `codegen.hugeMethodLimit=8000`: stages whose largest generated
  *    method would exceed HotSpot's ~8K-bytecode JIT cap run in the RAW
  *    bytecode interpreter if compiled — fall back per-stage instead
  *    (the wide-encode cliff, SCALE_RECORD.md r15; 6x on the 4.2 M-row
  *    IVF-PQ encode, noise-level elsewhere).
  *  - `objectHashAggregate.sortBased.fallbackThreshold=65536`: our
  *    TypedImperative aggregates keep BOUNDED-SMALL per-group state
  *    (top-k heaps, label/h-index histograms); big-state aggregates
  *    (gram matrix, vector sums, grouped sketches) run at low group
  *    cardinality. The 128-key default forces per-vertex and per-query
  *    aggregation into sort-based fallback, whose spill machinery is
  *    what actually OOMed the 16k-query ADC probe — hash aggregation is
  *    both faster and safer for this state shape (SCALE_RECORD.md r15).
  */
object SparkDefaults {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.codegen.hugeMethodLimit", "8000")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "65536")
}
