package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** EXACT weighted percentiles at scale — "the value below which p% of the
  * token mass sits" (weights = token counts, value = quality score cents;
  * the data-mixing question behind quality-threshold selection). Spark's
  * built-ins offer `percentile_approx` (not exact, unweighted) or a
  * global sort (one task at the q28 cliff); this is the exact form with
  * NO global sort, the repo's two-level range-chunk discipline
  * ([[ChunkedWindow]] / p08) applied to the cumulative-weight axis:
  *
  *  1. ONE map-side-combining `groupBy(value)` — the reduce side is
  *     DISTINCT-VALUE-sized, not corpus-sized — scope-cached
  *     ([[CacheScope]]) so the carry, the grand total, and the crossing
  *     all ride it: the corpus is scanned exactly once;
  *  2. chunk the VALUE axis at `chunkWidth` (exact integer `div` on the
  *     lattice, the ChunkedWindow arithmetic); per-chunk weight totals
  *     feed an exclusive running carry over the chunk axis — a
  *     single-task window whose row count is bounded by
  *     `value_domain / chunkWidth` (DATA-INDEPENDENT: the domain of the
  *     value lattice, not the corpus, caps it);
  *  3. within-chunk running sums run partitioned by chunk — parallel —
  *     and `cum = carry + within` reproduces the global prefix sum
  *     exactly (integer arithmetic end to end);
  *  4. each requested percentile `pct` selects the FIRST value whose
  *     cumulative weight reaches `T = ceil(pct·W/100)` via the crossing
  *     predicate `cum >= T AND cum - wsum < T` against a broadcast
  *     (pct, T) table — no per-percentile pass, no min-agg, at most one
  *     row per pct by construction.
  *
  * The oracle replays the ONE global cumulative window in DuckDB — the
  * chunked plan must match it bit-for-bit, and a spec pins
  * chunkWidth-invariance (the q28 discipline).
  *
  * Output `[pct, value, cum_w, total_w]`, one row per requested
  * percentile (zero rows on empty input).
  */
object WeightedQuantiles {

  def weightedPercentiles(df: DataFrame, valueCol: String,
      weightCol: String, pcts: Seq[Int],
      chunkWidth: Long = 1L << 16): DataFrame =
    weightedPercentilesBy(
      df.withColumn("__wq_g", lit(0L)), "__wq_g", valueCol, weightCol,
      pcts, chunkWidth).drop("__wq_g")

  /** Grouped form (q34): exact weighted percentiles PER GROUP — the
    * per-language quality-threshold query — with the same two-level
    * chunk plan, except the carry window now PARTITIONS BY THE GROUP,
    * so even the bounded chunk-axis pass parallelizes across groups:
    * no single-task stage remains anywhere in the plan. The ungrouped
    * [[weightedPercentiles]] is this with one constant group (shared
    * body — the t18/st15 discipline). Each group crosses its own
    * `T = ceil(pct · W_g / 100)` targets; groups join null-safely, and
    * a group with no rows emits nothing.
    *
    * Output `[<groupCol>, pct, value, cum_w, total_w]`.
    */
  def weightedPercentilesBy(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, pcts: Seq[Int],
      chunkWidth: Long = 1L << 16): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be non-empty in [1, 100], got $pcts")
    require(chunkWidth >= 1, s"chunkWidth must be >= 1, got $chunkWidth")
    val spark = df.sparkSession
    import spark.implicits._
    CacheScope.scoped { scope =>
      val base = df.select(col(groupCol).as("__wq_g"),
          col(valueCol).cast(LongType).as("__wq_v"),
          col(weightCol).cast(LongType).as("__wq_w"))
        .withColumn("__wq_w",
          when(col("__wq_w") >= 1L, col("__wq_w"))
            .otherwise(raise_error(lit(
              "weightedPercentiles: weights must be >= 1"))))
        // A NULL value would form a nulls-FIRST chunk that feeds every
        // carry and the total but can never satisfy the crossing
        // predicate — percentile rows would silently vanish. Same loud
        // discipline as the weight guard: NULLs are the caller's
        // filter/impute decision, not this operator's.
        .withColumn("__wq_v",
          when(col("__wq_v").isNotNull, col("__wq_v"))
            .otherwise(raise_error(lit(
              "weightedPercentiles: NULL values — filter or impute " +
                "upstream"))))
      // The ONLY corpus scan: everything downstream (carry, totals,
      // crossing) rides this cached distinct-(group, value)-sized frame.
      val grouped = scope.cache(base.groupBy("__wq_g", "__wq_v")
        .agg(sum("__wq_w").as("__wq_ws"))
        // Exact chunk id on the long domain incl. negatives — the
        // ChunkedWindow `div`-of-an-exact-multiple form, NOT a double `/`.
        .withColumn("__wq_s", call_function("div",
          col("__wq_v") - pmod(col("__wq_v"), lit(chunkWidth)),
          lit(chunkWidth))))
      val carryW = Window.partitionBy("__wq_g").orderBy("__wq_s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carries = grouped.groupBy("__wq_g", "__wq_s")
        .agg(sum("__wq_ws").as("__wq_st"))
        .withColumn("__wq_carry",
          coalesce(sum("__wq_st").over(carryW), lit(0L)))
        // Renamed for the NULL-SAFE join below: a USING equi-join would
        // silently drop a NULL group's rows here (NULL != NULL), the
        // same class of bug the targets join already guards against.
        .select(col("__wq_g").as("__wq_cg"), col("__wq_s").as("__wq_cs"),
          col("__wq_carry"))
      val innerW = Window.partitionBy("__wq_g", "__wq_s").orderBy("__wq_v")
      val cum = grouped.join(carries,
          col("__wq_g") <=> col("__wq_cg") && col("__wq_s") === col("__wq_cs"))
        .withColumn("__wq_cum",
          col("__wq_carry") + sum("__wq_ws").over(innerW))
      val targets = grouped.groupBy("__wq_g")
        .agg(sum("__wq_ws").as("total_w"))
        .crossJoin(broadcast(pcts.distinct.sorted.toDF("pct")))
        .withColumn("__wq_t", expr("(pct * total_w + 99) div 100"))
        .select(col("__wq_g").as("__wq_tg"), col("pct"), col("total_w"),
          col("__wq_t"))
      cum.join(targets,
          col("__wq_g") <=> col("__wq_tg") &&
            col("__wq_cum") >= col("__wq_t") &&
            col("__wq_cum") - col("__wq_ws") < col("__wq_t"))
        .select(col("__wq_g").as(groupCol), col("pct"),
          col("__wq_v").as("value"),
          col("__wq_cum").as("cum_w"), col("total_w"))
    }
  }
}
