package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each probe row, the build row with the greatest time
  * at-or-before the probe's time within the same key group — the "last
  * known value" join of time-series engines (DuckDB/QuestDB `ASOF JOIN`,
  * pandas `merge_asof`). Spark has no native operator for it; the naive
  * formulations both fail at scale:
  *
  *   - equi-join on key + `b.t <= p.t` filter + per-probe argmax replicates
  *     every probe row by its FULL candidate count (a user with m build
  *     rows costs m rows per probe — O(n*m) shuffle);
  *   - a windowed subquery per probe re-sorts the build side per probe.
  *
  * This implementation is the single-pass merge formulation: union-tag the
  * two sides on (key, t, side), hash-shuffle ONCE on the key, sort each
  * partition by (t, side), and carry the last non-null build payload
  * forward with a running `last(..., ignoreNulls)` window over
  * `rowsBetween(unboundedPreceding, currentRow)`. That is exactly the
  * sort-merge-join cost shape — one exchange + one in-partition sort,
  * O((n+m) log(n+m)) per partition, zero row replication — and it holds at
  * 100 TB because partitions depend only on key cardinality/skew, never on
  * per-key match counts. Build rows sort BEFORE probe rows at equal t
  * (side 0 < 1), giving `b.t <= p.t` inclusive semantics, matching
  * DuckDB's `ASOF JOIN ... ON p.t >= b.t` (the oracle for the q20 gate).
  *
  * Contract: the build side must be unique per (key, t) — with duplicates
  * an as-of match is ill-defined in ANY engine (DuckDB picks an arbitrary
  * winner); callers dedupe first (the q20 gate uses `max_by` per
  * (user, ts)). Probe-side duplicates at equal t are fine: preceding probe
  * rows carry null payloads, which `ignoreNulls` skips, so probe-probe
  * sort ties cannot affect results.
  *
  * NULL semantics match the SQL engines' (ASOF JOIN is an equi-join plus
  * an inequality, and NULL fails both): build rows with a NULL key or NULL
  * time are dropped before the union — ascending sort is nulls-FIRST, so
  * an unfiltered null-t build row would sort before every probe and leak
  * its payload into probes with no true predecessor. Probe rows always
  * pass through; a NULL-key or NULL-t probe gets NULL payload (no build
  * row survives in the null-key partition, and a null-t probe sorts before
  * every surviving build row).
  */
object AsOfJoin {

  /** For each row of `probe`, attach `buildCols` from the `build` row with
    * the greatest `timeCol` <= the probe's `timeCol` and equal `keyCol`,
    * plus that row's time as `asof_t` (NULLs when no build row precedes).
    * Output: `probeCols` ++ `buildCols` ++ `asof_t`.
    */
  def lastAtOrBefore(
      probe: DataFrame, build: DataFrame,
      keyCol: String, timeCol: String,
      probeCols: Seq[String], buildCols: Seq[String]): DataFrame = {
    val outNames = probeCols ++ buildCols :+ "asof_t"
    require(outNames.distinct == outNames,
      s"as-of output columns must be disjoint (probeCols ++ buildCols ++ asof_t), got $outNames")
    val buildKept = build.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
    val payload = struct(
      (buildCols.map(c => col(c).as(c)) :+ col(timeCol).as("asof_t")): _*)
    val b = buildKept.select(
      col(keyCol).as("k"), col(timeCol).as("t"), lit(0).as("side"),
      payload.as("bpay"), lit(null).cast("bigint").as("probe_tag"))
    // Probe columns ride in a struct so the union schema is fixed
    // regardless of how many columns each caller carries.
    val p = probe.select(
      col(keyCol).as("k"), col(timeCol).as("t"), lit(1).as("side"),
      lit(null).cast(b.schema("bpay").dataType).as("bpay"),
      lit(1L).as("probe_tag"),
      struct(probeCols.map(col): _*).as("ppay"))
    val bWithP = b.withColumn("ppay", lit(null).cast(p.schema("ppay").dataType))

    val w = Window.partitionBy("k").orderBy("t", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bWithP.unionByName(p)
      .withColumn("carry", last(col("bpay"), ignoreNulls = true).over(w))
      .filter(col("probe_tag").isNotNull)
      .select(
        probeCols.map(c => col(s"ppay.$c").as(c)) ++
          buildCols.map(c => col(s"carry.$c").as(c)) :+
          col("carry.asof_t").as("asof_t"): _*)
  }
}
