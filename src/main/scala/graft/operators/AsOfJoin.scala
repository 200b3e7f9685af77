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

  /** [[lastAtOrBefore]] mirrored FORWARD, with an optional match window:
    * for each probe row, attach `buildCols` from the build row with the
    * SMALLEST `timeCol` at-or-after the probe's and equal `keyCol` —
    * "the next purchase after this click" — and, when `tolerance` is
    * set, only if that row lies within `tolerance` time units (pandas
    * `merge_asof(direction='forward', tolerance=...)`; the attribution
    * window every click→conversion pipeline needs).
    *
    * Same single-pass merge shape and cost model as the backward form
    * (one hash exchange on the key, one in-partition sort, zero row
    * replication): ascending `(t, side)` sort with PROBE rows first at
    * equal t (side 0 < 1 keeps `b.t >= p.t` INCLUSIVE — the mirror of
    * backward's build-first tie order), payload carried BACKWARD by
    * `first(..., ignoreNulls)` over
    * `rowsBetween(currentRow, unboundedFollowing)`. The tolerance is a
    * post-carry null-out (`asof_t - t > tolerance` discards the whole
    * match struct): the carry itself stays tolerance-free, so the
    * window never needs a RANGE frame and a beyond-window probe gets
    * NULLs rather than a farther match — exactly the "no match within
    * window" semantics, replayed by the q32 oracle's bounded candidate
    * enumeration.
    *
    * Build uniqueness per (key, t) and NULL semantics: the
    * [[lastAtOrBefore]] contract verbatim (NULL-t build rows are
    * dropped; here ascending nulls-first puts them before every probe,
    * where the FORWARD carry would otherwise never see them — dropped
    * all the same for symmetry and because a NULL time is not a time).
    */
  def firstAtOrAfter(
      probe: DataFrame, build: DataFrame,
      keyCol: String, timeCol: String,
      probeCols: Seq[String], buildCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val outNames = probeCols ++ buildCols :+ "asof_t"
    require(outNames.distinct == outNames,
      s"as-of output columns must be disjoint (probeCols ++ buildCols ++ asof_t), got $outNames")
    require(tolerance.forall(_ >= 0L),
      s"tolerance must be >= 0, got $tolerance")
    // The tolerance null-out computes `asof_t - t <= tolerance` with a
    // Long literal, which only type-checks for numeric time columns —
    // a TimestampType probe would otherwise die in analysis with an
    // opaque interval/bigint mismatch. The tolerance-free forms support
    // timestamps; the windowed form's contract is epoch integers.
    if (tolerance.isDefined) Seq(probe, build).foreach { side =>
      val dt = side.schema(timeCol).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"firstAtOrAfter with tolerance needs a NUMERIC time column " +
          s"(epoch integers); '$timeCol' is $dt — cast it (e.g. " +
          "unix_micros) or drop the tolerance")
    }
    val buildKept = build.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
    val payload = struct(
      (buildCols.map(c => col(c).as(c)) :+ col(timeCol).as("asof_t")): _*)
    // Probe side 0, build side 1: at equal t the probe sorts FIRST, so
    // the [current, following) frame includes the equal-t build row.
    val b = buildKept.select(
      col(keyCol).as("k"), col(timeCol).as("t"), lit(1).as("side"),
      payload.as("bpay"), lit(null).cast("bigint").as("probe_tag"))
    val p = probe.select(
      col(keyCol).as("k"), col(timeCol).as("t"), lit(0).as("side"),
      lit(null).cast(b.schema("bpay").dataType).as("bpay"),
      lit(1L).as("probe_tag"),
      struct(probeCols.map(col): _*).as("ppay"))
    val bWithP = b.withColumn("ppay", lit(null).cast(p.schema("ppay").dataType))

    val w = Window.partitionBy("k").orderBy("t", "side")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = bWithP.unionByName(p)
      .withColumn("carry", first(col("bpay"), ignoreNulls = true).over(w))
      .filter(col("probe_tag").isNotNull)
      // NULL-t probes sort FIRST ascending, where the FORWARD carry
      // would hand them every build row — mask explicitly: a NULL time
      // matches nothing (the SQL-engine contract the backward form gets
      // for free from its sort direction; spec-pinned).
      .withColumn("carry", when(col("t").isNotNull, col("carry")))
    val inWindow = tolerance match {
      case Some(tol) =>
        carried.withColumn("carry",
          when(col("carry.asof_t") - col("t") <= tol, col("carry")))
      case None => carried
    }
    inWindow.select(
      probeCols.map(c => col(s"ppay.$c").as(c)) ++
        buildCols.map(c => col(s"carry.$c").as(c)) :+
        col("carry.asof_t").as("asof_t"): _*)
  }

  /** The NEAREST direction (q36 — pandas
    * `merge_asof(direction='nearest', tolerance=...)`): for each probe
    * row, the build row minimizing |build.t − probe.t| within the key
    * group (and within `tolerance` when set), ties to the EARLIER
    * (backward) match — "the closest reading to this event", the
    * feature-engineering join sensor/price alignment runs.
    *
    * Same single-pass merge cost shape as the two directed forms — one
    * hash exchange on the key, one in-partition sort, zero row
    * replication — because nearest is just BOTH carries over the SAME
    * sorted frame: the backward `last(ignoreNulls)` over
    * [unboundedPreceding, currentRow] and the forward
    * `first(ignoreNulls)` over [currentRow, unboundedFollowing], then a
    * per-row distance pick. One sort order serves both: build rows sort
    * BEFORE probes at equal t, so an exact-t match lands in the
    * BACKWARD carry at distance 0 and wins every comparison — the
    * forward frame legitimately never sees it.
    *
    * The distance compare is integer arithmetic, so `timeCol` must be
    * NUMERIC on both sides (epoch integers — the tolerance contract of
    * [[firstAtOrAfter]], here unconditional); enforced loudly. Build
    * uniqueness per (key, t) and NULL semantics follow
    * [[lastAtOrBefore]]'s contract verbatim (a NULL-t probe matches
    * nothing in either direction — masked explicitly on the forward
    * carry, vacuous on the backward one since nulls sort first).
    */
  def nearestInTime(
      probe: DataFrame, build: DataFrame,
      keyCol: String, timeCol: String,
      probeCols: Seq[String], buildCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val outNames = probeCols ++ buildCols :+ "asof_t"
    require(outNames.distinct == outNames,
      s"as-of output columns must be disjoint (probeCols ++ buildCols ++ asof_t), got $outNames")
    require(tolerance.forall(_ >= 0L),
      s"tolerance must be >= 0, got $tolerance")
    Seq(probe, build).foreach { side =>
      val dt = side.schema(timeCol).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"nearestInTime needs a NUMERIC time column (epoch integers) " +
          s"for the distance compare; '$timeCol' is $dt")
    }
    val buildKept = build.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
    val payload = struct(
      (buildCols.map(c => col(c).as(c)) :+ col(timeCol).as("asof_t")): _*)
    val b = buildKept.select(
      col(keyCol).as("k"), col(timeCol).as("t"), lit(0).as("side"),
      payload.as("bpay"), lit(null).cast("bigint").as("probe_tag"))
    val p = probe.select(
      col(keyCol).as("k"), col(timeCol).as("t"), lit(1).as("side"),
      lit(null).cast(b.schema("bpay").dataType).as("bpay"),
      lit(1L).as("probe_tag"),
      struct(probeCols.map(col): _*).as("ppay"))
    val bWithP = b.withColumn("ppay", lit(null).cast(p.schema("ppay").dataType))

    val wb = Window.partitionBy("k").orderBy("t", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("k").orderBy("t", "side")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = bWithP.unionByName(p)
      .withColumn("back", last(col("bpay"), ignoreNulls = true).over(wb))
      .withColumn("fwd", first(col("bpay"), ignoreNulls = true).over(wf))
      .filter(col("probe_tag").isNotNull)
      .withColumn("fwd", when(col("t").isNotNull, col("fwd")))
    val distB = col("t") - col("back.asof_t")
    val distF = col("fwd.asof_t") - col("t")
    val masked = tolerance match {
      case Some(tol) =>
        carried.withColumn("back", when(distB <= tol, col("back")))
          .withColumn("fwd", when(distF <= tol, col("fwd")))
      case None => carried
    }
    // Tie (equal distance) goes BACKWARD — the forward carry wins only
    // strictly; both-null falls through to a null pick.
    val pick = when(col("back").isNull, col("fwd"))
      .when(col("fwd").isNull, col("back"))
      .when(distF < distB, col("fwd"))
      .otherwise(col("back"))
    masked.withColumn("pick", pick)
      .select(
        probeCols.map(c => col(s"ppay.$c").as(c)) ++
          buildCols.map(c => col(s"pick.$c").as(c)) :+
          col("pick.asof_t").as("asof_t"): _*)
  }
}
