package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable distinct-count sketching (HyperLogLog) for 100 TB-scale
  * profiling, built the graft way: every intermediate is exact integer
  * arithmetic any md5-capable SQL engine replays bit-for-bit.
  *
  * Design notes vs a stock HLL implementation:
  *   - The hash is the library's portable 60-bit md5 convention
  *     ([[Sampling.keyHash60]]), NOT xxhash/murmur: the register table is
  *     then a pure SQL function of the input, so the ORACLE can gate the
  *     whole sketch, not just its estimate.
  *   - `bin()` (present in both Spark and DuckDB, returns the binary
  *     string WITHOUT leading zeros) gives the rank = number of leading
  *     zeros in the (60-p)-bit suffix + 1, with no float log2 at the edge.
  *   - The harmonic sum `sum(2^-M_j)` is kept EXACT by scaling to
  *     integers: `sum_scaled = sum(2^(maxRank - M_j))` as BIGINT (worst
  *     case 2^p * 2^(60-p+1) = 2^61, inside i64), because a double sum of
  *     2^0 .. 2^-53 terms spans >53 bits of precision and its rounding
  *     would be summation-order-dependent — the one thing an oracle-gated
  *     artifact cannot be. The single float division happens once, at the
  *     end, in a fixed association order.
  *
  * The registers shuffle is one map-side-combinable groupBy over 2^p keys
  * — at any scale the reduce side is 2^p rows. That is the whole point of
  * the sketch: a 100 TB scan folds to a 256-row table that unions across
  * partitions/days by pairwise `greatest`.
  */
object Sketches {

  /** Bits in the portable md5 hash (15 hex chars). */
  val HashBits = 60

  /** `[register, max_rank]` — one row per register in `[0, 2^p)`, BIGINTs.
    * Registers no key hashed into carry `max_rank = 0` (the standard HLL
    * empty-register convention), materialized by a left join against
    * `range(2^p)` so the output shape is fixed regardless of data.
    */
  /** The stateless `[register, rank]` projection under [[hllRegisters]] —
    * shared with the STREAMING register builder
    * ([[graft.streaming.Streams.streamingHllRegisters]]), where it feeds
    * the same `groupBy(register).max(rank)` as continuously-maintained
    * state. Package-private: callers want the aggregated forms.
    */
  /** THE observation builder — every HLL variant in this file (global,
    * grouped, rollup) and the per-vertex [[graft.algorithms.HyperBall]]
    * sketches derive their (register, rank) pairs from this ONE body;
    * `carry` columns ride alongside (a key, group columns). Low p bits
    * pick the register, the remaining 60-p bits feed the rank — BIT
    * ops, not arithmetic: Column./ on longs is double division, which
    * silently rounds above 2^53. h is non-negative by construction, so
    * `&`/`>>` agree across engines.
    */
  private def hllObs(df: DataFrame, keyCol: String, p: Int,
      carry: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(p >= 4 && p <= 16, s"hll precision p must be in [4,16], got $p")
    val m = 1L << p
    val suffixBits = HashBits - p
    val h = Sampling.keyHash60(col(keyCol))
    val reg = h.bitwiseAND(lit(m - 1))
    val w = shiftrightunsigned(h, p)
    val rank = (lit(suffixBits + 1) -
      when(w === 0L, lit(0)).otherwise(length(bin(w)))).cast(LongType)
    df.select(carry :+ reg.as("register") :+ rank.as("rank"): _*)
  }

  private[graft] def hllObservations(df: DataFrame, keyCol: String, p: Int): DataFrame =
    hllObs(df, keyCol, p, Nil)

  /** [[hllObservations]] with the hashed key kept alongside — the
    * per-VERTEX sketch shape [[graft.algorithms.HyperBall]] propagates.
    */
  private[graft] def hllObservationsKeyed(df: DataFrame, keyCol: String,
      p: Int): DataFrame =
    hllObs(df, keyCol, p, Seq(col(keyCol)))

  def hllRegisters(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    val m = 1L << p
    val seen = hllObservations(df, keyCol, p)
      .groupBy("register").agg(max(col("rank")).as("max_rank"))
    df.sparkSession.range(m).select(col("id").as("register"))
      .join(seen, Seq("register"), "left")
      .select(col("register"),
        coalesce(col("max_rank"), lit(0L)).as("max_rank"))
  }

  /** One-row estimate frame off a register table:
    * `[m, sum_scaled, n_zero, est6]` where `sum_scaled = sum(2^(S - M_j))`
    * with `S = 60 - p + 1` (exact BIGINT), `n_zero` counts empty registers
    * (the signal for small-range linear-counting correction, which THIS
    * method leaves unapplied — raw-HLL semantics; see
    * [[hllEstimateCorrected]] for the corrected variant), and
    * `est6 = round(alpha_m * m * m * 2^S / sum_scaled, 6)`.
    *
    * Behavior change (round 7): for `p < 7` (m = 16/32/64) the bias
    * constant is now the HLL paper's canonical per-size alpha
    * (0.673/0.697/0.709) instead of the asymptotic `0.7213/(1+1.079/m)`
    * form, which is only valid for m >= 128. Callers pinned to old small-p
    * `est6` values will see different output; `p >= 7` is unchanged.
    */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val s = HashBits - p + 1 // max_rank range is [0, 60-p+1]
    // Computed in Scala doubles (NOT an expr string: both Spark and DuckDB
    // parse bare decimal literals as DECIMAL, whose division rules diverge
    // from IEEE double — the oracle spells every literal ::DOUBLE and this
    // Scala expression performs the identical double ops in the same order).
    // Flajolet's bias constant: the 0.7213/(1 + 1.079/m) asymptotic form is
    // only valid for m >= 128; m = 16/32/64 take the canonical per-size
    // constants from the HLL paper (mirrored verbatim in any small-p oracle).
    val alpha = hllAlpha(m)
    registers.agg(
      count(lit(1)).as("m"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($s - max_rank AS INT))"))
        .as("sum_scaled"),
      sum(when(col("max_rank") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col("m"), col("sum_scaled"), col("n_zero"),
        round(lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
          lit(math.pow(2.0, s)) / col("sum_scaled").cast("double"), 6).as("est6"))
  }

  /** [[hllEstimate]] plus the standard small-range linear-counting
    * correction: when the raw estimate is below `2.5 * m` AND empty
    * registers remain, the balls-in-bins estimator `m * ln(m / n_zero)` is
    * strictly more accurate than raw HLL (whose relative error blows up
    * below ~2.5m distinct — the first thing a profiling user hits on a
    * small partition). Output adds one column:
    * `est6c = round(if (n_zero > 0 && est6 <= 2.5m) m * ln(m / n_zero)
    *                else est6, 6)`.
    * The branch condition reads the already-rounded `est6` so the oracle's
    * CASE sees bit-identical operands; `ln` is IEEE-identical across
    * engines (one float expression, fixed association order).
    */
  /** Flajolet's bias constant: asymptotic form for m >= 128, the paper's
    * canonical per-size constants below (see [[hllEstimate]] round-7 note).
    */
  private[graft] def hllAlpha(m: Long): Double = m match {
    case 16L => 0.673
    case 32L => 0.697
    case 64L => 0.709
    case _   => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** Per-GROUP HLL register tables — approximate distinct-per-key, the
    * profiling query every corpus slice view needs ("distinct users per
    * event type", "distinct 5-grams per source") at `groups * 2^p` rows
    * instead of a `distinct` shuffle of the raw pairs. Output
    * `[<groupCol>, register, max_rank]` with empty registers materialized
    * per group; the group list comes from the AGGREGATED observations (no
    * second corpus scan), and two grouped tables merge by per-(group,
    * register) `greatest` exactly like the global sketch.
    */
  def hllGroupedRegisters(df: DataFrame, groupCol: String, keyCol: String,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"hll precision p must be in [4,16], got $p")
    val m = 1L << p
    val suffixBits = HashBits - p
    val h = Sampling.keyHash60(col(keyCol))
    val reg = h.bitwiseAND(lit(m - 1))
    val w = shiftrightunsigned(h, p)
    val rank = (lit(suffixBits + 1) -
      when(w === 0L, lit(0)).otherwise(length(bin(w)))).cast(LongType)
    val seen = df.select(col(groupCol).as("__hll_grp"), reg.as("register"),
        rank.as("rank"))
      .groupBy("__hll_grp", "register").agg(max(col("rank")).as("max_rank"))
    // Dense zero-fill WITHOUT a join: pack each group's sparse registers
    // into a map, then generate the full 2^p grid per group with
    // sequence+transform. One corpus scan (the old grid join re-scanned
    // the corpus for its DISTINCT group list and outer-joined against it),
    // and NULL groups are correct by construction — groupBy keeps NULL as
    // a key, so no null-safe join machinery is needed. Registers never
    // observed read 0 via the map miss; a group whose every key hashed
    // NULL packs an empty map and emits an all-zero grid, matching the
    // old join's behavior.
    val packed = seen.groupBy("__hll_grp").agg(
      map_from_entries(collect_list(when(col("register").isNotNull,
        struct(col("register"), col("max_rank"))))).as("__mp"))
    packed.select(col("__hll_grp"),
        posexplode(transform(sequence(lit(0L), lit(m - 1)),
          r => coalesce(element_at(col("__mp"), r), lit(0L))))
          .as(Seq("__pos", "max_rank")))
      .select(col("__hll_grp").as(groupCol),
        col("__pos").cast(LongType).as("register"), col("max_rank"))
  }

  /** KMV (bottom-k) distinct sketch per slice (q35) — the theta-sketch
    * family member HLL cannot substitute for: SET-OPERATION cardinality
    * estimates (Beyer et al., "On synopses for distinct-value estimation
    * under multiset operations", SIGMOD 2007; the Apache DataSketches
    * theta design). The sketch is the k SMALLEST portable key hashes of
    * the slice's distinct keys — mergeable by "union then re-truncate",
    * and, unlike HLL registers, it retains enough identity to estimate
    * INTERSECTIONS and differences.
    *
    * SHAPE: one distinct projection (reduce side = distinct (slice, h)
    * pairs, map-side combinable) feeding the bounded-heap
    * `top_k_by_score` aggregate — k longs of reduce state per slice at
    * any corpus size, no window, no per-slice sort. Exactness of the
    * bottom-k under the double-cast score: int64→double is MONOTONE, so
    * order can only collapse near-equal hashes into score ties, and the
    * heap's id tie-break (id = the hash itself) resolves exactly those
    * ties in true integer order — selection == exact bottom-k,
    * spec-pinned against the ORDER BY replay.
    *
    * Output `[slice, h]`, at most k rows per slice.
    */
  def kmvSketchBy(df: DataFrame, sliceCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 4096, s"k must be in [2, 4096], got $k")
    df.select(col(sliceCol).as("slice"),
        Sampling.keyHash60(col(keyCol)).as("__kmv_h")).distinct()
      .select(col("slice"), col("__kmv_h"),
        negate(col("__kmv_h").cast("double")).as("__kmv_s"))
      .groupBy("slice")
      .agg(graft.functions.TopKByScore
        .top_k_by_score(col("__kmv_s"), col("__kmv_h"), k).as("__tk"))
      .select(col("slice"), explode(col("__tk.id")).as("h"))
  }

  /** Set-operation estimates from two [[kmvSketchBy]] slices: union the
    * sketches, re-truncate to k (the KMV merge), read
    * `theta = k-th smallest`, and estimate
    *
    *   |A ∪ B| ≈ (k-1) · 2^60 / theta
    *   |A ∩ B| ≈ n_both · |A ∪ B| / k
    *
    * where `n_both` counts surviving union values present in BOTH input
    * sketches. When the merged sketch holds fewer than k values the
    * union was EXHAUSTIVELY hashed and both estimates are exact counts
    * (the small-set branch, mirrored by the oracle CASE). Estimator
    * floats follow the p11 discipline: exact int64→double conversions,
    * one constant product that is exactly representable, one IEEE
    * division each — bit-identical replay, rounded to 6 at the end.
    * Everything here is sketch-sized (≤ 2k rows); the corpus was
    * touched only by [[kmvSketchBy]].
    *
    * Output one row `[k_used, theta, n_union, n_both, est_union6,
    * est_inter6]`.
    */
  def kmvSetEstimates(sketches: DataFrame, sliceA: String, sliceB: String,
      k: Int): DataFrame = CacheScope.scoped { scope =>
    // The input sketch frame's lineage is usually the corpus-scale
    // [[kmvSketchBy]] aggregate, and it feeds a/b/u twice each below —
    // scope-cached so the corpus pass runs once, not ~6x (the Dedup
    // discipline; identical subplans DO re-execute across branches).
    // Fresh column aliases per branch: a, b, and u all descend from ONE
    // input lineage (a drained memory sink in the st25 path), and
    // same-exprId self-joins fail resolution — the aliases mint new
    // attributes so the semi-joins below always resolve.
    val a = scope.cache(
      sketches.filter(col("slice") === sliceA).select(col("h").as("ha")))
    val b = scope.cache(
      sketches.filter(col("slice") === sliceB).select(col("h").as("hb")))
    val u = scope.cache(
      a.select(col("ha").as("h")).unionByName(b.select(col("hb").as("h")))
        .distinct().orderBy("h").limit(k))
    val th = u.agg(max(col("h")).as("theta"),
      count(lit(1)).as("n_union"))
    val nb = u.join(a, col("h") === col("ha"), "left_semi")
      .join(b, col("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val estU = lit((k - 1).toDouble * (1L << 60).toDouble) /
      col("theta").cast("double")
    th.crossJoin(nb).select(
      lit(k).as("k_used"), col("theta"), col("n_union"), col("n_both"),
      when(col("n_union") < k, col("n_union").cast("double"))
        .otherwise(round(estU, 6)).as("est_union6"),
      when(col("n_union") < k, col("n_both").cast("double"))
        .otherwise(round(col("n_both").cast("double") * estU /
          lit(k.toDouble), 6)).as("est_inter6"))
  }

  /** ROLLUP-sliced HLL registers (q33): one register table for EVERY
    * slice of the `(g1, g2)` rollup lattice — `(g1, g2)`, `(g1)`, and
    * the grand total — in ONE Expand pass: observations project once,
    * the grouping-sets Expand replicates each into its three lattice
    * slices, and the per-(slice, register) max runs map-side-combined.
    * This is the OLAP subtotal frame for approximate COUNT DISTINCT —
    * exact distinct per slice would shuffle the raw key pairs once per
    * lattice level, while this reduce side is `slices × 2^p` rows at
    * any corpus size. `gid` is the `(g1, g2)` GROUPING bitmask (0 =
    * leaf, 1 = g2 rolled up, 3 = grand total) — the q30 discipline that
    * disambiguates NULL-as-subtotal from NULL data. Dense per-slice
    * grids via the map-pack zero-fill (no second corpus scan).
    *
    * Output `[<g1>, <g2>, gid, register, max_rank]`.
    */
  def hllRollupRegisters(df: DataFrame, g1: String, g2: String,
      keyCol: String, p: Int): DataFrame =
    hllRollupDensify(hllRollupSeen(df, g1, g2, keyCol, p), g1, g2, p)

  /** The SPARSE rollup register state — the groupingSets max stage of
    * [[hllRollupRegisters]] before dense zero-fill: one row per
    * (slice, register) actually hashed into, `gid` the (g1, g2)
    * GROUPING bitmask. Factored out because this is exactly the frame a
    * STREAMING query maintains as state
    * ([[graft.streaming.Streams.streamingHllRollupRegisters]]):
    * monotone register maxes under ONE Expand-fed aggregate, bounded by
    * slices × 2^p rows. Output `[<g1>, <g2>, gid, register, max_rank]`
    * (sparse).
    */
  def hllRollupSeen(df: DataFrame, g1: String, g2: String,
      keyCol: String, p: Int): DataFrame = {
    val obs = hllObs(df, keyCol, p,
      Seq(col(g1).as("__hr_g1"), col(g2).as("__hr_g2")))
    obs.groupingSets(
        Seq(Seq(col("__hr_g1"), col("__hr_g2"), col("register")),
          Seq(col("__hr_g1"), col("register")),
          Seq(col("register"))),
        col("__hr_g1"), col("__hr_g2"), col("register"))
      .agg(max(col("rank")).as("max_rank"),
        // grouping_id over (g1, g2, register): the register bit is
        // always 0 (grouped in every set) — shift it off so gid is the
        // (g1, g2) bitmask: 0 leaf, 1 g2-out, 3 grand total.
        shiftrightunsigned(grouping_id().cast(LongType), 1).as("__hr_gid"))
      .select(col("__hr_g1").as(g1), col("__hr_g2").as(g2),
        col("__hr_gid").as("gid"), col("register"), col("max_rank"))
  }

  /** Dense zero-fill of a sparse [[hllRollupSeen]] frame: every slice
    * gets its full 2^p register rows (absent = rank 0) via the map-pack
    * — no second corpus scan, slices × 2^p output rows.
    */
  def hllRollupDensify(seen: DataFrame, g1: String, g2: String,
      p: Int): DataFrame = {
    val m = 1L << p
    val packed = seen.groupBy(col(g1), col(g2), col("gid")).agg(
      map_from_entries(collect_list(when(col("register").isNotNull,
        struct(col("register"), col("max_rank"))))).as("__mp"))
    packed.select(col(g1), col(g2), col("gid"),
        posexplode(transform(sequence(lit(0L), lit(m - 1)),
          r => coalesce(element_at(col("__mp"), r), lit(0L))))
          .as(Seq("__pos", "max_rank")))
      .select(col(g1), col(g2), col("gid"),
        col("__pos").cast(LongType).as("register"), col("max_rank"))
  }

  /** Per-slice estimates off a [[hllRollupRegisters]] table — the
    * [[hllEstimate]] math per `(g1, g2, gid)` slice. Output
    * `[<g1>, <g2>, gid, m, sum_scaled, n_zero, est6]`.
    */
  def hllRollupEstimate(registers: DataFrame, g1: String, g2: String,
      p: Int): DataFrame = {
    val m = 1L << p
    val s = HashBits - p + 1
    val alpha = hllAlpha(m)
    registers.groupBy(col(g1), col(g2), col("gid")).agg(
      count(lit(1)).as("m"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($s - max_rank AS INT))"))
        .as("sum_scaled"),
      sum(when(col("max_rank") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col(g1), col(g2), col("gid"), col("m"), col("sum_scaled"),
        col("n_zero"),
        round(lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
          lit(math.pow(2.0, s)) / col("sum_scaled").cast("double"), 6)
          .as("est6"))
  }

  /** Per-group estimates off a [[hllGroupedRegisters]] table — the same
    * exact-BIGINT harmonic sum and single rounded float division as
    * [[hllEstimate]], one row per group.
    */
  def hllGroupedEstimate(registers: DataFrame, groupCol: String,
      p: Int): DataFrame = {
    val m = 1L << p
    val s = HashBits - p + 1
    val alpha = hllAlpha(m)
    registers.groupBy(col(groupCol)).agg(
      count(lit(1)).as("m"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($s - max_rank AS INT))"))
        .as("sum_scaled"),
      sum(when(col("max_rank") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col(groupCol), col("m"), col("sum_scaled"), col("n_zero"),
        round(lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
          lit(math.pow(2.0, s)) / col("sum_scaled").cast("double"), 6).as("est6"))
  }

  def hllEstimateCorrected(registers: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    hllEstimate(registers, p).select(
      col("m"), col("sum_scaled"), col("n_zero"), col("est6"),
      round(
        when(col("n_zero") > 0L && col("est6") <= lit(2.5 * m.toDouble),
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero").cast("double")))
          .otherwise(col("est6")), 6).as("est6c"))
  }

  /** Count-min heavy-hitters sketch: `depth × width` exact-BIGINT counters,
    * `[row, col, cnt]` with zero counters materialized so the output shape
    * is `depth * width` rows regardless of data. Row `i`'s hash is the
    * portable 60-bit md5 of `"i:" + key` (the same [[Sampling.keyHash60]]
    * convention as the HLL — `md5(CAST(i AS VARCHAR) || ':' || key)` runs
    * verbatim in any SQL engine), reduced mod `width`; `h` is non-negative
    * by construction so `%` agrees across engines.
    *
    * This is the bounded-width companion to an exact corpus top-k (t06):
    * exact top-k shuffles the full vocabulary; the sketch's reduce side is
    * `depth * width` rows at ANY scale (map-side-combinable groupBy), and
    * two sketches over disjoint corpus halves merge by elementwise `+` —
    * the per-partition/per-day fold that makes a 100 TB profiling pass one
    * scan plus a constant-size combine.
    */
  /** The stateless `[row, col]` cell projection under [[cmsRegisters]] —
    * shared with the STREAMING grid builder
    * ([[graft.streaming.Streams.streamingCmsRegisters]]), where it feeds
    * the same `groupBy(row, col).count()` as continuously-maintained
    * additive state. Package-private: callers want the aggregated grids.
    */
  private[graft] def cmsObservations(df: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"cms depth must be in [1,16], got $depth")
    require(width >= 16 && width <= (1 << 20),
      s"cms width must be in [16, 2^20], got $width")
    df.select(col(keyCol).cast("string").as("__cms_k"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"), col("__cms_k"))
      .select(col("row").cast(LongType).as("row"),
        pmod(Sampling.keyHash60(
          concat(col("row").cast("string"), lit(":"), col("__cms_k"))),
          lit(width.toLong)).as("col"))
  }

  def cmsRegisters(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    // Per-KEY pre-count before the depth unpivot: the depth explode runs
    // over the vocabulary-sized count table, not depth× the corpus — the
    // identical grid by construction ([[cmsRegistersFromCounts]] salts the
    // same "row:key" hash; each cell sums pre-counted weights). The
    // corpus-facing stage is one map-side-combinable groupBy on the key.
    //
    // Measured ALTERNATIVE, rejected (r20): aggregating the exploded
    // observations directly on (row, col) — a ≤depth·width-key map-side
    // combine, near-zero exchange — reads slower at sf0.1 (interleaved
    // same-session A/B, 3 rounds: direct 6.8-9.9s vs pre-count 4.8-5.5s):
    // the depth× per-token string-concat+hash work dominates long before
    // the vocabulary exchange does. Re-weigh only if a profile shows the
    // vocabulary shuffle itself dominating (very high distinct-key-to-
    // token ratios at much larger scale).
    cmsRegistersFromCounts(
      df.select(col(keyCol).cast("string").as("__cms_k0"))
        .groupBy("__cms_k0").agg(count(lit(1)).as("__cms_n0")),
      "__cms_k0", "__cms_n0", depth, width)
  }

  /** [[cmsRegisters]] ingesting a PRE-AGGREGATED `(key, count)` table:
    * each distinct key adds its count to its `depth` cells (weighted
    * ingest — `sum(cnt)` per cell instead of `count(1)`, identical grid by
    * construction). Use when a key-count aggregate already exists in the
    * pipeline (e.g. alongside an exact top-k): the sketch then costs one
    * vocabulary-sized pass instead of a second corpus scan.
    */
  def cmsRegistersFromCounts(counts: DataFrame, keyCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"cms depth must be in [1,16], got $depth")
    require(width >= 16 && width <= (1 << 20),
      s"cms width must be in [16, 2^20], got $width")
    val spark = counts.sparkSession
    val seen = counts
      .select(col(keyCol).cast("string").as("__cms_k"),
        col(cntCol).cast(LongType).as("__cms_c"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col("__cms_k"), col("__cms_c"))
      .select(col("row").cast(LongType).as("row"),
        pmod(Sampling.keyHash60(
          concat(col("row").cast("string"), lit(":"), col("__cms_k"))),
          lit(width.toLong)).as("col"),
        col("__cms_c"))
      .groupBy("row", "col").agg(sum("__cms_c").as("cnt"))
    spark.range(depth).select(col("id").as("row"))
      .crossJoin(spark.range(width).select(col("id").as("col")))
      .join(seen, Seq("row", "col"), "left")
      .select(col("row"), col("col"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Fixed-bin histogram sketch over an integer-lattice column (cents/
    * micros): `[bin, cnt]`, all `binCount` rows materialized, where
    * `bin = v < lo ? 0 : min(binCount-1, (v - lo) div binWidth)` — the
    * guard keeps the numerator non-negative so truncating (Spark) and
    * flooring (DuckDB) integer division agree, and out-of-range values
    * clamp to the edge bins instead of poisoning the sketch. The third
    * member of the mergeable-sketch family (HLL = distinct, CMS =
    * frequency, histogram = QUANTILES): one map-side-combinable groupBy
    * whose reduce side is `binCount` rows at any scale, and two
    * histograms (per-partition/per-day) merge by elementwise `+`.
    */
  def histRegisters(df: DataFrame, valueCol: String, lo: Long,
      binWidth: Long, binCount: Int): DataFrame = {
    val seen = histObservations(df, valueCol, lo, binWidth, binCount)
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    df.sparkSession.range(binCount).select(col("id").as("bin"))
      .join(seen, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** The per-row bin assignment [[histRegisters]] aggregates — exposed so
    * the streaming formulation (st09) shares the exact clamp/div lattice
    * with the batch one; one `bin` row per non-NULL input value.
    */
  def histObservations(df: DataFrame, valueCol: String, lo: Long,
      binWidth: Long, binCount: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(binCount >= 2 && binCount <= (1 << 20),
      s"binCount must be in [2, 2^20], got $binCount")
    val v = col(valueCol).cast(LongType)
    val bin = when(v < lo, lit(0L)).otherwise(
      least(lit(binCount - 1L), expr(s"(CAST($valueCol AS BIGINT) - $lo) div $binWidth")))
    df.filter(v.isNotNull).select(bin.as("bin"))
  }

  /** Quantile estimates off a histogram register table: for each requested
    * permille `q`, the target rank `ceil(q * N / 1000)` (exact integer
    * arithmetic: `(q*N + 999) div 1000`), the smallest bin whose
    * cumulative count reaches it, and the bin's UPPER edge as the
    * estimate — a one-sided bound with error at most `binWidth`, entirely
    * in BIGINTs (no interpolation floats, nothing for an oracle to
    * disagree with). Output `[permille, target_rank, bin,
    * est_upper_cents]`. The cumulative window runs over `binCount` rows —
    * sketch-sized, not data-sized.
    */
  def histQuantiles(registers: DataFrame, lo: Long, binWidth: Long,
      permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1,1000], got $permilles")
    val spark = registers.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = registers.withColumn("cum", sum("cnt").over(w))
    val n = registers.agg(sum("cnt").as("n"))
    val targets = permilles.map(_.toLong).toDF("permille")
      .crossJoin(broadcast(n))
      .select(col("permille"),
        expr("(permille * n + 999) div 1000").as("target_rank"))
    targets.join(cum, col("cum") >= col("target_rank"))
      .groupBy("permille", "target_rank")
      .agg(min("bin").as("bin"))
      .select(col("permille"), col("target_rank"), col("bin"),
        (lit(lo) + (col("bin") + 1L) * lit(binWidth)).as("est_upper_cents"))
  }

  /** Per-GROUP histogram register tables — the quantile member of the
    * grouped-sketch family (grouped HLL = [[hllGroupedRegisters]], grouped
    * CMS = [[cmsGroupedRegisters]]): per-slice value distributions at
    * `groups * binCount` rows, one map-side-combinable groupBy, zero bins
    * materialized per group, per-(group, bin) merge by `+`. Same
    * clamp/div lattice as [[histObservations]].
    */
  def histGroupedRegisters(df: DataFrame, groupCol: String, valueCol: String,
      lo: Long, binWidth: Long, binCount: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(binCount >= 2 && binCount <= (1 << 20),
      s"binCount must be in [2, 2^20], got $binCount")
    val v = col(valueCol).cast(LongType)
    val bin = when(v < lo, lit(0L)).otherwise(
      least(lit(binCount - 1L), expr(s"(CAST($valueCol AS BIGINT) - $lo) div $binWidth")))
    val seen = df.filter(v.isNotNull)
      .select(col(groupCol).as("__h_grp"), bin.as("bin"))
      .groupBy("__h_grp", "bin").agg(count(lit(1)).as("cnt"))
    // Joinless dense zero-fill; NULL groups correct by construction — see
    // hllGroupedRegisters. (bin is never NULL: v is filtered non-NULL.)
    val packed = seen.groupBy("__h_grp").agg(
      map_from_entries(collect_list(struct(col("bin"), col("cnt")))).as("__mp"))
    packed.select(col("__h_grp"),
        posexplode(transform(sequence(lit(0L), lit(binCount - 1L)),
          b => coalesce(element_at(col("__mp"), b), lit(0L))))
          .as(Seq("__pos", "cnt")))
      .select(col("__h_grp").as(groupCol),
        col("__pos").cast(LongType).as("bin"), col("cnt"))
  }

  /** Per-group quantile estimates off a [[histGroupedRegisters]] table —
    * [[histQuantiles]]' integer-exact convention (target rank
    * `(q*N + 999) div 1000`, smallest reaching bin, upper-edge estimate)
    * with every step keyed by the group. All windows and joins run over
    * sketch-sized tables (`groups * binCount` rows), never the data.
    */
  def histGroupedQuantiles(registers: DataFrame, groupCol: String,
      lo: Long, binWidth: Long, permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1,1000], got $permilles")
    val spark = registers.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = registers.withColumn("cum", sum("cnt").over(w))
    val n = registers.groupBy(groupCol).agg(sum("cnt").as("n"))
    val targets = permilles.map(_.toLong).toDF("permille")
      .crossJoin(broadcast(n))
      .select(col(groupCol), col("permille"),
        expr("(permille * n + 999) div 1000").as("target_rank"))
    targets.join(cum, Seq(groupCol))
      .filter(col("cum") >= col("target_rank"))
      .groupBy(groupCol, "permille", "target_rank")
      .agg(min("bin").as("bin"))
      .select(col(groupCol), col("permille"), col("target_rank"), col("bin"),
        (lit(lo) + (col("bin") + 1L) * lit(binWidth)).as("est_upper_cents"))
  }

  /** Point-query estimates off a count-min register table: for each key in
    * `keys`, the min over the `depth` counters it hashes to — the classic
    * CMS upper bound (`est_cnt >= true count`, equality when no collision).
    * The register table is broadcast (`depth * width` rows, bounded by
    * construction), so estimating any number of keys is one shuffle-free
    * join plus a `depth`-row-per-key min — no vocabulary-sized exchange.
    *
    * Rows whose `keyCol` is NULL are dropped (a NULL key has no hash and
    * therefore no counters; [[cmsRegisters]] never ingests one either).
    * All join plumbing lives in reserved `__cms_*` columns so the caller's
    * frame passes through untouched — `keys` may not already contain them.
    */
  /** Per-GROUP count-min grids — the frequency-family twin of
    * [[hllGroupedRegisters]] (grouped HLL = distinct-per-slice, grouped
    * CMS = frequency-per-slice): one `depth × width` counter grid per
    * group, `[<groupCol>, row, col, cnt]` with zero cells materialized per
    * group. Same portable salted-row hashing as [[cmsRegisters]]; the
    * group list comes from the AGGREGATED observations (no second corpus
    * scan). Reduce side is `groups * depth * width` rows at ANY corpus
    * scale (map-side-combinable groupBy), and two grouped grids (per-day,
    * per-partition) merge by per-(group, row, col) `+` — the same fold
    * that licenses per-partition sketching at 100 TB (q19 merge laws).
    */
  def cmsGroupedRegisters(df: DataFrame, groupCol: String, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"cms depth must be in [1,16], got $depth")
    require(width >= 16 && width <= (1 << 20),
      s"cms width must be in [16, 2^20], got $width")
    // Per-KEY pre-aggregation BEFORE the depth unpivot: the old shape
    // exploded every corpus row depth× before its partial aggregate —
    // map-side combine bounded the shuffle, but the scan side still
    // streamed depth×|corpus| rows through the hash projection. Counting
    // per distinct (group, key) first (map-side-combinable, vocabulary-
    // sized result) makes the depth explode run over |vocab| rows, and
    // each cell sums pre-counted weights — the identical grid by
    // construction (same "row:key" salted hash), at 1/depth the scan work.
    val keyCnt = df
      .select(col(groupCol).as("__cms_grp"),
        col(keyCol).cast("string").as("__cms_k"))
      .groupBy("__cms_grp", "__cms_k").agg(count(lit(1)).as("__cms_c"))
    // Flattened cell index row*width+col, all depth hashes in ONE
    // projection; a NULL key hashes NULL (dropped from the map below, as
    // the old NULL cell never matched the grid join).
    val posCols = (0 until depth).map { r =>
      lit(r.toLong * width) + pmod(Sampling.keyHash60(
        concat(lit(s"$r:"), col("__cms_k"))), lit(width.toLong))
    }
    val cells = keyCnt
      .select(col("__cms_grp"), col("__cms_c"),
        explode(array(posCols: _*)).as("__cms_idx"))
      .groupBy("__cms_grp", "__cms_idx").agg(sum("__cms_c").as("cnt"))
    // Joinless dense zero-fill; NULL groups correct by construction — see
    // hllGroupedRegisters.
    val packed = cells.groupBy("__cms_grp").agg(
      map_from_entries(collect_list(when(col("__cms_idx").isNotNull,
        struct(col("__cms_idx"), col("cnt"))))).as("__mp"))
    packed
      .select(col("__cms_grp"), col("__mp"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("row"))
      .select(col("__cms_grp"), col("row"),
        posexplode(transform(sequence(lit(0L), lit(width - 1L)),
          c => coalesce(
            element_at(col("__mp"), col("row") * lit(width.toLong) + c),
            lit(0L)))).as(Seq("__pos", "cnt")))
      .select(col("__cms_grp").as(groupCol), col("row"),
        col("__pos").cast(LongType).as("col"), col("cnt"))
  }

  /** Point estimates off a [[cmsGroupedRegisters]] grid for probe rows
    * carrying `(groupCol, keyCol)`: `min` over the key's `depth` cells
    * WITHIN its group's grid. All probe columns pass through plus
    * `est_cnt`. The grid is `groups * depth * width` rows — broadcast —
    * so probing is one scan of the probe set, no probe shuffle.
    */
  def cmsGroupedEstimates(registers: DataFrame, keys: DataFrame,
      groupCol: String, keyCol: String, depth: Int, width: Int): DataFrame = {
    val reserved = Seq("__cms_row", "__cms_col", "__cms_cnt")
    require(!keys.columns.exists(reserved.contains),
      s"cmsGroupedEstimates reserves columns ${reserved.mkString(", ")}")
    val hashed = keys
      .where(col(keyCol).isNotNull && col(groupCol).isNotNull)
      .withColumn("__cms_row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("__cms_row", col("__cms_row").cast(LongType))
      .withColumn("__cms_col", pmod(Sampling.keyHash60(
        concat(col("__cms_row").cast("string"), lit(":"),
          col(keyCol).cast("string"))),
        lit(width.toLong)))
    val regs = registers.select(col(groupCol), col("row").as("__cms_row"),
      col("col").as("__cms_col"), col("cnt").as("__cms_cnt"))
    // LEFT join: a probe group with no grid (never observed) estimates 0
    // — the empty-sketch truth — instead of silently vanishing from the
    // output (the inner-join behavior diverged from cmsEstimates, whose
    // full grid answers every probe).
    hashed.join(broadcast(regs), Seq(groupCol, "__cms_row", "__cms_col"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(coalesce(min("__cms_cnt"), lit(0L)).as("est_cnt"))
  }

  def cmsEstimates(registers: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val reserved = Seq("__cms_row", "__cms_col", "__cms_cnt")
    require(!keys.columns.exists(reserved.contains),
      s"cmsEstimates reserves columns ${reserved.mkString(", ")}")
    val hashed = keys
      .where(col(keyCol).isNotNull)
      .withColumn("__cms_row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("__cms_row", col("__cms_row").cast(LongType))
      .withColumn("__cms_col", pmod(Sampling.keyHash60(
        concat(col("__cms_row").cast("string"), lit(":"),
          col(keyCol).cast("string"))),
        lit(width.toLong)))
    // Rename ALL register columns into the reserved namespace before the
    // join: `keys` may legitimately carry its own `row`/`col`/`cnt` (e.g.
    // the exact top-k frame this sketch gates against), which must pass
    // through untouched.
    val regs = registers.select(col("row").as("__cms_row"),
      col("col").as("__cms_col"), col("cnt").as("__cms_cnt"))
    hashed.join(broadcast(regs), Seq("__cms_row", "__cms_col"))
      .groupBy(keys.columns.map(col): _*)
      .agg(min("__cms_cnt").as("est_cnt"))
  }
}
