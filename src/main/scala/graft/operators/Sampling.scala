package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * NO `rand()` anywhere: at 100 TB a train/val/test split must be a pure
  * function of the row KEY so it is stable under task retries, shuffles,
  * repartitioning, and incremental backfills (a re-ingested document lands
  * in the same split it was in last month), and reproducible by any other
  * engine auditing the pipeline. Both operators rank rows by the 60-bit
  * portable md5 hash ([[graft.functions.PortableHashes]] convention:
  * `('0x' || substr(md5(key), 1, 15))::BIGINT` in DuckDB,
  * `conv(substring(md5(key), 1, 15), 16, 10)` in Spark), which any
  * md5-capable engine can replay in plain SQL — that is what makes an
  * exact oracle possible.
  */
object Sampling {

  /** 2^60 as a double — the hash space size used for weight thresholds. */
  private val HashSpace = (1L << 60).toDouble

  /** 60-bit portable hash of `key` rendered as a string. Built-ins only —
    * stays inside whole-stage codegen, no custom kernel needed here.
    */
  def keyHash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** Hash-RANGE shard width: `ceil(2^60 / nShards)` — `h div width`
    * stays < nShards for every h in [0, 2^60) even when nShards does not
    * divide 2^60. ONE definition shared by [[packSequences]],
    * [[negativePairs]], and
    * [[graft.streaming.Streams.streamingSequenceOffsets]] (and matched
    * by the p08 oracle constant) so the batch, streaming, and replay
    * arithmetic can never drift.
    */
  private[graft] def shardWidth(nShards: Int): Long = {
    require(nShards >= 1 && nShards <= (1 << 16),
      s"nShards must be in [1, 65536], got $nShards")
    ((1L << 60) + nShards - 1) / nShards
  }

  /** The integer hash threshold for a cumulative weight in [0, 1]: the
    * split boundary `floor(cum * 2^60)`. Public so oracle SQL can embed the
    * exact same constants the plan compares against.
    */
  def threshold(cum: Double): Long = (cum * HashSpace).toLong

  /** Assign every row to a named split by comparing its key hash against
    * cumulative integer thresholds — `hashSplit(df, "doc_id",
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`. The last split is
    * the unconditional `otherwise`, so weight rounding can never leave a
    * row unassigned. One projection, zero shuffles.
    */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    val h = keyHash60(col(keyCol))
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cums.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cum), rest) =>
        when(h < lit(threshold(cum)), lit(name)).otherwise(rest)
      }
    df.withColumn(outCol, assigned)
  }

  /** Deterministic k-per-stratum sample: the k rows with the SMALLEST key
    * hashes in each stratum — a rerun-stable "reservoir". Implemented with
    * the bounded-heap [[graft.functions.TopKByScore]] aggregate (score =
    * `-hash` as double, ties by key ascending): per-stratum state is O(k)
    * on the map side, the shuffle moves `strata x k` rows, and no sort or
    * window over the full corpus ever appears in the plan — the
    * scale-correct shape for sampling a 100 TB corpus.
    *
    * `keyCol` must be LONG (the heap's id slot); output is one
    * `(strataCol, keyCol)` row per sampled key.
    */
  def stratifiedTakeK(df: DataFrame, strataCol: String, keyCol: String,
      k: Int): DataFrame = {
    val h = keyHash60(col(keyCol))
    df.select(col(strataCol), col(keyCol).cast(LongType).as("__samp_id"),
        negate(h.cast(DoubleType)).as("__samp_score"))
      .groupBy(col(strataCol))
      .agg(graft.functions.TopKByScore
        .top_k_by_score(col("__samp_score"), col("__samp_id"), k).as("__tk"))
      .select(col(strataCol), explode(col("__tk.id")).as(keyCol))
  }

  /** Mixture (quota) sampling: EXACTLY `min(quota_c, count_c)` rows per
    * category — the data-mixing primitive that turns per-domain target
    * counts ("20 B tokens web, 5 B code, 1 B math") into a concrete,
    * rerun-stable document selection. SEMANTICS: per category, the
    * `quota_c` rows with the smallest portable key hashes, ties broken by
    * key — i.e. `row_number() OVER (PARTITION BY cat ORDER BY hash, key)
    * <= quota_c`, which is exactly the p04 oracle. Categories without a
    * quota are dropped. Output `[<catCol>, <keyCol>]`.
    *
    * EXECUTION is deliberately not that window: a per-category global
    * sort shuffles the whole corpus and serializes each category through
    * one task (hot categories = the skew worst case). [[stratifiedTakeK]]'s
    * bounded heap is wrong here too — mixture quotas are millions of rows,
    * not top-20s. Instead, distributed selection by histogram refinement:
    *   1. one map-side-combinable `groupBy (cat, bucket)` count, where
    *      `bucket` is the top `histBits` bits of the hash — the shuffle
    *      carries `cats * 2^histBits` rows no matter the corpus size;
    *   2. the driver prefix-scans each category's histogram (bounded:
    *      `quotas.size * 2^histBits` longs) to find the BOUNDARY bucket
    *      containing the quota-th smallest hash, and how many rows of it
    *      are still needed;
    *   3. rows in buckets below the boundary are selected by a broadcast
    *      lookup — no shuffle, no sort; ONLY the boundary bucket's rows
    *      (≈ `count_c / 2^histBits` of the category) go through a
    *      `row_number` window to rank the remainder exactly.
    * Bucket order is hash-prefix order, so phases 3a/3b compose to the
    * exact global (hash, key) rank. At 1000 executors the full sort never
    * happens; the only windowed data is a 2^histBits-th of one category.
    */
  def quotaSample(df: DataFrame, catCol: String, keyCol: String,
      quotas: Seq[(String, Long)], histBits: Int = 12): DataFrame =
    weightedBudgetSelect(df, catCol, keyCol, lit(1L), quotas, histBits)

  /** Token-budget selection: per category, take documents in (hash, key)
    * order until the category's WEIGHT budget is exhausted — the
    * real-world mixture primitive ("20 B tokens of web, 5 B of code"),
    * where quotas are token mass, not document counts. A row is selected
    * iff the cumulative weight of all rows BEFORE it (hash-rank order) is
    * still under the budget — i.e.
    * `sum(w) OVER (PARTITION BY cat ORDER BY hash, key
    *               ROWS UNBOUNDED PRECEDING) - w < budget_c`,
    * which is exactly the p05 oracle; the last selected document may
    * overshoot the budget by part of its own mass (take-until semantics).
    * Weights must be non-negative BIGINTs (token counts) — integer
    * cumulative mass is exactly replayable; a float weight sum would be
    * summation-order-dependent.
    *
    * Runs on the same histogram-refinement execution as [[quotaSample]]
    * (which is this selection with weight 1): bucket histograms carry
    * `sum(w)` instead of counts, and only the boundary bucket pays an
    * exact cumulative-sum window.
    */
  def tokenBudgetSample(df: DataFrame, catCol: String, keyCol: String,
      weightCol: String, budgets: Seq[(String, Long)],
      histBits: Int = 12): DataFrame =
    weightedBudgetSelect(df, catCol, keyCol,
      col(weightCol).cast(LongType), budgets, histBits)

  /** The shared weighted core of [[quotaSample]] / [[tokenBudgetSample]]:
    * per category, rows in (hash, key) order whose cumulative
    * preceding-weight is under the category budget.
    */
  private def weightedBudgetSelect(df: DataFrame, catCol: String,
      keyCol: String, weight: org.apache.spark.sql.Column,
      budgets: Seq[(String, Long)], histBits: Int): DataFrame = {
    require(budgets.nonEmpty, "at least one category budget required")
    require(budgets.forall(_._2 >= 0), "budgets must be non-negative")
    require(histBits >= 4 && histBits <= 16,
      s"histBits must be in [4,16], got $histBits")
    val spark = df.sparkSession
    import spark.implicits._
    val shift = 60 - histBits
    val base = df
      .filter(col(catCol).isin(budgets.map(_._1): _*))
      .select(col(catCol).as("__qs_cat"), col(keyCol).as("__qs_key"),
        keyHash60(col(keyCol)).as("__qs_h"), weight.as("__qs_w"))
      .withColumn("__qs_b", shiftrightunsigned(col("__qs_h"), shift))
    // Phase 1: per-(category, bucket) weight mass — the only corpus-wide
    // aggregate, map-side combinable, reduce side bounded by cats * 2^bits.
    val hist = base.groupBy("__qs_cat", "__qs_b").agg(sum("__qs_w").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Phase 2: driver prefix scan per category -> (boundary bucket, mass
    // still needed from it). budget >= total mass degenerates to take-all
    // (boundary past the last bucket); budget 0 to take-none (boundary
    // -1, so even zero-weight rows are excluded, matching the strict
    // `cum_before < budget` window).
    val bounds = budgets.map { case (cat, budget) =>
      if (budget == 0L) (cat, -1L, 0L)
      else {
        val buckets = (0L until (1L << histBits))
          .map(b => b -> hist.getOrElse((cat, b), 0L)).filter(_._2 > 0)
        var remaining = budget
        var boundary = 1L << histBits // past-the-end: everything selected
        var needed = 0L
        val it = buckets.iterator
        while (it.hasNext && boundary == (1L << histBits)) {
          val (b, m) = it.next()
          if (m >= remaining) { boundary = b; needed = remaining }
          else remaining -= m
        }
        (cat, boundary, needed)
      }
    }.toDF("__qs_cat", "__qs_boundary", "__qs_needed")
    val withBounds = base.join(broadcast(bounds), Seq("__qs_cat"))
    // Phase 3a: strictly-below-boundary buckets — selected, shuffle-free
    // (scanned buckets keep cum mass < budget by construction; zero-mass
    // buckets below the boundary add nothing to any row's cum_before).
    val below = withBounds.filter(col("__qs_b") < col("__qs_boundary"))
      .select(col("__qs_cat"), col("__qs_key"))
    // Phase 3b: the boundary bucket only — exact cumulative-mass window
    // among ~1/2^histBits of one category, keep rows whose preceding mass
    // fits in what the budget still needs.
    val atBoundary = withBounds.filter(col("__qs_b") === col("__qs_boundary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__qs_cat").orderBy(col("__qs_h"), col("__qs_key"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val boundarySel = atBoundary
      .withColumn("__qs_cb", sum("__qs_w").over(w) - col("__qs_w"))
      .filter(col("__qs_cb") < col("__qs_needed"))
      .select(col("__qs_cat"), col("__qs_key"))
    below.union(boundarySel)
      .select(col("__qs_cat").as(catCol), col("__qs_key").as(keyCol))
  }

  /** Temperature-scaled mixture weights (the T5/data-mixing rate
    * computation): per category, `w_c ∝ n_c^alpha` with `alpha = 1/T < 1`
    * UPWEIGHTING small categories — the knob that stops a 90% web crawl
    * from drowning the 1% math slice. Output
    * `[<catCol>, n_docs, w_micro, share6]` where `w_micro =
    * floor(n_c^alpha * 1e6)` on the integer lattice (sqrt is IEEE
    * correctly-rounded, so the floor is engine-exact; `alpha = 0.5` is
    * computed via `sqrt`, other alphas via `pow`, which is only
    * 1-ulp-accurate — the oracle gate pins 0.5) and `share6` is the one
    * rounded float division `w_c / Σw`. One category-sized aggregate; the
    * corpus is scanned once (scoped cache guards the total's second read).
    */
  def temperatureMixtureWeights(df: DataFrame, catCol: String,
      alpha: Double = 0.5): DataFrame =
    graft.operators.CacheScope.scoped { scope =>
      require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
      val nd = col("n_docs").cast("double")
      val raw = if (alpha == 0.5) sqrt(nd) else pow(nd, alpha)
      val w = scope.cache(
        df.groupBy(col(catCol)).agg(count(lit(1)).as("n_docs"))
          .withColumn("w_micro", floor(raw * lit(1000000.0)).cast(LongType)))
      val tot = w.agg(sum("w_micro").as("tw"))
      w.crossJoin(broadcast(tot))
        .select(col(catCol), col("n_docs"), col("w_micro"),
          round(col("w_micro").cast("double") / col("tw").cast("double"), 6)
            .as("share6"))
    }

  /** GPT-style sequence packing (concat-and-chop): lay every document out
    * on one global token axis in deterministic (hash, key) order, then cut
    * the axis every `seqLen` tokens into training sequences. Each
    * document gets the sequence coordinates a sequential packer would
    * assign — `seq_id`/`seq_off` of its first token and the number of
    * sequences it spans — without any sequential pass: offsets are a
    * distributed prefix sum. No `rand()`, no epoch state; a re-run (or an
    * auditing engine) reproduces the exact same layout from the keys
    * alone, which is what makes an exact SQL oracle possible.
    *
    * Execution is the two-level prefix-sum: rows RANGE-shard into
    * `nShards` contiguous slices of the 60-bit hash axis (`hash60 div
    * ceil(2^60/nShards)` — the md5 hash is uniform, so slices are
    * balanced); ONE window per shard computes the intra-shard running
    * mass (the only corpus-wide exchange — hash-partitioned on the shard
    * id, `nShards` is the parallelism knob, so at 100 TB you raise it and
    * every shard still sorts only `corpus/nShards` rows); a
    * map-side-combined aggregate reduces each shard to its total
    * (`nShards` rows), the driver prefix-scans those into per-shard base
    * offsets, and a broadcast join adds the bases back. Because shards
    * are contiguous hash RANGES (not `hash % nShards` residues), the
    * concatenated per-shard orders equal the single global (hash, key)
    * order — the `seq_id`/`seq_off`/`n_seqs` coordinates are therefore
    * invariant in `nShards`, which really is just an implementation
    * detail of the prefix sum (spec-pinned). Global offset arithmetic is
    * all BIGINT `div`/`%` — exact, no double rounding — and a sequence
    * may legally straddle a shard boundary.
    *
    * Weights (token counts) must be >= 1 — a zero-length document has no
    * position on the token axis, and silently placing it would make two
    * engines disagree on ties; the guard fails loud instead.
    *
    * Determinism assumes DISTINCT keys: ties break on (hash, key), so two
    * rows sharing a key (necessarily also a hash) are interchangeable in
    * the layout — if they carry different weights, their offsets swap
    * freely between runs. Keys are row identifiers by contract (as in
    * [[hashSplit]]); pre-dedup or disambiguate the key if yours are not.
    *
    * Output `[<keyCol>, shard, seq_id, seq_off, n_seqs]` — `shard` is the
    * one nShards-DEPENDENT column (kept so callers can write the layout
    * partitioned by it); the three coordinates are nShards-invariant.
    */
  def packSequences(df: DataFrame, keyCol: String, weightCol: String,
      seqLen: Long, nShards: Int = 32): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val width = shardWidth(nShards)
    val base = df.select(col(keyCol).as("__sp_key"),
        col(weightCol).cast(LongType).as("__sp_w"),
        keyHash60(col(keyCol)).as("__sp_h"))
      .withColumn("__sp_w",
        when(col("__sp_w") >= 1L, col("__sp_w"))
          .otherwise(raise_error(lit(
            "packSequences: weights must be >= 1 tokens"))))
      .withColumn("__sp_s", expr(s"__sp_h div ${width}L"))
    // Per-shard totals -> driver prefix scan -> base offsets. The
    // aggregate re-reads only [key, weight] (column-pruned); reduce side
    // is nShards rows. Shards are dense 0..nShards-1 with empties at 0.
    val spark = df.sparkSession
    import spark.implicits._
    val totals = base.groupBy("__sp_s").agg(sum("__sp_w").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bases = (0 until nShards).scanLeft(0L) { (acc, s) =>
      acc + totals.getOrElse(s.toLong, 0L)
    }.init.zipWithIndex.map { case (b, s) => (s.toLong, b) }
      .toDF("__sp_s", "__sp_base")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__sp_s").orderBy(col("__sp_h"), col("__sp_key"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base.join(broadcast(bases), Seq("__sp_s"))
      .withColumn("__sp_g",
        col("__sp_base") + sum("__sp_w").over(w) - col("__sp_w"))
      .select(col("__sp_key").as(keyCol), col("__sp_s").as("shard"),
        expr(s"__sp_g div $seqLen").as("seq_id"),
        (col("__sp_g") % seqLen).as("seq_off"),
        (expr(s"(__sp_g + __sp_w - 1) div $seqLen")
          - expr(s"__sp_g div $seqLen") + lit(1L)).as("n_seqs"))
  }

  /** Finalize a drained [[graft.streaming.Streams.streamingSequenceOffsets]]
    * frame `[key, shard, w, cum]` into the [[packSequences]] coordinates
    * `[<keyCol>, shard, seq_id, seq_off, n_seqs]`: shard totals (the max
    * running sum per shard = sum of w) prefix on the driver into base
    * offsets — nShards longs, the p08 discipline — then the BIGINT
    * `div`/`%` coordinate math verbatim. Batch [[packSequences]] keeps its
    * own tail on purpose: there the totals aggregate over the pre-window
    * scan (column-pruned, window runs once); here the offsets frame is an
    * already-drained sink table, so aggregating it is free.
    */
  def packCoords(offsets: DataFrame, keyCol: String, seqLen: Long,
      nShards: Int = 32): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(nShards >= 1 && nShards <= (1 << 16),
      s"nShards must be in [1, 65536], got $nShards")
    val spark = offsets.sparkSession
    import spark.implicits._
    val totals = offsets.groupBy("shard").agg(sum("w").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(totals.keys.forall(s => s >= 0 && s < nShards),
      s"offsets carry shard ids outside [0, $nShards) — was the frame " +
        "produced with a different nShards?")
    val bases = (0 until nShards).scanLeft(0L) { (acc, s) =>
      acc + totals.getOrElse(s.toLong, 0L)
    }.init.zipWithIndex.map { case (b, s) => (s.toLong, b) }
      .toDF("shard", "__sp_base")
    offsets.join(broadcast(bases), Seq("shard"))
      .withColumn("__sp_g", col("__sp_base") + col("cum") - col("w"))
      .select(col("key").as(keyCol), col("shard"),
        expr(s"__sp_g div $seqLen").as("seq_id"),
        (col("__sp_g") % seqLen).as("seq_off"),
        (expr(s"(__sp_g + w - 1) div $seqLen")
          - expr(s"__sp_g div $seqLen") + lit(1L)).as("n_seqs"))
  }

  /** Deterministic EPOCH SHUFFLE (p10): assign every row a global
    * position in a seeded pseudo-random permutation of the corpus —
    * the training-data order for one epoch. Trainers need (a) a fresh
    * order per epoch, (b) bit-identical reruns (resume a crashed epoch,
    * reproduce a loss curve), and (c) contiguous positions 0..n-1 (so
    * position ranges map to files/steps) — `ORDER BY rand()` fails (b),
    * and assigning CONTIGUOUS ranks normally costs either an RDD
    * `zipWithIndex` (extra job, order opaque to Catalyst) or one global
    * `row_number` window, whose single unpartitioned task is the p08
    * scale wall this module exists to avoid.
    *
    * Construction = [[packSequences]]'s two-level discipline with unit
    * weights on a SEEDED axis: rank rows by `h = hash60(seed || '|' ||
    * key)` (md5 scrambles content order; a new seed = an independent
    * order), shard on contiguous hash ranges `h div width` (so
    * concatenated per-shard orders equal the global (h, key) order and
    * positions are nShards-INVARIANT — nShards is purely a parallelism
    * knob, spec-pinned), per-shard `row_number` windows each sort only
    * corpus/nShards rows, and the driver prefix-scans nShards longs
    * into base offsets. Distinct keys by contract ([[packSequences]]'s
    * tie rule: two rows sharing a key share a hash and swap freely).
    *
    * Output `[<keyCol>, shard, pos]`: `pos` is a permutation of
    * [0, n) — dense, no gaps, no collisions; `shard` is kept so callers
    * can write the epoch layout partitioned by it (readers then stream
    * shard files in order and get the global order for free).
    */
  def epochShuffle(df: DataFrame, keyCol: String, seed: String,
      nShards: Int = 32): DataFrame = {
    val width = shardWidth(nShards)
    val base = df.select(col(keyCol).as("__es_key"),
        keyHash60(concat(lit(seed), lit("|"),
          col(keyCol).cast("string"))).as("__es_h"))
      .withColumn("__es_s", expr(s"__es_h div ${width}L"))
    val spark = df.sparkSession
    import spark.implicits._
    val totals = base.groupBy("__es_s").agg(count(lit(1)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bases = (0 until nShards).scanLeft(0L) { (acc, s) =>
      acc + totals.getOrElse(s.toLong, 0L)
    }.init.zipWithIndex.map { case (b, s) => (s.toLong, b) }
      .toDF("__es_s", "__es_base")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__es_s").orderBy(col("__es_h"), col("__es_key"))
    base.join(broadcast(bases), Seq("__es_s"))
      .select(col("__es_key").as(keyCol), col("__es_s").as("shard"),
        (col("__es_base") + row_number().over(w) - lit(1L)).as("pos"))
  }

  /** Driver-side twin of [[keyHash60]] for a literal string (the seed):
    * first 15 hex digits of the md5, parsed base-16 — bit-identical to
    * the engine column and to the oracle's
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`.
    */
  def hash60OfString(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** Priority sampling (Duffield–Lund–Thorup, "Priority sampling for
    * estimating arbitrary subset sums", JACM 54(6), 2007): draw EXACTLY
    * `k` rows weighted by `weightCol` and attach to each an estimator
    * `est_weight` whose sum over ANY subset of the sample unbiasedly
    * estimates that subset's true weight mass — the weighted corpus
    * subsample that still answers "how many tokens of German legal text
    * did I keep?" without rescanning the corpus.
    *
    * Construction: every row gets priority `q = w / u01` with
    * `u01 = (hash60(seed:key) + 1) / 2^60` a deterministic uniform in
    * (0, 1]; the k highest-priority rows are the sample; `tau` is the
    * (k+1)-th priority and each kept row carries
    * `est_weight = max(w, tau)` (rows with fewer than k+1 inputs keep
    * `tau = 0`, i.e. `est_weight = w` — the sample is exhaustive).
    *
    * Determinism discipline (what makes the hash-exact oracle possible):
    * NO `rand()`, NO `ln()`/`pow()` (libm-dependent across engines) —
    * `q` is built from the portable md5 hash by an exact int64→double
    * conversion, one EXACT division by the power-of-two 2^60, and one
    * IEEE-rounded division; every engine rounds those identically, so
    * ranking, `tau`, and `est_weight` replay bit-exact in DuckDB SQL.
    *
    * SHAPE at 100 TB: the top-(k+1) is a `TakeOrderedAndProject` —
    * per-partition bounded heaps, one merge task over
    * nPartitions·(k+1) rows; no global sort, no full shuffle, and `tau`
    * comes from a window over the k+1 survivors (one task, k+1 rows).
    * Keys must be distinct (the [[packSequences]] contract).
    *
    * Output `[<keyCol>, weight, priority, est_weight]`, the k sampled
    * rows.
    */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: String): DataFrame =
    priorityFinalize(priorityScores(df, keyCol, weightCol, seed), keyCol, k)

  /** The scoring half of [[prioritySample]]: `[<keyCol>, weight,
    * priority]` for every input row — map-only, codegen'd, shared
    * verbatim by the batch operator and the streaming candidate emitter
    * ([[graft.streaming.Streams.streamingPriorityCandidates]]) so the
    * two paths can never drift onto different priorities.
    */
  def priorityScores(df: DataFrame, keyCol: String, weightCol: String,
      seed: String, carry: Seq[String] = Nil): DataFrame =
    df.select(carry.map(col) ++ Seq(col(keyCol),
        col(weightCol).cast(LongType).as("weight")): _*)
      .withColumn("weight",
        when(col("weight") >= 1L, col("weight"))
          .otherwise(raise_error(lit(
            "prioritySample: weights must be >= 1"))))
      .withColumn("__ps_u",
        keyHash60(concat(lit(seed), lit(":"),
          col(keyCol).cast("string"))) + lit(1L))
      .withColumn("priority",
        col("weight").cast(DoubleType) /
          (col("__ps_u").cast(DoubleType) / lit(HashSpace)))
      .drop("__ps_u")

  /** STRATIFIED priority sampling (p12): [[prioritySample]] per
    * category — exactly `min(k, |cat|)` weighted rows PER GROUP, each
    * carrying its group's own `max(w, tau_g)` estimator, so per-domain
    * subset token masses stay unbiasedly estimable after a per-domain
    * subsample (the mixing pipeline's "sample every source, keep every
    * source auditable" contract).
    *
    * SHAPE at 100 TB: priorities are the shared [[priorityScores]]
    * map-only pass; per-group selection is ONE bounded-heap
    * `top_k_by_score` aggregate (heap id = the key, so the double-score
    * tie-break IS the (priority DESC, key) order — the q35 monotone-
    * cast argument); `tau_g` reads the (k+1)-th heap entry in place. NO
    * window, NO per-group sort. Weights ride back via one broadcast
    * join of the (cats × k)-row kept set against a second scores pass —
    * two map-only corpus scans rather than caching a corpus-sized
    * frame.
    *
    * Output `[<catCol>, <keyCol>, weight, priority, est_weight]`.
    */
  def stratifiedPrioritySample(df: DataFrame, catCol: String,
      keyCol: String, weightCol: String, k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // The bounded-heap kernel carries the KEY as its i64 id, so — unlike
    // the ungrouped form, which never round-trips the key through the
    // heap — this operator requires an integer key. Fail with the
    // contract up front, not the kernel's type error.
    require(df.schema(keyCol).dataType == org.apache.spark.sql.types.LongType,
      s"stratifiedPrioritySample needs an i64 key column (the heap id); " +
        s"'$keyCol' is ${df.schema(keyCol).dataType.simpleString} — " +
        "map string keys to i64 ids first")
    val scored = priorityScores(df, keyCol, weightCol, seed,
      carry = Seq(catCol))
    val kept = scored.groupBy(col(catCol))
      .agg(graft.functions.TopKByScore
        .top_k_by_score(col("priority"), col(keyCol), k + 1).as("__tk"))
      .withColumn("__sp_tau",
        when(size(col("__tk")) === k + 1,
          element_at(col("__tk"), k + 1)("score")).otherwise(lit(0.0)))
      .select(col(catCol), col("__sp_tau"),
        explode(slice(col("__tk"), 1, k)).as("__sp_e"))
      // Fresh aliases: kept and scored share one lineage (possibly a
      // drained memory-sink view), and a same-exprId self-join fails
      // resolution — the kmvSetEstimates lesson. The category match is
      // NULL-SAFE so a NULL category survives selection (groupBy keeps
      // NULL as a key; a plain equi-join would silently drop it).
      .select(col(catCol).as("__sp_c"), col("__sp_e.id").as("__sp_k"),
        col("__sp_tau"))
    scored.join(broadcast(kept),
        col(catCol) <=> col("__sp_c") && col(keyCol) === col("__sp_k"))
      .select(col(catCol), col(keyCol), col("weight"), col("priority"),
        greatest(col("weight").cast(DoubleType), col("__sp_tau"))
          .as("est_weight"))
  }

  /** The selection half of [[prioritySample]]: top-k of a scored frame
    * by `(priority DESC, key)` plus the tau estimator. Separated out so
    * the STREAMING path can run it over a drained candidate union — the
    * candidate set a monotone per-shard top-(k+1) state emits is
    * arrival-order-DEPENDENT, but it provably contains the global
    * top-(k+1), so this finalize step makes the end result a pure
    * function of the row set again (order-free, the st20 discipline).
    */
  def priorityFinalize(scored: DataFrame, keyCol: String, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val top = scored
      .select(col(keyCol), col("weight"), col("priority"))
      .orderBy(col("priority").desc, col(keyCol)).limit(k + 1)
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority").desc, col(keyCol))
    val full = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    top.withColumn("__ps_rn", row_number().over(ord))
      .withColumn("__ps_tau",
        coalesce(max(when(col("__ps_rn") === k + 1, col("priority")))
          .over(full), lit(0.0)))
      .filter(col("__ps_rn") <= k)
      .select(col(keyCol), col("weight"), col("priority"),
        greatest(col("weight").cast(DoubleType), col("__ps_tau"))
          .as("est_weight"))
  }

  /** Deterministic negative sampling for contrastive training: every row
    * (anchor) gets `k` "negative" partners drawn ~uniformly from the rest
    * of the corpus with ZERO randomness — rerun-identical, resume-stable,
    * SQL-replayable, the property every selector in this family holds.
    *
    * Construction: rank each row on the 60-bit key-hash axis (rank r in
    * [0, n), order (hash, key) — pseudo-random relative to content), then
    * pair anchor r's slot j with the row at rank `(r + off_j) mod n`,
    * where the k shared offsets `off_j = 1 + ((hash60(seed) + j) mod
    * (n-1))` are a contiguous run in [1, n-1]. Each offset induces a
    * cyclic PERMUTATION: no self-pairs (off > 0), per-anchor negatives
    * distinct (offsets distinct for k <= n-1), and every row serves as a
    * negative exactly k times — a balanced pairing, where hash-argmin
    * schemes concentrate load. A contiguous run of hash-ranked rows IS a
    * uniform-ish sample because hash order scrambles content order; the
    * seed shifts the whole offset window, giving fresh negatives per
    * epoch (`seed = s"epoch-$i"`).
    *
    * `excludeCol`: drop pairs whose anchor and negative agree on the
    * column (same label/source/document — the false-negative guard).
    * Dropped slots are NOT refilled — an anchor may keep fewer than k
    * negatives; refilling would need data-dependent probing that breaks
    * both the permutation balance and the closed-form replay. At the
    * usual regime (k ≪ distinct exclude values, collision rate ~1/cats)
    * the loss is a few percent; raise k to compensate.
    *
    * SHAPE at 100 TB: ranks come from the [[packSequences]] two-level
    * prefix sum with weight 1 (one exchange on the hash-RANGE shard id,
    * each shard sorts corpus/nShards rows, driver sees nShards longs —
    * ranks are nShards-invariant because shards are contiguous hash
    * ranges); the k-slot fan-out is a map-side posexplode of a k-literal
    * array; the pairing is ONE hash-partitioned equi-join on the dense
    * integer rank (balanced by construction). No window over the whole
    * corpus, no quadratic term, no driver data beyond the shard counts.
    *
    * Output `[<keyCol>, slot, neg_<keyCol>]` (+ `neg_<excludeCol>` when
    * excluding, so callers can audit the guard).
    */
  def negativePairs(df: DataFrame, keyCol: String, k: Int, seed: String,
      excludeCol: Option[String] = None, nShards: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val width = shardWidth(nShards)
    val exCols = excludeCol.map(c => col(c).as("__np_ex")).toSeq
    val base = df.select(col(keyCol).as("__np_key") +: exCols: _*)
      .withColumn("__np_h", keyHash60(col("__np_key")))
      .withColumn("__np_s", expr(s"__np_h div ${width}L"))
    val spark = df.sparkSession
    import spark.implicits._
    val counts = base.groupBy("__np_s").agg(count(lit(1)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    require(n >= 2, s"negativePairs needs >= 2 rows, got $n")
    require(k <= n - 1,
      s"k=$k exceeds n-1=${n - 1}: cannot draw k distinct negatives")
    val bases = (0 until nShards).scanLeft(0L) { (acc, s) =>
      acc + counts.getOrElse(s.toLong, 0L)
    }.init.zipWithIndex.map { case (b, s) => (s.toLong, b) }
      .toDF("__np_s", "__np_base")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__np_s").orderBy(col("__np_h"), col("__np_key"))
    val ranked = base.join(broadcast(bases), Seq("__np_s"))
      .withColumn("__np_r",
        col("__np_base") + row_number().over(w) - lit(1L))
      .drop("__np_s", "__np_base", "__np_h")
    val h0 = java.lang.Math.floorMod(hash60OfString(seed), n - 1)
    val offsets = (0 until k).map(j => 1L + (h0 + j) % (n - 1))
    val anchorCols = Seq(col("__np_key"), col("__np_r"),
      posexplode(typedLit(offsets)).as(Seq("slot", "__np_off"))) ++
      exCols.map(_ => col("__np_ex"))
    val anchors = ranked.select(anchorCols: _*)
      .withColumn("__np_t", pmod(col("__np_r") + col("__np_off"), lit(n)))
    val negs = ranked.select(
      col("__np_key").as("__np_nkey") +:
        col("__np_r").as("__np_nr") +:
        exCols.map(_ => col("__np_ex").as("__np_nex")): _*)
    val joined = anchors.join(negs, col("__np_t") === col("__np_nr"))
    val kept = excludeCol match {
      case Some(_) => joined.filter(!(col("__np_ex") <=> col("__np_nex")))
      case None => joined
    }
    val out = col("__np_key").as(keyCol) +:
      col("slot").cast(LongType).as("slot") +:
      col("__np_nkey").as(s"neg_$keyCol") +:
      excludeCol.map(c => col("__np_nex").as(s"neg_$c")).toSeq
    kept.select(out: _*)
  }

  /** Deterministic mixture-interleave keys — the data-LOADER ordering
    * primitive the mixture selectors (p04/p05) stop short of: reading the
    * corpus in ascending `interleave_key` order visits every category at
    * its proportional cadence (category c's k-th doc sits at the midpoint
    * `(2k-1)/(2·cnt_c)` of the unit interval, scaled to an exact integer
    * `(2k-1)·1e12 div (2·cnt_c)`), so a sequential trainer sees a
    * stationary mixture instead of category-clumped data, with zero
    * randomness — rerun-identical, resume-stable.
    *
    * Per-category ranks come from a (hash, key) window here — the
    * SEMANTIC spec; at corpus scale ranks substitute the p04 histogram
    * refinement (same contract, `cats × 2^bits` shuffle, no global sort).
    * The KEY is the output: writing range-partitioned by it materializes
    * the interleaved order without any global numbering step.
    *
    * Output `[<catCol>, <keyCol>, cat_rank, interleave_key]`.
    */
  def mixtureInterleaveKeys(df: DataFrame, catCol: String,
      keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(catCol).orderBy(keyHash60(col(keyCol)), col(keyCol))
    // floor(x*S/b) computed as x*(S div b) + (x*(S mod b)) div b — exact
    // (S = qb + r identity) and overflow-free where the naive x*S product
    // wraps past 2^63 once a category exceeds ~4.6M rows. The remainder
    // product x*(S mod b) < b^2 bounds validity at b = 2*cnt <= ~3e9,
    // i.e. 1.5e9 rows per category; the guard keeps failure loud.
    df.select(col(catCol), col(keyCol))
      .withColumn("cat_rank", row_number().over(w).cast(LongType))
      .withColumn("__cnt", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(catCol)))
      .withColumn("__cnt",
        when(col("__cnt") > 1500000000L,
          raise_error(lit("mixtureInterleaveKeys: category exceeds the " +
            "1.5e9-row exact-arithmetic bound")))
          .otherwise(col("__cnt")))
      .select(col(catCol), col(keyCol), col("cat_rank"),
        expr("""(2 * cat_rank - 1) * (1000000000000 div (2 * __cnt))
               + ((2 * cat_rank - 1) * (1000000000000 % (2 * __cnt))) div (2 * __cnt)""")
          .as("interleave_key"))
  }
}
