package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.catalyst.{expressions => catalyst}
import org.apache.spark.sql.types.LongType


import graft.functions.BloomKernels

/** Bloom-pruned semi joins: the runtime-filter pattern for the case Spark's
  * planner cannot express — a fact/dimension semi join where the dimension
  * key set is far too large to broadcast as rows (10^8–10^9 keys) but its
  * BLOOM FILTER is tiny (2^27 bits = 16 MB at ~1% FP for 10^8 keys).
  *
  * Shape, end to end:
  *   1. BUILD: one scan of the dimension keys → per-partition packed
  *      bitsets ([[graft.functions.BloomWordsAgg]], map-side OR-combine) →
  *      ONE `mBits/64`-word row collected to the driver. The shuffle
  *      carries `partitions x mBits/64` longs regardless of key count; the
  *      driver holds one bounded bitset — the same budget Spark's own
  *      `InjectRuntimeFilter` grants its bloom subquery.
  *   2. PRUNE: a [[graft.functions.BloomContains]] predicate directly above
  *      the fact scan — k md5 probes per row inside WholeStageCodegen, no
  *      join node, no exchange. False-positive rows survive; true matches
  *      always do (no false negatives).
  *   3. EXACT: a left-semi join of the SURVIVORS against the distinct
  *      dimension keys removes the false positives. At scale this is the
  *      shuffle the bloom exists to shrink: only `sel + fp` of the fact
  *      ever reaches it.
  *
  * The q21 gate runs 1+2+3 against a plain `IN (subquery)` DuckDB oracle —
  * exactness must hold for ANY bitset contents; a false NEGATIVE (dropped
  * true match) is exactly what the hash gate would catch.
  */
object RuntimeFilter {

  /** Driver-collected packed bitset over `kHashes` probe positions of each
    * (distinct implied — duplicates just re-set bits) dimension key. The
    * per-salt positions are one projected array (`xxhash64(key, 42+salt)
    * mod mBits` — the seed is a literal per salt, matching
    * [[graft.functions.BloomKernels.position]] exactly), exploded into the
    * single-row packed aggregate.
    */
  def bloomBitsetWords(dim: DataFrame, keyCol: String,
      mBits: Int, kHashes: Int): Array[Long] = {
    require(kHashes >= 1 && kHashes <= 16, s"kHashes out of range: $kHashes")
    val key = col(keyCol).cast(LongType)
    val positions = (0 until kHashes).map { salt =>
      pmod(compat.column(catalyst.XxHash64(
        Seq(compat.expression(key)), 42L + salt)), lit(mBits.toLong))
    }
    val one = dim
      .select(explode(array(positions: _*)).as("__bf_pos"))
      .agg(BloomKernels.bloom_words(col("__bf_pos"), mBits).as("w"))
      .head()
    one.getSeq[Long](0).toArray
  }

  /** Fact rows whose `keyCol` passes the bloom probe (exact matches plus
    * false positives). Purely a filter — no join, no shuffle.
    */
  def bloomPrune(fact: DataFrame, keyCol: String, words: Array[Long],
      mBits: Int, kHashes: Int): DataFrame =
    fact.filter(BloomKernels.bloom_contains(
      col(keyCol).cast(LongType), words, mBits, kHashes))

  /** The full exact semi join: bloom-prune, then left-semi the survivors
    * against the distinct dimension keys. Output = fact rows with at least
    * one dimension match, bit-for-bit equal to `fact WHERE key IN (SELECT
    * dimKey FROM dim)` — the bloom only changes HOW MUCH of the fact
    * reaches the exact join.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      mBits: Int = 1 << 20, kHashes: Int = 3): DataFrame = {
    val words = bloomBitsetWords(dim, dimKey, mBits, kHashes)
    val pruned = bloomPrune(fact, factKey, words, mBits, kHashes)
    val keys = dim.select(col(dimKey).as("__bf_dim_key")).distinct()
    pruned.join(keys, pruned(factKey) === col("__bf_dim_key"), "left_semi")
  }
}
