package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class SamplingSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def docs = (0L until 1000L).toDF("doc_id")

  test("hashSplit: deterministic, total, and stable under repartitioning") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val once = Sampling.hashSplit(docs, "doc_id", splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once.size == 1000, "every row assigned")
    // Weights hold approximately (hash uniformity, n=1000).
    val counts = once.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    // Stability: a different physical layout yields the identical map.
    val again = Sampling.hashSplit(docs.repartition(7), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == once)
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.1))
    }
  }

  test("stratifiedTakeK: k smallest hashes per stratum, sort/window-free plan") {
    val df = (0L until 300L).map(i => (s"s${i % 3}", i)).toDF("source", "doc_id")
    val sampled = Sampling.stratifiedTakeK(df, "source", "doc_id", 4)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.toLowerCase.contains("sort "), s"sort in plan:\n$plan")
    val got = sampled.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Oracle: brute-force smallest-4 by (hash, id) per stratum.
    val hashed = df.withColumn("h", Sampling.keyHash60(col("doc_id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hashed.groupBy(_._1).view.mapValues(
      _.sortBy(t => (t._3.toDouble, t._2)).take(4).map(_._2).toSet).toMap
    assert(got == expected)
    // Strata smaller than k return everything.
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("source", "doc_id")
    assert(Sampling.stratifiedTakeK(tiny, "source", "doc_id", 4).count() == 3)
  }

  // --- packSequences (p08) ---------------------------------------------

  private def weighted = (0L until 200L).map(i => (i, (i % 5) + 1L))
    .toDF("doc_id", "n_toks")

  /** Independent replay: sort by (hash60, key) on the driver, running
    * prefix over weights, then the same div/% coordinate math. */
  private def replay(rows: Seq[(Long, Long, Long)], seqLen: Long)
      : Map[Long, (Long, Long, Long)] = {
    var acc = 0L
    rows.sortBy { case (id, _, h) => (h, id) }
      .map { case (id, w, _) =>
        val g = acc; acc += w
        id -> (g / seqLen, g % seqLen, (g + w - 1) / seqLen - g / seqLen + 1)
      }.toMap
  }

  test("packSequences: coordinates equal the sequential (hash, key) replay") {
    val seqLen = 7L
    val hashed = weighted
      .withColumn("h", Sampling.keyHash60(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = replay(hashed, seqLen)
    val got = Sampling.packSequences(weighted, "doc_id", "n_toks", seqLen)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    // The layout is dense: total mass = 200 docs * avg weight 3 = 600
    // tokens; the last sequence id is (600-1)/7 and some doc straddles a
    // sequence boundary (n_seqs > 1 exists since weights reach 5 > 7-off).
    assert(got.values.map(_._1).max == (600L - 1) / seqLen)
    assert(got.values.exists(_._3 > 1L), "some doc must straddle a sequence")
  }

  test("packSequences: coordinates are nShards-invariant and shard boundaries straddle") {
    val seqLen = 64L
    def coords(nShards: Int): Map[Long, (Long, Long, Long)] =
      Sampling.packSequences(weighted, "doc_id", "n_toks", seqLen, nShards)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    val one = coords(1)
    // nShards is an implementation detail of the prefix sum: 1 shard (a
    // single global window), 3 (does not divide 2^60 — exercises the ceil
    // width), and the default 32 must agree coordinate-for-coordinate.
    assert(coords(3) == one, "nShards=3 moved coordinates")
    assert(coords(32) == one, "nShards=32 moved coordinates")
    // Straddle: with 3 shards and seqLen 64 the per-shard masses (~200
    // tokens) are not multiples of 64, so the first doc of shards 1 and 2
    // starts mid-sequence — the layout is continuous ACROSS shards.
    val withShard = Sampling.packSequences(weighted, "doc_id", "n_toks", seqLen, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val firstOfLaterShards = withShard.groupBy(_._1).filter(_._1 > 0L)
      .values.map(_.minBy(t => (t._2, t._3)))
    assert(firstOfLaterShards.exists(t => t._3 != 0L),
      "a later shard must start mid-sequence (boundary straddle)")
  }

  test("packSequences fails loud on zero-weight rows") {
    val bad = Seq((1L, 3L), (2L, 0L)).toDF("doc_id", "n_toks")
    val e = intercept[Exception] {
      Sampling.packSequences(bad, "doc_id", "n_toks", 8L).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("weights must be >= 1")
      || (e.getCause != null && e.getCause.getMessage.contains("weights must be >= 1")))
  }

  // --- negativePairs (p09) ----------------------------------------------

  test("negativePairs: pairs equal the cyclic-offset replay on hash ranks") {
    val df = (0L until 37L).toDF("doc_id")
    val got = Sampling.negativePairs(df, "doc_id", k = 3, seed = "spec")
      .as[(Long, Long, Long)].collect().toSet
    // Independent replay: md5-hash60 ranks, contiguous seeded offsets.
    val n = 37L
    val ranked = (0L until n).map(id => (id, Sampling.hash60OfString(id.toString)))
      .sortBy { case (id, h) => (h, id) }.map(_._1)
    val rankOf = ranked.zipWithIndex.map { case (id, r) => id -> r.toLong }.toMap
    val h0 = Sampling.hash60OfString("spec") % (n - 1)
    val expected = (for {
      id <- 0L until n
      j <- 0 until 3
      off = 1L + (h0 + j) % (n - 1)
    } yield (id, j.toLong, ranked(((rankOf(id) + off) % n).toInt))).toSet
    assert(got === expected)
  }

  test("negativePairs: permutation balance, no self-pairs, nShards-invariant") {
    val df = (0L until 200L).toDF("doc_id")
    val got = Sampling.negativePairs(df, "doc_id", k = 4, seed = "e1")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size === 200 * 4)
    assert(got.forall { case (a, _, b) => a != b }, "self-pair leaked")
    // Per-anchor negatives distinct; every row serves as negative exactly k
    // times (each offset is a cyclic permutation — the balance guarantee).
    assert(got.groupBy(_._1).values.forall(_.map(_._3).distinct.size == 4))
    val asNeg = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(asNeg.values.forall(_ == 4), "pairing not balanced")
    for (shards <- Seq(1, 5)) {
      val alt = Sampling.negativePairs(df, "doc_id", k = 4, seed = "e1",
        nShards = shards).as[(Long, Long, Long)].collect().toSet
      assert(alt === got.toSet, s"nShards=$shards changed the pairing")
    }
    // A different seed shifts the offset window: some pair differs.
    val other = Sampling.negativePairs(df, "doc_id", k = 4, seed = "e2")
      .as[(Long, Long, Long)].collect().toSet
    assert(other !== got.toSet, "seed had no effect")
  }

  test("negativePairs: excludeCol drops exactly the same-value pairs, no refill") {
    val df = (0L until 60L).map(i => (i, (i % 3).toInt)).toDF("doc_id", "grp")
    val bare = Sampling.negativePairs(df, "doc_id", k = 2, seed = "x")
      .as[(Long, Long, Long)].collect().toSet
    val grpOf = (0L until 60L).map(i => i -> (i % 3).toInt).toMap
    val excluded = Sampling.negativePairs(df, "doc_id", k = 2, seed = "x",
        excludeCol = Some("grp"))
      .as[(Long, Long, Long, Int)].collect().toSet
    // Exclusion == the bare pairing minus same-group rows; neg_grp audits.
    val expected = bare.filter { case (a, _, b) => grpOf(a) != grpOf(b) }
      .map { case (a, j, b) => (a, j, b, grpOf(b)) }
    assert(excluded === expected)
    assert(excluded.size < bare.size, "exclusion dropped nothing")
  }

  test("negativePairs: loud guards on k and corpus size") {
    val tiny = Seq(1L, 2L, 3L).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Sampling.negativePairs(tiny, "doc_id", k = 3, seed = "s") // k > n-1
    }
    intercept[IllegalArgumentException] {
      Sampling.negativePairs(Seq(1L).toDF("doc_id"), "doc_id", 1, "s")
    }
    intercept[IllegalArgumentException] {
      Sampling.negativePairs(tiny, "doc_id", k = 0, seed = "s")
    }
  }
}
