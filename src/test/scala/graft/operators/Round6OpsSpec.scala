package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.text.TextFunctions

class Round6OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // ---- HLL sketch ----

  /** Reference 60-bit md5 hash (the Sampling.keyHash60 convention). */
  private def refHash60(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("hllRegisters: register/rank match a from-scratch md5 computation") {
    val keys = (1L to 200L).toDF("k")
    val got = Sketches.hllRegisters(keys, "k", p = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 256 && got.keys.min == 0L && got.keys.max == 255L)
    // Reference registers computed independently.
    val expect = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    (1L to 200L).foreach { k =>
      val h = refHash60(k.toString)
      val reg = h & 255L
      val w = h >>> 8
      val rank = 53L - (if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > expect(reg)) expect(reg) = rank
    }
    (0L until 256L).foreach(r => assert(got(r) == expect(r), s"register $r"))
  }

  test("hllEstimate: within 20% of exact distinct, registers fold by greatest") {
    val n = 5000L
    val keys = (1L to n).toDF("k")
    val regs = Sketches.hllRegisters(keys, "k", p = 8)
    val est = Sketches.hllEstimate(regs, p = 8).collect().head
    val est6 = est.getDouble(3)
    assert(math.abs(est6 - n) / n < 0.20, s"estimate $est6 vs exact $n")
    // Mergeability: registers of two halves fold by pairwise greatest into
    // exactly the full-set registers — the property that lets a 100 TB
    // scan's per-partition sketches combine without rescanning.
    val a = Sketches.hllRegisters((1L to 2500L).toDF("k"), "k", 8)
    val b = Sketches.hllRegisters((2501L to n).toDF("k"), "k", 8)
    val folded = a.withColumnRenamed("max_rank", "ra")
      .join(b.withColumnRenamed("max_rank", "rb"), "register")
      .select($"register", greatest($"ra", $"rb").as("max_rank"))
    assert(folded.exceptAll(regs).isEmpty && regs.exceptAll(folded).isEmpty)
  }

  // ---- sequence packing ----

  test("packSequences: hand-computed spans, boundary docs split exactly") {
    // token counts: 3, 4, 6, 2 -> offsets 0,3,7,13; seqLen 5 cuts at 5,10,15.
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l m"), (4L, "n o"))
      .toDF("doc_id", "text")
    val rows = TextFunctions.packSequences(docs, "doc_id", "text", seqLen = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (0L, 1L, 0L, 3L),           // doc1 [0,3) in seq0
      (0L, 2L, 0L, 2L), (1L, 2L, 2L, 2L), // doc2 [3,7) splits at 5
      (1L, 3L, 0L, 3L), (2L, 3L, 3L, 3L), // doc3 [7,13) splits at 10
      (2L, 4L, 0L, 2L)))          // doc4 [13,15)
  }

  test("packSequences: invariants on the real corpus across partitionings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = TextFunctions.packSequences(docs, "doc_id", "text", 64L).cache()
    val total = docs.select(TextFunctions.tokenCount($"text").as("c"))
      .filter($"c" > 0).agg(sum("c")).collect().head.getLong(0)
    // Every sequence except the last is exactly full; token mass conserved.
    val perSeq = packed.groupBy("seq_id").agg(sum("n_toks").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (s, n) => assert(n == 64L || s == lastSeq, s"seq $s has $n") }
    assert(perSeq.values.sum == total)
    // Per-doc segments are contiguous and cover [0, cnt).
    val segs = packed.collect().groupBy(_.getLong(1))
    segs.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0)).map(r => (r.getLong(2), r.getLong(3)))
      var pos = 0L
      sorted.foreach { case (st, n) => assert(st == pos && n > 0); pos = st + n }
    }
    // Repartitioning the input must not change the result (the two-phase
    // scan is a pure function of (doc_id, text), not of layout).
    val re = TextFunctions.packSequences(docs.repartition(7), "doc_id", "text", 64L)
    assert(re.exceptAll(packed).isEmpty && packed.exceptAll(re).isEmpty)
    packed.unpersist()
  }

  // ---- PMI collocations ----

  test("pmiBigrams: hand-computed counts and pmi on a toy corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // unigrams a:3 b:2 c:1, nu=6; bigrams "a b":2 "b a":1 "a c":1, nb=4.
    val r = TextFunctions.pmiBigrams(docs, "doc_id", "text", minCount = 2L).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getString(0), row.getString(1)) == ("a", "b"))
    assert((row.getLong(2), row.getLong(3), row.getLong(4)) == (2L, 3L, 2L))
    // ln(2*6*6 / (4*3*2)) = ln(3)
    assert(row.getDouble(5) == math.rint(math.log(3.0) * 1e6) / 1e6 ||
      math.abs(row.getDouble(5) - math.log(3.0)) < 1e-6)
  }

  test("pmiBigrams: minCount filters but totals stay corpus-wide") {
    val docs = Seq((1L, "x y x y x y"), (2L, "p q")).toDF("doc_id", "text")
    val all = TextFunctions.pmiBigrams(docs, "doc_id", "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all == Set(("x", "y"), ("y", "x"), ("p", "q")))
    val filtered = TextFunctions.pmiBigrams(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // "x y":3, "y x":2 survive; totals (nu=8, nb=6) unchanged by the filter:
    // pmi("x y") = ln(3*8*8 / (6*3*3)) = ln(192/54)
    assert(filtered.keySet == Set(("x", "y"), ("y", "x")))
    val pmi = TextFunctions.pmiBigrams(docs, "doc_id", "text", minCount = 2L)
      .filter($"w1" === "x").collect().head.getDouble(5)
    assert(math.abs(pmi - math.log(192.0 / 54.0)) < 1e-6)
  }
}
