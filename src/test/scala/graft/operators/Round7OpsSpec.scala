package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame
import graft.text.TextFunctions

class Round7OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // ---- sequence packing under a pinned multi-partition range shuffle ----

  test("packSequences: >= 2 forced range partitions agree with 1 partition") {
    // The two-phase scan runs phase 1 (offset collect) and phase 3
    // (placement) as SEPARATE jobs over the ranged frame; the eager local
    // checkpoint pins ONE partitioning for both. Forcing 5 range partitions
    // exercises nontrivial per-partition offsets; the result must be a pure
    // function of (doc_id, text) — identical to the 1-partition run — and
    // conserve token mass.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val multi =
      TextFunctions.packSequences(docs, "doc_id", "text", 64L, numPartitions = 5)
        .cache()
    val single =
      TextFunctions.packSequences(docs, "doc_id", "text", 64L, numPartitions = 1)
    assert(multi.exceptAll(single).isEmpty && single.exceptAll(multi).isEmpty)
    val total = docs.select(TextFunctions.tokenCount($"text").as("c"))
      .filter($"c" > 0).agg(sum("c")).collect().head.getLong(0)
    assert(multi.agg(sum("n_toks")).collect().head.getLong(0) == total)
    // Every sequence except the last is exactly full under the forced split.
    val perSeq = multi.groupBy("seq_id").agg(sum("n_toks").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (s, n) => assert(n == 64L || s == lastSeq, s"seq $s has $n") }
    multi.unpersist()
  }

  // ---- HLL small-m alpha + linear-counting correction ----

  test("hllEstimate: p=4 uses the canonical 0.673 small-m alpha") {
    val regs = Sketches.hllRegisters((1L to 1000L).toDF("k"), "k", p = 4)
    val est = Sketches.hllEstimate(regs, p = 4).collect().head
    val sumScaled = est.getLong(1)
    // Replay the formula with the paper's m=16 constant; the asymptotic
    // 0.7213/(1+1.079/16) = 0.67561... would differ in the 3rd decimal.
    val s = 60 - 4 + 1
    val expect = math.rint(
      0.673 * 16.0 * 16.0 * math.pow(2.0, s) / sumScaled.toDouble * 1e6) / 1e6
    assert(est.getDouble(3) == expect, s"est6 ${est.getDouble(3)} vs $expect")
  }

  test("hllEstimateCorrected: linear counting fires small, passes through large") {
    // n = 40 << 2.5 * 256: raw HLL is badly biased down here; the
    // balls-in-bins corrector m * ln(m / n_zero) recovers the cardinality.
    val small = Sketches.hllEstimateCorrected(
      Sketches.hllRegisters((1L to 40L).toDF("k"), "k", p = 8), p = 8)
      .collect().head
    val nZero = small.getLong(2)
    assert(nZero > 0L && small.getDouble(3) <= 640.0) // correction branch armed
    val expect = math.rint(256.0 * math.log(256.0 / nZero.toDouble) * 1e6) / 1e6
    assert(small.getDouble(4) == expect)
    assert(math.abs(small.getDouble(4) - 40.0) / 40.0 < 0.20,
      s"corrected ${small.getDouble(4)} vs exact 40")
    // n = 5000 >> 2.5 * 256: the correction must NOT fire; est6c == est6.
    val large = Sketches.hllEstimateCorrected(
      Sketches.hllRegisters((1L to 5000L).toDF("k"), "k", p = 8), p = 8)
      .collect().head
    assert(large.getDouble(3) > 640.0)
    assert(large.getDouble(4) == large.getDouble(3))
  }

  // ---- weighted SSSP: genuine overflow still raises post null-guard ----

  test("weighted shortest paths: genuine Long overflow raises distributed") {
    // dist(2) = 2^62, then 2^62 + 2^62 overflows at vertex 3. Weights are
    // all non-NULL, so the only NULL try_add can produce is real overflow —
    // the raise must fire (not wrap negative, not silently drop).
    val big = 1L << 62
    val g = GraphFrame(Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id"),
      Seq((1L, 2L, big), (2L, 3L, big)).toDF("src", "dst", "weight"))
    val e = intercept[Exception] {
      g.weightedShortestPaths(Seq(1L)).smallGraphThreshold(0)
        .run().vertices.collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString("; ")
    assert(messages.contains("Long overflow"), messages)
  }
}
