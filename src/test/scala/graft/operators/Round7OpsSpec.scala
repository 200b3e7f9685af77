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

  // ---- count-min heavy-hitters sketch ----

  /** Reference 60-bit md5 hash (the Sampling.keyHash60 convention). */
  private def refHash60(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("cmsRegisters: grid matches from-scratch salted hashes; halves merge by +") {
    val keys = (1L to 300L).map(i => s"k${i % 37}") // 37 distinct, skewed counts
    val df = keys.toDF("k")
    val got = Sketches.cmsRegisters(df, "k", depth = 3, width = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 3 * 64)
    val expect = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    keys.foreach { k =>
      (0 until 3).foreach { row =>
        expect((row.toLong, refHash60(s"$row:$k") % 64)) += 1L
      }
    }
    got.foreach { case (cell, cnt) => assert(cnt == expect(cell), s"cell $cell") }
    // Mergeability: sketches of two disjoint halves fold by elementwise +
    // into exactly the full sketch — the per-partition/per-day combine.
    val a = Sketches.cmsRegisters(keys.take(150).toDF("k"), "k", 3, 64)
    val b = Sketches.cmsRegisters(keys.drop(150).toDF("k"), "k", 3, 64)
    val folded = a.withColumnRenamed("cnt", "ca")
      .join(b.withColumnRenamed("cnt", "cb"), Seq("row", "col"))
      .select($"row", $"col", ($"ca" + $"cb").as("cnt"))
    val full = Sketches.cmsRegisters(df, "k", 3, 64)
    assert(folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty)
  }

  test("cmsEstimates: upper bound on every corpus gram, error within CMS bound") {
    // The synthetic corpus's bigram distribution is near-FLAT (top-10
    // counts 44-51 vs dozens at 37-43, collision mass N/w ~ 27): top-k
    // containment is structurally meaningless here — same adjudicated
    // property that defeats t06/s04 pruning. What IS meaningful on the
    // real corpus: the one-sided error contract.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val grams = docs
      .select(explode(TextFunctions.tokenNgrams($"text", 2)).as("gram"))
    val exact = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
    val regs = Sketches.cmsRegisters(grams, "gram", depth = 4, width = 1024)
    val est = Sketches.cmsEstimates(regs, exact, "gram", depth = 4, width = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = est.map(_._2).sum
    // CMS never underestimates (min over rows still counts every true
    // hit), and the deterministic worst case per counter is bounded by the
    // whole stream; empirically the min-over-4-rows error stays inside a
    // few expected-collision units (N/w ~ 27).
    est.foreach { case (g, cnt, e) =>
      assert(e >= cnt, s"$g: est $e < true $cnt")
      assert(e - cnt <= 8L * n / 1024L, s"$g: error ${e - cnt} implausible")
    }
  }

  test("cmsRegistersFromCounts: weighted ingest == raw-stream ingest") {
    // Pre-aggregating then adding cnt per cell must build the identical
    // grid — the identity that lets a pipeline with an existing key-count
    // table skip the second corpus scan.
    val keys = (1L to 500L).map(i => s"k${i % 61}").toDF("k")
    val raw = Sketches.cmsRegisters(keys, "k", depth = 3, width = 64)
    val agg = keys.groupBy("k").agg(count(lit(1)).as("c"))
    val weighted = Sketches.cmsRegistersFromCounts(agg, "k", "c", depth = 3, width = 64)
    assert(weighted.exceptAll(raw).isEmpty && raw.exceptAll(weighted).isEmpty)
  }

  test("cmsEstimates: top-k containment on a skewed (Zipf) stream") {
    // Where heavy hitters actually exist (count >> N/width collision
    // noise), the sketch must surface them: key i repeated 2000/i times,
    // i in 1..200 -> top counts 2000, 1000, 666 ... vs noise ~ 11.
    val rows = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"key$i"))
    val df = rows.toDF("k")
    val exact = df.groupBy("k").agg(count(lit(1)).as("cnt"))
    val regs = Sketches.cmsRegisters(df, "k", depth = 4, width = 1024)
    val est = Sketches.cmsEstimates(regs, exact, "k", depth = 4, width = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exactTop10 = est.sortBy { case (g, cnt, _) => (-cnt, g) }.take(10)
      .map(_._1).toSet
    val sketchTop15 = est.sortBy { case (g, _, e) => (-e, g) }.take(15)
      .map(_._1).toSet
    assert(exactTop10.subsetOf(sketchTop15),
      s"missing: ${exactTop10 -- sketchTop15}")
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
