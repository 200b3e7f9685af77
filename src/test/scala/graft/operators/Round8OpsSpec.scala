package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.multimodal.Multimodal

class Round8OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // ---- cmsEstimates hardening (round-7 advice pins) ----

  test("cmsEstimates: caller's own row/col/cnt columns pass through untouched") {
    // Pre-fix, withColumn("row")/("col") silently clobbered caller columns
    // of those names and the groupBy then grouped on hash artifacts. The
    // reserved __cms_* plumbing must leave them bit-identical.
    val stream = Seq("a", "a", "b").toDF("k")
    val regs = Sketches.cmsRegisters(stream, "k", depth = 3, width = 64)
    val keys = Seq(("a", 10L, 20L, 30L), ("b", 1L, 2L, 3L))
      .toDF("k", "row", "col", "cnt")
    val est = Sketches.cmsEstimates(regs, keys, "k", depth = 3, width = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(est("a").getLong(1) == 10L && est("a").getLong(2) == 20L &&
      est("a").getLong(3) == 30L)
    assert(est("b").getLong(1) == 1L && est("b").getLong(2) == 2L &&
      est("b").getLong(3) == 3L)
    // And the estimates are still the true CMS upper bounds (tiny stream,
    // no collisions plausible at width 64 with 2 keys).
    assert(est("a").getLong(4) == 2L && est("b").getLong(4) == 1L)
  }

  test("cmsEstimates: NULL keys dropped, reserved __cms_* columns rejected") {
    val stream = Seq("a", "b").toDF("k")
    val regs = Sketches.cmsRegisters(stream, "k", depth = 2, width = 32)
    val withNull = Seq("a", null).toDF("k")
    val out = Sketches.cmsEstimates(regs, withNull, "k", depth = 2, width = 32)
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "a")
    val clash = Seq("a").toDF("k").withColumn("__cms_row", lit(0L))
    val e = intercept[IllegalArgumentException] {
      Sketches.cmsEstimates(regs, clash, "k", depth = 2, width = 32)
    }
    assert(e.getMessage.contains("__cms_row"))
  }

  // ---- WAV decode robustness (round-7 advice pin) ----

  test("wav decode: truncated RIFF header degrades to zero vector, not a crash") {
    // A corrupt-but-recognized container (RIFF/WAVE magic present, header
    // cut short) can throw IOException paths out of javax.sound; the
    // contract is the PNG-junk contract — zero vector per row, job intact.
    val wav = Multimodal.synthesizeWav(7L, 480)
    val cases = Seq(
      1L -> wav.take(20),           // mid-header truncation
      2L -> wav.take(45),           // header complete, data nearly empty
      3L -> Array.empty[Byte])      // empty payload
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (id, b) =>
        Row(id, b, Row("audio/wav", b.length.toLong, "x"))
      }), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(feats(1L).forall(_ == 0.0))
    assert(feats(3L).forall(_ == 0.0))
    // Case 2 either decodes whatever samples survived or yields zeros —
    // both are per-row degradation; the assertion is that we GOT a row.
    assert(feats.contains(2L) && feats(2L).length == 16)
  }

  // ---- bloom-filter decontamination ----

  test("bloomDecontaminate: no false negatives vs exact decontaminate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val heldOut = docs.filter($"doc_id" % 10 === 7)
    val exact = Dedup.decontaminate(docs, heldOut, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bits = Dedup.bloomBits(heldOut, "text", n = 5, mBits = 1 << 16, kHashes = 3)
    val bloom = Dedup.bloomDecontaminate(docs.filter($"doc_id" % 10 =!= 7),
      bits, "doc_id", "text", n = 5, mBits = 1 << 16, kHashes = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // One-sided error: every contaminated doc is flagged, with at least
    // its exact shared-gram count (a truly shared gram always probes set
    // bits — its own insertion set them).
    exact.foreach { case (id, shared) =>
      assert(bloom.contains(id), s"doc $id contaminated but not flagged")
      assert(bloom(id) >= shared, s"doc $id: flagged ${bloom(id)} < shared $shared")
    }
  }

  test("bloomBits: bit sets of corpus halves union into the full bit set") {
    // The per-suite/per-day fold: DISTINCT over the unioned position
    // tables == the filter built over the union of the suites.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" % 10 === 7)
    val a = Dedup.bloomBits(docs.filter($"doc_id" < 250), "text", 5, 1 << 16, 3)
    val b = Dedup.bloomBits(docs.filter($"doc_id" >= 250), "text", 5, 1 << 16, 3)
    val folded = a.union(b).distinct()
    val full = Dedup.bloomBits(docs, "text", 5, 1 << 16, 3)
    assert(folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty)
  }

  // ---- bigram-LM perplexity scoring ----

  test("bigramLmNll: held-out smoothing ranks in-model text below gibberish") {
    import graft.text.TextFunctions
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "the cat sat on the mat"),      // every pair in-model
      (11L, "the cat sat on the floor"),    // one unseen pair (the->floor? no: "the floor")
      (12L, "zyx qwv plm okn ijb uhg"))     // nothing in-model at all
    .toDF("doc_id", "text")
    val out = TextFunctions.bigramLmNll(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 3 && out.values.forall(_._1 == 5L)) // 6 tokens -> 5 pairs
    // Monotone quality signal: fully in-model < one-unseen < all-unseen.
    assert(out(10L)._3 < out(11L)._3 && out(11L)._3 < out(12L)._3, out.toString)
    // All-unseen text scores exactly 5 * floor(1e6 * ln(V)) micros: every
    // pair falls to the 1/(0 + V) floor — pins the left-join + coalesce
    // smoothing path end to end (V = 7 distinct train tokens: the, cat,
    // sat, on, mat, rug, dog).
    val vFloor = math.floor(-math.log(1.0 / 7.0) * 1e6).toLong
    assert(out(12L)._2 == 5L * vFloor, s"${out(12L)._2} vs ${5L * vFloor}")
  }

  // ---- quota (mixture) sampling ----

  test("quotaSample: histogram refinement == plain hash-rank window, any histBits") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val quotas = Seq("en" -> 7L, "zh" -> 3L, "fr" -> 10000L, "de" -> 0L)
    // Reference: the window the p04 oracle runs.
    val w = Window.partitionBy("lang").orderBy(col("__h"), col("doc_id"))
    val expect = docs.filter(col("lang").isin("en", "zh", "fr", "de"))
      .withColumn("__h", Sampling.keyHash60(col("doc_id")))
      .withColumn("__rn", row_number().over(w))
      .join(quotas.toDF("lang", "__q"), "lang")
      .filter(col("__rn") <= col("__q"))
      .select("lang", "doc_id")
    // Coarse 4-bit histogram: ~16 buckets over hundreds of docs forces the
    // boundary bucket to hold MANY rows, so the phase-3b ranking path does
    // real work (at histBits=12 on this corpus most buckets hold 0/1 rows).
    for (bits <- Seq(4, 8, 12)) {
      val got = Sampling.quotaSample(docs, "lang", "doc_id", quotas, histBits = bits)
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        s"histBits=$bits diverges from the rank window")
    }
    // Exact quota sizes: en capped at 7, zh at 3, fr take-all, de zero.
    val sizes = Sampling.quotaSample(docs, "lang", "doc_id", quotas)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frTotal = docs.filter(col("lang") === "fr").count()
    assert(sizes == Map("en" -> 7L, "zh" -> 3L, "fr" -> frTotal))
  }

  test("tokenBudgetSample: histogram refinement == cumulative-weight window") {
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextFunctions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_toks", TextFunctions.tokenCount(col("text")))
    val budgets = Seq("en" -> 400L, "zh" -> 150L, "fr" -> 100000000L, "de" -> 0L)
    val w = Window.partitionBy("lang").orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expect = docs.filter(col("lang").isin("en", "zh", "fr", "de"))
      .withColumn("__h", Sampling.keyHash60(col("doc_id")))
      .withColumn("__cb", sum("n_toks").over(w) - col("n_toks"))
      .join(budgets.toDF("lang", "__b"), "lang")
      .filter(col("__cb") < col("__b"))
      .select("lang", "doc_id")
    for (bits <- Seq(4, 8, 12)) {
      val got = Sampling.tokenBudgetSample(docs, "lang", "doc_id", "n_toks",
        budgets, histBits = bits)
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        s"histBits=$bits diverges from the cumulative-weight window")
    }
    // Budget-0 excludes the whole category even for zero-weight rows
    // (strict cum_before < 0 never holds), and take-all keeps fr intact.
    val out = Sampling.tokenBudgetSample(docs, "lang", "doc_id", "n_toks", budgets)
    assert(out.filter(col("lang") === "de").count() == 0L)
    assert(out.filter(col("lang") === "fr").count() ==
      docs.filter(col("lang") === "fr").count())
    // Take-until semantics: selected en mass crosses the budget only via
    // the last doc (mass - last < budget <= mass).
    val en = out.filter(col("lang") === "en").join(docs, Seq("lang", "doc_id"))
      .select(col("doc_id"), col("n_toks"),
        Sampling.keyHash60(col("doc_id")).as("__h"))
      .collect().sortBy(r => (r.getLong(2), r.getLong(0)))
    val masses = en.map(_.getLong(1))
    assert(masses.sum >= 400L && masses.sum - masses.last < 400L)
  }

  test("bigramLmNll: docs under two tokens are excluded, single-pair doc scores") {
    import graft.text.TextFunctions
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val score = Seq((20L, "a"), (21L, ""), (22L, "a b")).toDF("doc_id", "text")
    val out = TextFunctions.bigramLmNll(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(22L) && out(22L) == 1L)
  }
}
