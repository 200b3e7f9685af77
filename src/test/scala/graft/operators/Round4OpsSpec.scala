package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.functions.VectorSumAgg.vector_sum
import graft.text.TextFunctions

/** Round-4 operators: vector_sum kernel, quantized k-means, repetition
  * signals, decontamination, BM25 retrieval.
  */
class Round4OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // ---- vector_sum ----

  test("vector_sum: exact elementwise sum with map-side partials") {
    val df = Seq(
      (0, Seq(1L, 2L, 3L)), (0, Seq(10L, 20L, 30L)), (1, Seq(-5L, 0L, 5L))
    ).toDF("g", "v").repartition(3)
    val r = df.groupBy($"g").agg(vector_sum($"v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(r(0) == Seq(11L, 22L, 33L))
    assert(r(1) == Seq(-5L, 0L, 5L))
  }

  test("vector_sum: null rows skipped, ragged input raises") {
    val withNull = Seq((0, Some(Seq(1L, 2L))), (0, None), (0, Some(Seq(3L, 4L))))
      .toDF("g", "v")
    val r = withNull.groupBy($"g").agg(vector_sum($"v").as("s"))
      .collect().head.getSeq[Long](1)
    assert(r == Seq(4L, 6L))
    val ragged = Seq((0, Seq(1L, 2L)), (0, Seq(1L, 2L, 3L))).toDF("g", "v")
    val e = intercept[Exception] {
      ragged.groupBy($"g").agg(vector_sum($"v")).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
    // A dim-0 vector would alias the uninitialized buffer and silently
    // drop out of the group — it must raise like other ragged input.
    val empty = Seq((0, Seq.empty[Long]), (0, Seq(1L, 2L))).toDF("g", "v")
    val e2 = intercept[Exception] {
      empty.groupBy($"g").agg(vector_sum($"v")).collect()
    }
    val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString("; ")
    assert(msgs2.contains("empty"), s"unexpected: $msgs2")
  }

  // ---- quantize kernel ----

  test("quantize_micros kernel == round(x*1e6) transform formula") {
    val tricky = Seq(
      (1L, Seq(0.1234565, -0.1234565, 0.9999995, -0.9999995, 1.5e-7, -1.5e-7)),
      (2L, Seq(0.0, -0.0, 123.456789, -123.456789, 4.9999994e-7, 5.0000004e-7))
    ).toDF("id", "v")
    val viaKernel = tricky.select($"id",
      graft.functions.QuantizeMicros.quantize_micros($"v".cast("array<double>")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaFormula = tricky.select($"id",
      transform($"v".cast("array<double>"), x => round(x * lit(1e6), 0).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaKernel == viaFormula)
    // exact-half lattice points round away from zero
    assert(graft.functions.QuantizeMicros.roundMicros(2.5e-6) == 3L)
    assert(graft.functions.QuantizeMicros.roundMicros(-2.5e-6) == -3L)
  }

  // ---- k-means ----

  private def clusteredPoints = {
    // Two tight planted clusters around (1,0) and (0,1) + the two seed
    // points (ids 0,1) that become the initial centroids.
    val around = (2L to 21L).map { i =>
      if (i % 2 == 0) (i, Seq(1.0f + (i % 5) * 0.001f, (i % 7) * 0.001f))
      else (i, Seq((i % 5) * 0.001f, 1.0f + (i % 7) * 0.001f))
    }
    (Seq((0L, Seq(0.9f, 0.1f)), (1L, Seq(0.1f, 0.9f))) ++ around)
      .toDF("id", "vec")
  }

  test("kmeans: planted clusters recovered, assignment deterministic") {
    val asg = KMeans.fitAssign(clusteredPoints, "id", "vec", k = 2, nIter = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // Every even id (cluster around (1,0)) with the (0.9,0.1) seed; odds opposite.
    assert(asg(0L) == 0 && asg(1L) == 1)
    (2L to 21L).foreach { i =>
      assert(asg(i) == (if (i % 2 == 0) 0 else 1), s"id $i in cell ${asg(i)}")
    }
    // Deterministic under repartitioning
    val asg2 = KMeans.fitAssign(clusteredPoints.repartition(7), "id", "vec", k = 2, nIter = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg == asg2)
  }

  test("kmeans: centroids converge to quantized cluster means; empty cells persist") {
    val cs = KMeans.fitCentroids(clusteredPoints, "id", "vec", k = 2, nIter = 3)
    // Cell 0 holds ids {0} ∪ evens, cell 1 ids {1} ∪ odds: verify centroid =
    // floorDiv(sum of micro-quantized members) computed by hand.
    val pts = clusteredPoints.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
      .toMap
    val members0 = pts.filter { case (id, _) => id == 0L || (id >= 2 && id % 2 == 0) }.values
    val exp0 = Array(0, 1).map(d => Math.floorDiv(members0.map(_(d)).sum, members0.size.toLong))
    assert(cs(0).sameElements(exp0))
    // Empty-cell carryover: two coincident points + one far point, k=3.
    // Cell 1 (init = the duplicate of id 0) loses its only member to cell 0
    // (equidistant -> smaller cell wins) and must KEEP its init centroid.
    val cs3 = KMeans.fitCentroids(
      Seq((0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)), (2L, Seq(100f, 100f))).toDF("id", "vec"),
      "id", "vec", k = 3, nIter = 2)
    assert(cs3.length == 3)
    assert(cs3(0).sameElements(Array(0L, 0L)))
    assert(cs3(1).sameElements(Array(0L, 0L))) // empty cell: init carried over
    assert(cs3(2).sameElements(Array(100000000L, 100000000L)))
  }

  // ---- repetition signals ----

  test("repetitionSignals: hand-computed fractions, empty doc zeros") {
    val docs = Seq(
      (1L, "a a a b"),        // 4 toks, 2 distinct, top=3; bigrams: "a a" x2, "a b" -> top 2/3
      (2L, "x y z"),          // no repetition: dup 0, top 1/3; bigrams unique 1/2
      (3L, "")                // token-less
    ).toDF("doc_id", "text")
    val r = TextFunctions.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(r(1L) == ((0.5, 0.75, 0.666667)))
    assert(r(2L) == ((0.0, 0.333333, 0.5)))
    assert(r(3L) == ((0.0, 0.0, 0.0)))
    assert(r.size == 3)
  }

  // ---- decontamination ----

  test("decontaminate: flags only docs sharing >= 1 n-gram with held-out") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // shares 3-grams with test doc 10
      (2L, "one two three four five six"),           // disjoint
      (10L, "alpha beta gamma delta other tail")     // the held-out doc itself
    ).toDF("doc_id", "text")
    val heldOut = corpus.filter($"doc_id" === 10L)
    val r = Dedup.decontaminate(corpus, heldOut, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "alpha beta gamma" and "beta gamma delta" (2 distinct 3-grams)
    assert(r == Map(1L -> 2L))
  }

  // ---- BM25 ----

  test("bm25TopK: self-retrieval ranks first; scores match hand formula") {
    val docs = Seq(
      (1L, "spark query engine"),
      (2L, "spark spark spark"),
      (3L, "unrelated totally different words here"),
      (4L, "query engine fast")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, docs.filter($"doc_id" === 1L), "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.length == 3)
    // Query = doc 1's terms {spark, query, engine}: doc 1 matches all three -> rank 1.
    assert(out.head._2 == 1L && out.head._4 == 1L)
    // Hand-compute doc 2's score: term 'spark' tf=3, df=2, N=4, dl=3, sdl=14.
    val n = 4.0; val df = 2.0; val tf = 3.0; val dl = 3.0; val sdl = 14.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val exp2 = BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * n / sdl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got2 = out.find(_._2 == 2L).map(_._3)
    assert(got2.contains(exp2), s"expected $exp2 got $got2")
  }
}
