package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.text.TextFunctions

class Round9OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // ---- bpeTrainMerges (t12) ----

  test("bpeTrainMerges: hand-checkable corpus, greedy left-to-right merges") {
    // Corpus: "low low low lower" -> word histogram {low:3, lower:1}.
    // Round 1 pairs: (l,o) 4, (o,w) 4, (w,e) 1, (e,r) 1. Tie at 4 between
    // "<l><o>" and "<o><w>"; lexicographic ascending picks "<l><o>".
    // Round 2: sequences are <lo><w>, <lo><w><e><r>: (lo,w) 4 wins.
    // Round 3: <low>, <low><e><r>: (low,e) 1, (e,r) 1 -> "<e><r>" wins
    // lexicographically ("<e><r>" < "<low><e>").
    val docs = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val m = TextFunctions.bpeTrainMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq((1L, "l o", 4L), (2L, "lo w", 4L), (3L, "e r", 1L)))
  }

  test("bpeTrainMerges: overlap is non-overlapping left-to-right (aaa -> [aa,a])") {
    // "aaaa aaa": round 1 pairs: aaaa has 3 (a,a), aaa has 2 -> freq 5.
    // Greedy application: aaaa -> <aa><aa>, aaa -> <aa><a>. Round 2 pairs:
    // (aa,aa) 1, (aa,a) 1 -> "<aa><a>" < "<aa><aa>" lexicographically
    // (prefix rule), so (aa,a) wins at freq 1.
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val m = TextFunctions.bpeTrainMerges(docs, "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq((1L, "a a", 5L), (2L, "aa a", 1L)))
  }

  test("bpeTrainMerges: exhaustion stops early, single-char words produce no pairs") {
    // Every word is one char: zero pairs anywhere -> zero merge rounds.
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(TextFunctions.bpeTrainMerges(docs, "text", rounds = 5).count() == 0L)
    // Two-char vocab exhausts after one merge: "ab ab" -> <ab> only, no
    // pairs remain, so rounds=5 yields exactly 1 row.
    val docs2 = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m2 = TextFunctions.bpeTrainMerges(docs2, "text", rounds = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m2 == Seq((1L, "a b", 2L)))
  }

  test("bpeSegmentStats: replays merges in training order, drops token-free docs") {
    // Training on "low low low lower" (see the t12 spec) yields merges
    // (l,o), (lo,w), (e,r). Applied: "low" -> <low> = 1 token, "lower" ->
    // <low><er> = 2 tokens. Doc totals: chars 3*3+5 = 14, bpe_len 5.
    // The punctuation-only doc has no alphanumeric tokens -> dropped.
    val docs = Seq((1L, "low low low lower"), (2L, ",,, !!!"))
      .toDF("doc_id", "text")
    val out = TextFunctions.bpeSegmentStats(docs, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 14L, 5L)))
  }

  // ---- perceptualHash (m07) ----

  test("perceptualHash: invariant under lossless re-encode, ids mod 256 collide") {
    import graft.multimodal.Multimodal
    val ids = spark.range(0, 520, 8).toDF("id") // includes id, id+256 pairs
    val media = Multimodal.synthesizePngMedia(ids, "id", w = 32, h = 24)
    val direct = Multimodal.perceptualHash(media)
    // Same-size "resize" round-trips through a SECOND encode+decode; aHash
    // must be bit-identical (PNG is lossless) — the re-encode-invariance
    // that makes the hash a dedup key across storage generations.
    val reenc = Multimodal.perceptualHash(Multimodal.resizeImages(media, 32, 24))
    assert(direct.exceptAll(reenc).isEmpty && reenc.exceptAll(direct).isEmpty)
    val hashes = direct.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes.values.forall(h => h != null && h.length == 64 &&
      h.forall(c => c == '0' || c == '1')))
    // Synthesis repeats every 256 ids: (8, 264), (16, 272) must collide.
    assert(hashes(8L) == hashes(264L) && hashes(16L) == hashes(272L))
    // And images from different mod-256 classes are not ALL identical.
    assert(hashes.values.toSet.size > 1)
  }

  // ---- KTruss (g19) ----

  test("kTruss: peeling cascades — removing support-1 edges starves the shared edge") {
    import graft.algorithms.KTruss
    // Two triangles sharing edge 2-3: that edge has support 2 (common
    // neighbors 1 and 4), all others support 1. k=4 demands support >= 2.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    // One round: only the shared edge survives, with its PRE-peel support.
    val r1 = KTruss.run(edges, k = 4, maxRounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r1 == Seq((2L, 3L, 2L)))
    // Two rounds: the survivors' triangles are gone, so the cascade
    // empties the graph — the fixpoint a support-once computation misses.
    assert(KTruss.run(edges, k = 4, maxRounds = 2).count() == 0L)
    // k=3 (support >= 1): both triangles are intact trusses; direction and
    // duplicate edges must not matter (canonical simple graph).
    val noisy = edges.unionAll(Seq((2L, 1L), (3L, 2L)).toDF("src", "dst"))
    assert(KTruss.run(noisy, k = 3, maxRounds = 3).count() == 5L)
  }

  // ---- tfIdfTopK (t15) ----

  test("tfIdfTopK: hand-computed smooth-idf micro-lattice scores") {
    // N=2. df: apple 1, banana 2, cherry 1. idf: ln(3/2)+1 for the
    // singletons, ln(3/3)+1 = 1 for banana.
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val out = TextFunctions.tfIdfTopK(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val idf1 = math.log(3.0 / 2.0) + 1.0
    assert(out == Set(
      (1L, "apple", math.floor(2.0 * idf1 * 1e6).toLong, 1L),
      (1L, "banana", 1000000L, 2L),
      (2L, "cherry", math.floor(1.0 * idf1 * 1e6).toLong, 1L),
      (2L, "banana", 1000000L, 2L)))
  }

  // ---- hllGroupedRegisters / hllGroupedEstimate (q17) ----

  test("grouped HLL: each group's register table equals the global sketch of its slice") {
    val rows = (1L to 3000L).map(i => (s"g${i % 3}", i % 700)).toDF("grp", "k")
    val grouped = Sketches.hllGroupedRegisters(rows, "grp", "k", p = 6)
    for (g <- Seq("g0", "g1", "g2")) {
      val slice = Sketches.hllRegisters(rows.filter($"grp" === g), "k", p = 6)
      val mine = grouped.filter($"grp" === g).select("register", "max_rank")
      assert(mine.exceptAll(slice).isEmpty && slice.exceptAll(mine).isEmpty,
        s"group $g registers diverge from the single-group sketch")
    }
    // Estimates land near truth (p=6 => ~13% typical error; be generous).
    val est = Sketches.hllGroupedEstimate(grouped, "grp", p = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // Keys are i % 700 split by i % 3: each group sees ~233 distinct keys
    // plus wraparound overlap; compute truth directly.
    val truth = (1L to 3000L).map(i => (s"g${i % 3}", i % 700)).distinct
      .groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    for ((g, t) <- truth)
      assert(math.abs(est(g) - t) / t < 0.35, s"$g: est=${est(g)} truth=$t")
  }

  // ---- compositeQualityFilter (t14) ----

  test("compositeQualityFilter: each rule sets its own bit") {
    // doc 1: healthy English prose -> mask 0, keep 1.
    // doc 2: two tokens -> bit 0 (count) — long enough text for quality.
    // doc 3: repeated token -> bit 3 (dup) + bit 4 (top bigram).
    // doc 4: all 1-char tokens -> bit 1 (mean len) fires alongside others.
    // Distinct content words (zero dup tokens) + one stopword run for the
    // stopword-ratio credit; long enough for the length credit.
    val healthy = (0 until 100).map(i => s"word$i").mkString(" ") +
      " the of and to in is it that for a"
    val docs = Seq(
      (1L, healthy),
      (2L, "the cat " + "x" * 420),
      (3L, ("spam " * 40) + "the of and to in is it that for a"),
      (4L, ("a b c d e f g h i j " * 3) + "the of and to in is it that for")
    ).toDF("doc_id", "text")
    val out = TextFunctions.compositeQualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((0L, 1L)), s"healthy doc: ${out(1L)}")
    assert((out(2L)._1 & 1L) == 1L && out(2L)._2 == 0L, s"count bit: ${out(2L)}")
    assert((out(3L)._1 & 8L) == 8L && out(3L)._2 == 0L, s"dup bit: ${out(3L)}")
    assert((out(4L)._1 & 2L) == 2L && out(4L)._2 == 0L, s"mean-len bit: ${out(4L)}")
  }

  // ---- temperatureMixtureWeights (p06) ----

  test("temperatureMixtureWeights: sqrt lattice upweights small categories") {
    // n = {4, 9}: micro-weights 2e6/3e6, shares 0.4/0.6 — the small
    // category holds 4/13 of the docs but 40% of the sampling mass.
    val docs = (Seq.fill(4)("small") ++ Seq.fill(9)("big")).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("doc_id", "cat")
    val out = Sampling.temperatureMixtureWeights(docs, "cat")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("small") == ((4L, 2000000L, 0.4)))
    assert(out("big") == ((9L, 3000000L, 0.6)))
  }

  // ---- maxSimTopK (s07) ----

  test("maxSimTopK: group score is the max member cosine, self excluded") {
    import graft.operators.Similarity
    // Group 0: {q itself, an orthogonal vector}; group 1: {a near-parallel
    // vector}. Without self-exclusion group 0 would win at cosine 1.0;
    // with it, group 1's 0.8-ish member must rank first.
    val vecs = Seq(
      (0L, 0L, Array(1.0f, 0.0f)),  // the query
      (1L, 0L, Array(0.0f, 1.0f)),  // orthogonal, same group
      (2L, 1L, Array(0.8f, 0.6f)))  // cos = 0.8, other group
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.maxSimTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq.sortBy(_._3)
    assert(out == Seq((1L, 0.8, 1L), (0L, 0.0, 2L)))
  }

  test("bpeTrainMerges: weighting is by word frequency, not document count") {
    // "xy" appears 3x in one doc, "zq" once each in two docs: (x,y) freq 3
    // beats (z,q) freq 2 even though "zq" touches more documents.
    val docs = Seq((1L, "xy xy xy"), (2L, "zq"), (3L, "zq")).toDF("doc_id", "text")
    val m = TextFunctions.bpeTrainMerges(docs, "text", rounds = 1)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq(("x y", 3L)))
  }
}
