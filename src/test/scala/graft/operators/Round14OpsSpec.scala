package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class Round14OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("filtered ivfPqTopK: neighbors satisfy the predicate; post-filtering " +
      "the unfiltered top-k is a DIFFERENT (deficient) result") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    val labels = e.select($"vec_id", $"label").as[(Long, Int)].collect().toMap

    val unfiltered = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, m = 4, kCent = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val filtered = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, m = 4, kCent = 8,
        indexFilter = Some($"label" % 2 === 0), metaCols = Seq("label"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()

    // Every filtered neighbor satisfies the predicate.
    filtered.foreach { case (qid, nid) =>
      assert(labels(nid) % 2 == 0,
        s"query $qid returned odd-label neighbor $nid (label ${labels(nid)})")
    }
    // Filter-then-rank fills all k slots from survivors (the corpus has
    // ~250 even-label vectors; 2 probed cells hold plenty).
    val perQuery = filtered.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perQuery.values.forall(_ == 5),
      s"filtered search must return k=5 survivors per query: $perQuery")

    // Post-filtering the unfiltered ranked top-5 leaves holes wherever an
    // odd-label vector held a slot — the semantics gap the index-side
    // predicate exists to close. With ~half the corpus odd-labeled, at
    // least one of the 4 queries' top-5 must contain an odd label.
    val post = unfiltered.filter { case (_, nid) => labels(nid) % 2 == 0 }
    assert(post.length < unfiltered.length,
      "expected at least one odd-label neighbor in the unfiltered top-5 " +
        "(data drift? predicate no longer discriminates)")
    assert(post.toSet != filtered.toSet,
      "post-filtered unfiltered top-k must DIFFER from filter-then-rank")
    // Monotonicity: removing competitors only improves a survivor's rank,
    // so every unfiltered-top-5 survivor that passes the predicate must
    // still be in the filtered top-5.
    assert(post.toSet.subsetOf(filtered.toSet),
      "unfiltered top-k survivors must be contained in the filtered top-k")
  }

  test("filtered ivfPqTopK: all-pass predicate equals the unfiltered search") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    val base = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, m = 4, kCent = 8)
      .collect().map(_.toString).sorted.toSeq
    val allPass = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, m = 4, kCent = 8,
        indexFilter = Some($"label" >= Int.MinValue), metaCols = Seq("label"))
      .collect().map(_.toString).sorted.toSeq
    assert(allPass === base)
  }

  test("ivfPqIndex metaCols: payload rides the artifact; codes unchanged") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val (bare, _, _) = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    val (withMeta, _, _) = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8, metaCols = Seq("label"))
    assert(withMeta.columns.toSeq === Seq("id", "cell", "codes", "label"))
    val a = bare.select("id", "cell", "codes")
      .collect().map(_.toString).sorted.toSeq
    val b = withMeta.select("id", "cell", "codes")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b, "carrying payload columns must not perturb the encode")
  }

  test("htmlToText: '>' inside a quoted attribute does not terminate the tag") {
    import graft.text.TextFunctions._
    val cases = Seq(
      // Quoted '>' in href: the whole tag must strip, nothing leaks.
      (1L, "<p class=\"x\">keep <a href=\"/x?a>b\">link</a> tail</p>"),
      // Quoted '>' in the ANCHOR open tag: link-density arithmetic must
      // still see exactly the anchor text (an all-links line drops).
      (2L, "<div><a href=\"/p?a>b\">Home</a> <a href=\"/q?c>d\">About</a></div>"),
      // Script open tag with a quoted '>' still drops its whole block.
      (3L, "<script type=\"a>b\">var x = 1;</script>after script"),
      // UNPAIRED quote in a tag: tag unmatched, survives as text — the
      // documented degenerate (bounded to its line by the line split).
      (4L, "<p title=\"oops>broken tag line\nclean next line"),
      // Unquoted apostrophe stays plain-char: the tag still strips.
      (5L, "<p title=don't>apostrophe attr text</p>"))
    val out = cases.toDF("id", "h")
      .select($"id", htmlToText($"h").as("t"), htmlKeptLines($"h").as("k"),
        htmlDroppedLines($"h").as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("keep link tail", 1L, 0L)))
    assert(out(2L) == (("", 0L, 1L)), "all-links line must drop by density")
    assert(out(3L) == (("after script", 1L, 0L)))
    assert(out(4L) == (("<p title=\"oops>broken tag line clean next line", 2L, 0L)))
    assert(out(5L) == (("apostrophe attr text", 1L, 0L)))
  }

  test("exactSubstringSpans: invariant under AQE skew-split thresholds") {
    // The classify join's skew remedy at production scale is Spark's own
    // AQE skew split (ScaleBench substring-skew demonstrates it engaging
    // once partitions cross the size thresholds); this pins that the
    // operator's results cannot move under those thresholds — the split
    // is a pure execution-strategy choice. Corpus mixes cross-doc spans,
    // within-doc repeats and shared boilerplate.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tail one"),
      (2L, "intro words the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog and more padding here"),
      (4L, "all rights reserved all rights reserved all rights reserved"),
      (5L, "completely unique content with no duplicated window at all"),
      (6L, "all rights reserved plus trailing unique material here now")
    ).toDF("doc_id", "text")
    def run() = Dedup.exactSubstringSpans(docs, "doc_id", "text", n = 3)
      .collect().map(_.toString).sorted.toSeq
    val plain = run()
    assert(plain.nonEmpty)
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try assert(run() === plain)
    finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("ivfPqEncode rejects metaCols colliding with index schema names") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqIndex(e.withColumnRenamed("label", "cell"),
        "vec_id", "embedding", nCells = 4, m = 4, kCent = 8,
        metaCols = Seq("cell"))
    }
    assert(ex.getMessage.contains("collide"))
  }
}
