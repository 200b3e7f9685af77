package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.multimodal.Multimodal

class Round13OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // Driver-side replay of the m14 synthesis formula: frame i of id is a
  // 16x12 gray PNG with pixel(x,y) = (7x + 13y + id + 31 i) mod 256.
  private def frameHist(id: Long, i: Int): Seq[Double] = {
    val h = new Array[Double](16)
    for (y <- 0 until 12; x <- 0 until 16)
      h((java.lang.Math.floorMod(7L * x + 13L * y + id + 31L * i, 256L) / 16L).toInt) += 1.0
    h.map(_ / 192.0).toSeq
  }

  private def mediaOf(id: Long, bytes: Array[Byte]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(id, bytes, Row("video/mp4", bytes.length.toLong, "x")))),
      Multimodal.mediaSchema)

  test("decodeMp4Frames: container walk + pread + imageio recover the pixel formula") {
    (0L to 20L).foreach { id =>
      val n = ((id % 3) + 2).toInt
      val out = Multimodal.decodeMp4Frames(mediaOf(id, Multimodal.synthesizeMp4Png(id)))
        .collect().sortBy(_.getLong(2))
      assert(out.length == n, s"id=$id")
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == i && r.getLong(3) == 16L && r.getLong(4) == 12L)
        assert(r.getSeq[Double](5) == frameHist(id, i), s"id=$id frame=$i")
      }
    }
  }

  test("decodeMp4Frames: a corrupted sample degrades only its own frame") {
    val id = 7L
    val mp4 = Multimodal.synthesizeMp4Png(id)
    // Locate the mdat payload (fourCC scan — the spec must not share the
    // synthesizer's private offset math) and wreck sample 0's PNG
    // signature in place: the sample RANGE is still honest, so the walk
    // and pread succeed; only the decode of that one frame fails.
    val idx = mp4.sliding(4).indexWhere(_.sameElements("mdat".getBytes))
    assert(idx > 0)
    (0 until 8).foreach(k => mp4(idx + 4 + k) = 0x00)
    val out = Multimodal.decodeMp4Frames(mediaOf(id, mp4))
      .collect().sortBy(_.getLong(2))
    assert(out.length == ((id % 3) + 2).toInt)
    assert(out.head.getLong(2) == 0L && out.head.isNullAt(3) &&
      out.head.isNullAt(4) && out.head.isNullAt(5))
    out.tail.zipWithIndex.foreach { case (r, k) =>
      assert(r.getLong(3) == 16L && r.getSeq[Double](5) == frameHist(id, k + 1))
    }
    // Unparseable container: ONE all-NULL row (the m12 discipline).
    val junk = Multimodal.decodeMp4Frames(mediaOf(9L, "not an mp4".getBytes)).collect()
    assert(junk.length == 1 && junk.head.isNullAt(1) && junk.head.isNullAt(5))
  }

  test("extractFeatures video/mp4 runs the real frame decode, not the byte stub") {
    val ids = Seq(1L, 5L, 12L).toDF("doc_id")
    val media = Multimodal.synthesizeMp4PngMedia(ids, "doc_id")
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Seq(1L, 5L, 12L).foreach { id =>
      val n = ((id % 3) + 2).toInt
      // Frames aggregate by pixel count; all frames are 192 px, so the
      // whole-file histogram is the mean of the per-frame histograms.
      val expected = (0 until n).map(frameHist(id, _))
        .transpose.map(_.sum / n)
      val got = feats(id)
      assert(got.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"id=$id")
      // ...and it differs from the raw-byte stub histogram (deflate bytes
      // look nothing like the pixel distribution) — the stub is retired.
      val raw = Multimodal.synthesizeMp4Png(id)
      val byteHist = new Array[Double](16)
      raw.foreach(b => byteHist((b & 0xff) / 16) += 1.0 / raw.length)
      assert(got != byteHist.toSeq)
    }
    // No decodable frame -> zero vector: the codec-less filler-mdat
    // container (m09's shape) and plain garbage both degrade per row.
    val filler = Multimodal.synthesizeMp4(3L)
    val z = Multimodal.extractFeatures(
      mediaOf(3L, filler).unionByName(mediaOf(4L, "garbage".getBytes))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(z(3L).forall(_ == 0.0) && z(4L).forall(_ == 0.0))
  }

  test("extractMp4Samples streams a many-tiny-samples track (iterator discipline)") {
    // 50k one-byte samples in one chunk: the sample walk must stream —
    // correctness here pins that the lazy generator visits every sample
    // exactly once, in order, with the right placement. Offsets are
    // discovered by scan (build once with a dummy stco, locate mdat,
    // rebuild) so the spec shares no private offset math.
    val n = 50000
    val sizes = Array.fill(n)(1)
    val mdat = Array.tabulate(n)(i => (i % 251).toByte)
    val dummy = Multimodal.buildMp4(2L, Some((sizes, Array(0))), mdat)
    val off = dummy.sliding(4).indexWhere(_.sameElements("mdat".getBytes)) + 4
    val mp4 = Multimodal.buildMp4(2L, Some((sizes, Array(off))), mdat)
    val out = Multimodal.extractMp4Samples(mediaOf(2L, mp4))
      .agg(count(lit(1)).as("n"), sum($"byte_sum").as("s"),
        sum($"sample" * $"byte_sum").as("w")).as[(Long, Long, Long)].collect().head
    val expected = (n.toLong,
      (0 until n).map(i => (i % 251).toLong).sum,
      (0 until n).map(i => i.toLong * (i % 251)).sum)
    assert(out == expected)
  }

  test("exactSubstringSpans catches the unaligned duplicate d10 misses") {
    // doc 1 is the source; doc 2 embeds the SAME 8-token span at an
    // arbitrary character offset (no chunk alignment). d10's fixed
    // 512-char chunks hash the copy differently in each doc, so BOTH
    // docs keep every chunk; d18's overlapping 5-gram anchors mark the
    // copied span in doc 2 regardless of where it starts.
    val span = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"intro one two $span outro nine ten"),
      (2L, s"zz $span trailing words here for padding and more")
    ).toDF("doc_id", "text")

    // d10 (aligned chunks) sees zero duplicate chunks: all rows survive.
    val d10 = Dedup.firstOccurrenceChunks(docs, "doc_id", "text",
      chunkChars = 512, overlapChars = 64)
    assert(d10.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap.values.forall(_ >= 1))
    assert(d10.count() == docs.count(), "each doc is one <512-char chunk, none deduped")

    val spans = Dedup.exactSubstringSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2))
    // doc 1: first occurrence — one full span of its 14 tokens.
    assert(spans.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, 13L, 14L)))
    // doc 2 tokens: zz(0) alpha..hotel(1..8) trailing(9) ... more(15).
    // Duplicate anchors cover tokens 1..8; kept = [0,0] and [9,15].
    assert(spans.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, 0L, 0L, 1L), (2L, 1L, 9L, 15L, 7L)))
  }

  test("exactSubstringSpans: fully-duplicated doc removed, dup-free doc kept whole") {
    val docs = Seq(
      (10L, "one two three four five six"),
      (11L, "one two three four five six"), // exact clone -> zero kept rows
      (12L, "totally unrelated words in this document"),
      (13L, "") // token-less -> no rows
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(spans.count(_._1 == 11L) == 0, "clone fully removed")
    assert(spans.count(_._1 == 13L) == 0, "empty doc emits nothing")
    assert(spans.filter(_._1 == 10L).toSeq == Seq((10L, 0L, 5L)))
    assert(spans.filter(_._1 == 12L).toSeq == Seq((12L, 0L, 5L)))
  }

  test("htmlToText: boilerplate dropped by link density, content and entities kept") {
    import graft.text.TextFunctions._
    val html =
      """<html><head><title>My Page</title>
        |<style>
        |p { color: red; }
        |</style>
        |<script>
        |var x = 1; if (x < 2) { x = 3; }
        |</script>
        |</head><body>
        |<!-- nav comment
        |spans two lines -->
        |<div><a href="/a">Home</a> | <a href="/b">About</a> | <a href="/c">Contact</a></div>
        |<p>Real content with an M&amp;M &lt;brand&gt; mention.</p>
        |<div>See <a href="/next">the next page</a> for much longer surrounding article text.</div>
        |</body></html>""".stripMargin
    val out = Seq(html).toDF("h").select(
      htmlToText($"h").as("t"), htmlKeptLines($"h").as("k"),
      htmlDroppedLines($"h").as("d")).collect().head
    assert(out.getString(0) ==
      "My Page Real content with an M&M <brand> mention. " +
      "See the next page for much longer surrounding article text.")
    assert(out.getLong(1) == 3L, "title + content + low-density link line kept")
    assert(out.getLong(2) == 1L, "the all-links nav line dropped")
  }

  test("htmlToText: malformed markup degrades, never errors") {
    import graft.text.TextFunctions._
    val cases = Seq(
      // Unclosed script: block pattern can't match, tag stripped, body
      // survives as text — the documented degenerate behavior.
      (1L, "<script>var y = 9;\nreal text after unclosed script"),
      // Stray '<' with no '>': no tag match, the '<' survives as text.
      (2L, "before < after\nnext line stays"),
      // Unclosed anchor: no </a>, so no anchor text — line kept.
      (3L, "<div><a href=\"/x\">dangling link text and words</div>"),
      // Nested/a-in-comment: comment drop wins (applied first).
      (4L, "<!-- <a href=\"/x\">hidden</a> -->visible tail"),
      (5L, ""))
    val out = cases.toDF("id", "h")
      .select($"id", htmlToText($"h").as("t"), htmlKeptLines($"h").as("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("var y = 9; real text after unclosed script", 2L)))
    assert(out(2L) == (("before < after next line stays", 2L)))
    assert(out(3L) == (("dangling link text and words", 1L)))
    assert(out(4L) == (("visible tail", 1L)))
    assert(out(5L) == (("", 0L)))
  }

  test("htmlToText entity decode: &amp;lt; decodes once, not twice") {
    import graft.text.TextFunctions._
    val out = Seq("<p>literal &amp;lt; stays encoded-once</p>").toDF("h")
      .select(htmlToText($"h")).collect().head.getString(0)
    assert(out == "literal &lt; stays encoded-once")
  }

  test("ivfPqTopK rejects a ragged hand-built coarse quantizer") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" <= 1)
    val (codes, coarse, book) = graft.operators.Similarity.ivfPqIndex(
      e, "vec_id", "embedding", nCells = 2, m = 4, kCent = 4)
    val ragged = coarse.zipWithIndex.map { case (c, i) =>
      if (i == 1) c ++ Array(0L, 0L) else c }
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
        k = 3, nCells = 2, nProbe = 1, m = 4, kCent = 4,
        indexOf = Some((codes, ragged, book)))
    }
    assert(ex.getMessage.contains("ragged"))
  }
}
