package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.multimodal.Multimodal

class Round11OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  test("mp4 box walk recovers the synthesized mvhd fields exactly") {
    (0L to 50L).foreach { id =>
      val parsed = Multimodal.parseMp4(Multimodal.synthesizeMp4(id))
      val ts = 600L + (id % 10) * 100
      val dur = (id * 37) % 100000 + 600
      assert(parsed.contains(("isom", 3L, ts, dur)), s"id=$id got $parsed")
    }
  }

  test("mp4 parse handles the v1 mvhd layout (64-bit duration)") {
    // Hand-build ftyp + moov>mvhd v1: 8+4 version/flags, 8+8 creation/
    // modification, 4 timescale, 8 duration, then rate onward as v0.
    val ts = 48000
    val dur = 5000000000L // > 2^32: only representable in the v1 layout
    val mvhdBody = 4 + 8 + 8 + 4 + 8 + 4 + 2 + 10 + 36 + 24 + 4
    val buf = java.nio.ByteBuffer.allocate(16 + 8 + 8 + mvhdBody)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("avc1".getBytes("US-ASCII")).putInt(0)
    buf.putInt(8 + 8 + mvhdBody).put("moov".getBytes("US-ASCII"))
    buf.putInt(8 + mvhdBody).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000) // version 1
      .putLong(0L).putLong(0L)
      .putInt(ts).putLong(dur)
      .putInt(0x00010000).putShort(0x0100.toShort)
      .put(new Array[Byte](10 + 36 + 24)).putInt(2)
    assert(Multimodal.parseMp4(buf.array())
      .contains(("avc1", 2L, ts.toLong, dur)))
  }

  test("corpusMinhash: whole-corpus signature == per-position least of split signatures") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma zeta eta"),
      (4L, "seven eight nine ten eleven")).toDF("doc_id", "text")
    def sig(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.corpusMinhash(df, "text", n = 3, k = 8)
        .as[(Long, Long)].collect().toMap
    val whole = sig(docs)
    val a = sig(docs.filter(col("doc_id") <= 2))
    val b = sig(docs.filter(col("doc_id") > 2))
    assert(whole.keySet == (0L until 8L).toSet)
    (0L until 8L).foreach { p =>
      assert(whole(p) == math.min(a(p), b(p)), s"merge law broken at pos $p")
    }
    // Any 3-way split folds to the same signature (associativity).
    val c = Seq(sig(docs.filter(col("doc_id") === 1L)),
      sig(docs.filter(col("doc_id") === 2L || col("doc_id") === 3L)),
      sig(docs.filter(col("doc_id") === 4L)))
    (0L until 8L).foreach { p =>
      assert(whole(p) == c.map(_(p)).min)
    }
  }

  test("semanticDedup keeps zero-magnitude embeddings (no NaN cosine)") {
    // A zero vector's cosine is 0/0 = NaN; engines disagree on NaN
    // ordering (Spark treats `NaN >= t` as false, DuckDB sorts NaN high),
    // so the pair join guards nrm > 0 on both sides: a zero vector can
    // never be removed nor remove anything, in either engine.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), // exact dups: 2 removed
      (3L, Seq(0.0f, 0.0f)),                        // zero vector
      (4L, Seq(0.0f, 0.0f))                         // second zero vector
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 1, threshold = 0.99)
      .select(col("vec_id"), col("keep")).as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("csv round trip survives embedded newlines and preserves empty vs NULL") {
    val dir = java.nio.file.Files.createTempDirectory("b07spec").toString
    val docs = Seq(
      (1L, "line one\nline two\r\nthree"), // embedded newlines
      (2L, ""),                            // empty string, not NULL
      (3L, null),                          // true NULL
      (4L, "quotes \" and, commas")
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").option("header", "true")
      .option("nullValue", "\\N").csv(dir)
    val back = spark.read.schema(docs.schema).option("header", "true")
      .option("multiLine", "true")
      .option("nullValue", "\\N").csv(dir)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back(1L).contains("line one\nline two\r\nthree"))
    assert(back(2L).contains(""), s"empty string became ${back(2L)}")
    assert(back(3L).isEmpty, "NULL must stay NULL")
    assert(back(4L).contains("quotes \" and, commas"))
  }

  test("streaming token budget: NULL text contributes 0 tokens") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, String)]
    val out = graft.streaming.Streams.streamingTokenBudget(
      input.toDF().toDF("doc_id", "cat", "text"), "doc_id", "cat", "text",
      budget = 5L)
    val q = out.writeStream.format("memory").queryName("budget_null_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "x", "one two three"), (2L, "x", null),
        (3L, "x", "four five"))
      q.processAllAvailable()
      val rows = spark.table("budget_null_out")
        .select("doc_id", "toks", "cum").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      // doc 1: 3 toks (cum 3); doc 2: NULL text -> 0 toks, admitted at
      // cum 3 (NOT -1, which would admit doc 3 at cum 2); doc 3: 2 toks
      // lands exactly at the budget edge cum 5.
      assert(rows == Seq((1L, 3L, 3L), (2L, 0L, 3L), (3L, 2L, 5L)), rows)
    } finally q.stop()
  }

  test("pqTopK recall@5 vs exact L2 on the sf0.001 embeddings") {
    // An approximate operator without a recall pin is unfalsifiable (the
    // annCosineTopK discipline). ADC approximates SQUARED L2 through m=4
    // codebook cells, so the baseline is the exact L2 top-5 (driver brute
    // force over the same micro lattice the operator quantizes to).
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x * 1e6).toDouble).toArray)
    val qs = vecs.filter(_._1 <= 3L)
    val exact = qs.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid).map { case (id, v) =>
        val d2 = v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        (qid, id, d2)
      }.sortBy(t => (t._3, t._2)).take(5).map(t => (qid, t._2))
    }.toSet
    // The shortlist's job is CONTAINMENT: ADC@50 must hold most of the
    // exact top-5 even though raw ADC@5 ordering is weak on these
    // near-random vectors (measured 0.20).
    val short = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 50,
        m = 8, kCent = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val containment = (short intersect exact).size.toDouble / exact.size
    assert(containment >= 0.8,
      s"ADC@50 containment of exact top-5 = $containment")
    // ...and the exact rerank turns containment into recall.
    val rr = Similarity.pqTopKReranked(e, q, "vec_id", "embedding", k = 5,
        m = 8, kCent = 16, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (rr intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"PQ+rerank recall@5 = $recall (hits=${(rr intersect exact).size}/${exact.size})")
  }

  test("png chunk walk recovers IHDR from real encoder output; malformed rejected") {
    val png = Multimodal.synthesizeGrayPng(5L, 48, 20)
    assert(Multimodal.parsePngIhdr(png).contains((48L, 20L, 8L, 0L)))
    assert(Multimodal.parsePngIhdr(null).isEmpty)
    assert(Multimodal.parsePngIhdr("clearly not a png at all, no sig".getBytes).isEmpty)
    assert(Multimodal.parsePngIhdr(png.take(30)).isEmpty)  // truncated IHDR frame
    val corrupted = png.clone(); corrupted(0) = 0x42       // broken signature
    assert(Multimodal.parsePngIhdr(corrupted).isEmpty)
    // A WAV is a valid RIFF container but not a PNG.
    assert(Multimodal.parsePngIhdr(Multimodal.synthesizeWav(1L, 64)).isEmpty)
  }

  test("mp4 parse rejects a body-less ftyp box instead of reading past it") {
    // [moov with valid mvhd][8-byte box typed 'ftyp' at the buffer end]:
    // the brand bytes would be past the array — must be None, not a throw.
    val good = Multimodal.synthesizeMp4(3L)
    val moov = good.slice(16, 16 + 116)
    val buf = java.nio.ByteBuffer.allocate(116 + 8)
    buf.put(moov).putInt(8).put("ftyp".getBytes("US-ASCII"))
    assert(Multimodal.parseMp4(buf.array()).isEmpty)
  }

  test("mp4 parse yields None on malformed containers, NULL rows downstream") {
    assert(Multimodal.parseMp4(null).isEmpty)
    assert(Multimodal.parseMp4(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseMp4("not an mp4 at all".getBytes).isEmpty)
    // Truncated mid-box: valid ftyp, then a moov whose declared size
    // overruns the payload.
    val good = Multimodal.synthesizeMp4(7L)
    assert(Multimodal.parseMp4(good.take(40)).isEmpty)
    // No moov at all.
    assert(Multimodal.parseMp4(good.take(16)).isEmpty)

    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "garbage".getBytes, Row("video/mp4", 7L, "x")),
        Row(2L, null, Row("video/mp4", 0L, null)))),
      Multimodal.mediaSchema)
    val out = Multimodal.extractMp4Meta(junk).collect()
      .map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }
}
