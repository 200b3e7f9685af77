package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.functions.TextHashes
import graft.multimodal.Multimodal
import graft.text.TextFunctions

/** Unit specs for the training-data pipeline operators: dedup kernels +
  * operators, similarity search, text analysis, multimodal plumbing.
  */
class PipelineSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  private val nearDup = base.replace("tonight", "today") // 1-token edit
  private val other = "completely different content about spark query engines and distributed joins at scale"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, other), (4L, base), (5L, "tiny doc")
  ).toDF("doc_id", "text")

  // ---- text functions ----

  test("tokenCount and ngrams handle short docs") {
    val r = docs.select($"doc_id", TextFunctions.tokenCount($"text").as("c"),
      size(TextFunctions.tokenNgrams($"text", 3)).as("g"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(r(1L) == (17L, 15))
    assert(r(5L) == (2L, 0)) // shorter than n: no n-grams, no descending-sequence blowup
  }

  test("langId: stopword + CJK heuristics") {
    val r = Seq(
      (1L, "the cat is on the mat and it is warm"),
      (2L, "el gato es un animal que vive en la casa"),
      (3L, "der hund ist ein tier und das ist gut"),
      (4L, "le chat est dans les maisons et les rues"),
      (5L, "中文文本内容"),
      (6L, "zzz qqq xxx")
    ).toDF("id", "text").select($"id", TextFunctions.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh", 6L -> "und"))
  }

  test("qualityScore stays in [0,1]") {
    val vals = docs.select(TextFunctions.qualityScore($"text")).collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }

  // ---- hash kernels ----

  test("shingle_hashes kernel == composable lower/tokenize/ngram/xxhash formula") {
    val composable = docs.select($"doc_id",
      transform(array_distinct(TextFunctions.tokenNgrams($"text", 3)), g => xxhash64(g)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kernel = docs.select($"doc_id", TextFunctions.shingleHashes($"text", 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel == composable)
    // Mixed case, punctuation, unicode, short docs
    val tricky = Seq((1L, "Hello, WORLD! foo-bar baz42 qux"), (2L, "ab"), (3L, ""),
      (4L, "ONE two THREE four FIVE one TWO three")).toDF("doc_id", "text")
    val a = tricky.select($"doc_id",
      transform(array_distinct(TextFunctions.tokenNgrams($"text", 3)), g => xxhash64(g)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = tricky.select($"doc_id", TextFunctions.shingleHashes($"text", 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("minhash signature: deterministic, jaccard-correlated") {
    val sigs = docs.select($"doc_id",
      TextHashes.minhashSignature(TextFunctions.shingleHashes($"text", 3), 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L)) // identical docs -> identical signatures
    def est(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y } / 128.0
    assert(est(sigs(1L), sigs(2L)) > 0.6)  // near-dups agree on most slots
    assert(est(sigs(1L), sigs(3L)) < 0.2)  // unrelated docs do not
  }

  test("simhash: hamming distance tracks similarity") {
    val sh = docs.select($"doc_id",
      TextHashes.simhash64(TextFunctions.shingleHashes($"text", 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(4L)) == 0)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
  }

  test("cosine LSH bits: deterministic and angle-sensitive") {
    val v = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)), (2L, Array(1.0f, 0.01f, 0.5f, 0.2f)),
      (3L, Array(-1.0f, 0.3f, -0.5f, -0.2f))).toDF("id", "v")
    val bits = v.select($"id", TextHashes.cosineLshBits($"v", 16).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(bits(1L), bits(2L)) < ham(bits(1L), bits(3L)))
  }

  // ---- dedup operators ----

  test("exactDedup groups identical docs") {
    val r = Dedup.exactDedup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(r(1L) == 2L) // docs 1 and 4 identical, keep_id = 1
    assert(r.values.sum == 5L)
  }

  test("ngramJaccardPairs and minHashLsh agree and find the planted pair") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1L, 2L)) && exact.contains((1L, 4L)) && exact.contains((2L, 4L)))
    assert(!exact.exists(p => p._1 == 3L || p._2 == 3L))
    assert(lsh == exact) // full recall at this similarity level
  }

  test("nearDupClusters: transitive closure over LSH pairs, singletons kept") {
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 5) // every document is assigned a cluster
    assert(clusters(1L) == clusters(2L) && clusters(1L) == clusters(4L)) // near-dup chain
    assert(clusters(3L) == 3L && clusters(5L) == 5L) // singletons cluster to themselves
    assert(clusters(1L) == 1L) // cluster id = min member id
  }

  test("simHashPairs finds the planted near-dup") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", 3, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical -> hamming 0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("embeddingNearDupPairs on planted vectors") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  // ---- similarity search ----

  test("cosineTopK exact ranking") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.5f, 0.5f)), (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = Similarity.cosineTopK(e, e.filter($"vec_id" === 0), "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L)) // by descending cosine to (1,0)
  }

  test("annCosineTopK finds the planted nearest neighbor") {
    // 50 random-ish corpus vectors + one nearly identical to the query.
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 50L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))) :+
      (99L, Array.tabulate(16)(i => if (i == 0) 1.0f else 0.001f))
    val query = Seq((0L, Array.tabulate(16)(i => if (i == 0) 1.0f else 0.0f)))
    val e = corpus.toDF("vec_id", "embedding")
    val q = query.toDF("vec_id", "embedding")
    val top = Similarity.annCosineTopK(e, q, "vec_id", "embedding", 1, nBits = 16,
      bands = 4).collect()
    assert(top.nonEmpty && top.head.getLong(1) == 99L)
  }

  test("annCosineTopK recall@5 >= 0.9 vs exact on the sf0.001 embeddings") {
    // The s02 query shape on real data: recall of the LSH-bucketed path
    // against the exact top-5, at the driver-gate parameters. An
    // approximate operator without a recall gate is unfalsifiable — this
    // pins the quality the defaults actually deliver.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(e, q, "vec_id", "embedding", 5))
    val ann = pairs(Similarity.annCosineTopK(e, q, "vec_id", "embedding", 5))
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall@5 = $recall (|exact|=${exact.size}, hit=${(ann intersect exact).size})")
  }

  test("int8CosineTopK: recall@5 vs exact on the sf0.001 embeddings") {
    // Quantization is the ONLY approximation: int8 carries ~7 bits of
    // per-component precision, so the rounded cosines move by O(1e-2) and
    // the top-5 set should be nearly the exact set on real data.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(e, q, "vec_id", "embedding", 5))
    val i8 = pairs(Similarity.int8CosineTopK(e, q, "vec_id", "embedding", 5))
    val recall = (i8 intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall@5 = $recall")
    // Zero vectors score 0 and never crash the norm division.
    val withZero = e.select("vec_id", "embedding").limit(5).unionByName(
      Seq((777L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val z = Similarity.int8CosineTopK(withZero, withZero.filter($"vec_id" === 777L),
      "vec_id", "embedding", 2).collect()
    assert(z.forall(_.getDouble(2) == 0.0))
  }

  test("ivfCosineTopK: recall@5 vs exact and the nProbe=nCells identity") {
    // IVF prunes by cell: at the s03 gate parameters (16 cells, 4 probes,
    // ~25 % scan fraction) recall stays useful; probing EVERY cell must
    // reproduce the exact result identically — the index only partitions
    // the corpus, it never changes scores.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(e, q, "vec_id", "embedding", 5))
    val ivf = pairs(Similarity.ivfCosineTopK(e, q, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 4))
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall at 25% scan fraction")
    val full = pairs(Similarity.ivfCosineTopK(e, q, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 16))
    assert(full == exact, "probing all cells must equal the exact top-k")
  }

  test("embeddingNearDupLsh: planted dups found with wide bands (pruning regime)") {
    // Production near-dup regime from the scaladoc cost model: threshold
    // 0.85 => collision prob per band m^8 with m >= 0.82, r=8/b=8 catches
    // planted dups while random near-orthogonal pairs collide w.p. ~b/2^8.
    val rnd = new scala.util.Random(11)
    val planted = Seq(
      (1000L, Array.tabulate(32)(i => if (i == 0) 1.0f else 0.01f)),
      (1001L, Array.tabulate(32)(i => if (i == 0) 1.0f else 0.012f)),
      (2000L, Array.tabulate(32)(i => if (i == 16) 1.0f else -0.01f)),
      (2001L, Array.tabulate(32)(i => if (i == 16) 1.0f else -0.011f)))
    val noise = (1L to 200L).map(i => (i, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
    val e = (noise ++ planted).toDF("vec_id", "embedding")
    val lsh = Dedup.embeddingNearDupLsh(e, "vec_id", "embedding", 0.85, nBits = 64, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((1000L, 1001L)) && lsh.contains((2000L, 2001L)))
    assert(lsh.subsetOf(exact)) // verify step removes every false positive
  }

  test("bpeTokens: GPT-2-ish pre-tokenization, hand-computed") {
    val rows = Seq((1L, "The cat's hat, x2!"), (2L, "aa aa aa"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.bpeTokens($"text").as("bt"),
        TextFunctions.bpeTokenCount($"text").as("cnt"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getLong(2))).toMap
    assert(rows(1L)._1 == Seq("the", " cat", "'", "s", " hat", ",", " x2", "!"))
    assert(rows(1L)._2 == 8L)
    assert(rows(2L)._1 == Seq("aa", " aa", " aa")) // leading-space convention
    assert(rows(2L)._2 == 3L)
  }

  test("redactPii: mixed-case emails, phone shapes, and documented non-matches") {
    val rows = Seq(
      (1L, "write John.Doe@Example.COM or UPPER@CASE.ORG today"),
      (2L, "call +1-555-0042-99 or 555.123.4567 now"),
      (3L, "date 2026-08-13 is phone-shaped but 1-2-3-4 and v1.2.3 are not"),
      (4L, "id 123456 is too short to redact"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.redactPii($"text").as("r"),
        TextFunctions.emailCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows(1L)._1 == "write <EMAIL> or <EMAIL> today") // (?i) catches both
    assert(rows(1L)._2 == 2L)
    assert(rows(2L)._1 == "call <PHONE> or <PHONE> now")
    // 8-digit ISO date is a documented false positive; low-digit-density
    // runs (1-2-3-4) and dotted versions (v1.2.3) now survive unredacted.
    assert(rows(3L)._1 == "date <PHONE> is phone-shaped but 1-2-3-4 and v1.2.3 are not")
    assert(rows(4L)._1 == "id 123456 is too short to redact")
  }

  // ---- multimodal plumbing ----

  test("asMedia + extractFeatures: histogram features sum to 1") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    // Same names and types (nullability differs between literal-derived and declared schemas).
    assert(m.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val f = Multimodal.extractFeatures(m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f.size == 5)
    f.values.foreach(h => assert(math.abs(h.sum - 1.0) < 1e-9))
    assert(f(1L) == f(4L)) // identical payloads -> identical features
  }

  test("png codec: synthesize -> imageio decode recovers the exact pixel histogram") {
    // The formula histogram computed WITHOUT any codec...
    def formulaHist(id: Long, w: Int, h: Int): Seq[Double] = {
      val counts = new Array[Double](16)
      for (y <- 0 until h; x <- 0 until w)
        counts((java.lang.Math.floorMod(7L * x + 13L * y + id, 256L) / 16).toInt) += 1.0
      counts.map(_ / (w * h)).toSeq
    }
    // ...must equal what the real decode path extracts from the PNG bytes.
    val media = Multimodal.synthesizePngMedia(
      Seq(1L, 42L, 999L).toDF("doc_id"), "doc_id", w = 32, h = 24)
    val rows = media.collect()
    assert(rows.forall(_.getStruct(2).getString(0) == "image/png"))
    // PNG magic bytes prove a real encoder ran.
    assert(rows.forall { r =>
      val b = r.getAs[Array[Byte]](1)
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    })
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Seq(1L, 42L, 999L).foreach { id =>
      assert(feats(id) == formulaHist(id, 32, 24), s"id=$id")
    }
    // The decoded-pixel histogram differs from the raw-byte (deflate
    // stream) histogram — the gate really distinguishes decode from stub.
    val raw1 = rows.find(_.getLong(0) == 1L).get.getAs[Array[Byte]](1)
    val byteHist = new Array[Double](16)
    raw1.foreach(b => byteHist((b & 0xff) / 16) += 1.0 / raw1.length)
    assert(feats(1L) != byteHist.toSeq)
  }

  test("png decode: non-8-bit-gray formats histogram luminance, not a raw band") {
    import java.awt.image.BufferedImage
    // pixel(x,y) = (7x+13y) mod 256 in three encodings of the SAME image:
    // 8-bit gray (the native path), RGB with r=g=b=v (luminance == v), and
    // 16-bit gray with sample v*257 (high and low byte both v, but naive
    // low-byte masking of, say, v=128 -> 128*257=32896 & 0xff = 128 only
    // because *257 duplicates bytes — use v*256+7 to break that symmetry).
    def encode(imgType: Int, scale: Int, offset: Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, imgType)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = java.lang.Math.floorMod(7 * x + 13 * y, 256)
        if (imgType == BufferedImage.TYPE_INT_RGB) img.setRGB(x, y, v << 16 | v << 8 | v)
        else img.getRaster.setSample(x, y, 0, v * scale + (if (v * scale + offset < 65536) offset else 0))
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val gray8 = encode(BufferedImage.TYPE_BYTE_GRAY, 1, 0)
    val rgb = encode(BufferedImage.TYPE_INT_RGB, 1, 0)
    val gray16 = encode(BufferedImage.TYPE_USHORT_GRAY, 256, 7) // low byte = 7, NOT v
    val media = Seq((1L, gray8), (2L, rgb), (3L, gray16)).toDF("media_id", "content")
      .select($"media_id", $"content",
        struct(lit("image/png").as("mime"), length($"content").cast("long").as("n_bytes"),
          md5($"content").as("checksum")).as("meta"))
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // RGB with equal channels decodes to the same luminance histogram as gray.
    assert(feats(2L) == feats(1L))
    // 16-bit gray: v*256+7 re-drawn to 8-bit recovers ~v (not the low byte
    // 7, which would put ALL mass in bin 0).
    assert(feats(3L)(0) < 0.2 && feats(3L).count(_ > 0.0) > 8)
  }

  test("png resize: nearest-neighbour resample is the exact source-pixel subsample") {
    // 2:1 both axes: out(x,y) must be src(2x,2y). Decode the resized PNG
    // and compare every pixel against the synthesis formula directly.
    val media = Multimodal.synthesizePngMedia(
      Seq(7L).toDF("doc_id"), "doc_id", w = 32, h = 24)
    val resized = Multimodal.resizeImages(media, w = 16, h = 12).collect().head
    val png = resized.getAs[Array[Byte]](1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 16 && img.getHeight == 12)
    for (y <- 0 until 12; x <- 0 until 16)
      assert(img.getRaster.getSample(x, y, 0) ==
        ((14L * x + 26L * y + 7L) % 256).toInt, s"pixel ($x,$y)")
    // Undecodable input passes through with NULL content.
    val junk = Multimodal.asMedia(
      Seq((1L, "not a png")).toDF("doc_id", "text"), "doc_id", "text", "image/png")
    val out = Multimodal.resizeImages(junk, 16, 12).collect().head
    assert(out.isNullAt(1))
  }

  test("png codec: undecodable payload yields the zero vector, text path unchanged") {
    val junk = Seq((1L, "not a png at all")).toDF("doc_id", "text")
    val asPng = Multimodal.asMedia(junk, "doc_id", "text", "image/png")
    val f = Multimodal.extractFeatures(asPng).collect().head.getSeq[Double](1)
    assert(f.forall(_ == 0.0))
    // Same payload under text/plain still takes the byte-histogram stub.
    val asText = Multimodal.asMedia(junk, "doc_id", "text", "text/plain")
    val t = Multimodal.extractFeatures(asText).collect().head.getSeq[Double](1)
    assert(math.abs(t.sum - 1.0) < 1e-9)
  }

  test("wav codec: synthesize -> javax.sound decode recovers the exact sample histogram") {
    // The formula histogram computed WITHOUT any codec...
    def formulaHist(id: Long, n: Int): Seq[Double] = {
      val counts = new Array[Double](16)
      for (i <- 0 until n)
        counts((java.lang.Math.floorMod(31L * i + 17L * id, 65536L) / 4096).toInt) += 1.0
      counts.map(_ / n).toSeq
    }
    // ...must equal what the real decode path extracts from the WAV bytes.
    val media = Multimodal.synthesizeWavMedia(
      Seq(1L, 42L, 999L).toDF("doc_id"), "doc_id", nSamples = 480)
    val rows = media.collect()
    assert(rows.forall(_.getStruct(2).getString(0) == "audio/wav"))
    // RIFF/WAVE magic proves a real container encoder ran.
    assert(rows.forall { r =>
      val b = r.getAs[Array[Byte]](1)
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    })
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Seq(1L, 42L, 999L).foreach { id =>
      assert(feats(id) == formulaHist(id, 480), s"id=$id")
    }
    // The decoded-sample histogram differs from the raw-byte histogram
    // (44-byte RIFF header + little-endian 16-bit packing) — the gate
    // really distinguishes container parse + sample decode from the stub.
    val raw1 = rows.find(_.getLong(0) == 1L).get.getAs[Array[Byte]](1)
    val byteHist = new Array[Double](16)
    raw1.foreach(b => byteHist((b & 0xff) / 16) += 1.0 / raw1.length)
    assert(feats(1L) != byteHist.toSeq)
    // Undecodable audio payload yields the zero vector, like PNG junk.
    val junk = Multimodal.asMedia(
      Seq((1L, "not audio at all")).toDF("doc_id", "text"), "doc_id", "text", "audio/wav")
    val fj = Multimodal.extractFeatures(junk).collect().head.getSeq[Double](1)
    assert(fj.forall(_ == 0.0))
  }

  test("sampleFrames: stride coverage and bounds") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val frames = Multimodal.sampleFrames(m, n = 3, frameBytes = 16).collect()
    assert(frames.nonEmpty)
    frames.foreach(r => assert(r.getAs[Array[Byte]](2).length == 16))
    // doc 5 is shorter than one frame: excluded entirely
    assert(!frames.exists(_.getLong(0) == 5L))
  }

  test("dropNearDuplicates keeps exactly one representative per planted cluster") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base + "!"),          // near-dup pair -> keep 1
      (3L, "completely different content about spark query engines and scale"),
      (4L, base + " !"))                     // third member of the cluster
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"got $kept")
  }

  test("chunkDocs: boundary row sets and overlap reconstruction") {
    val docs = Seq(
      (1L, "a" * 10),    // shorter than one chunk -> 1 chunk, len 10
      (2L, "b" * 512),   // exactly one chunk
      (3L, "c" * 513),   // one char past -> 2 chunks
      (4L, ""))          // empty -> 1 empty chunk
      .toDF("doc_id", "text")
    val chunks = TextFunctions.chunkDocs(docs, "doc_id", "text", 512, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = chunks.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._3) sameElements Array("a" * 10))
    assert(byDoc(2L).map(_._3) sameElements Array("b" * 512))
    assert(byDoc(3L).length == 2 &&
      byDoc(3L)(0)._3.length == 512 && byDoc(3L)(1)._3.length == 65)
    assert(byDoc(4L).map(_._3) sameElements Array(""))
    // consecutive chunks overlap by exactly overlapChars
    val doc3 = byDoc(3L)
    assert(doc3(0)._3.takeRight(64) == doc3(1)._3.take(64))
  }
}
