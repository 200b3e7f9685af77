package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-16 operator specs: durable IVF-PQ index persistence (s20),
  * delete/tombstone (s21), bucket compaction (s23), recall eval (s24),
  * the chunked trailing RANGE window (q28 scale plan), the deterministic
  * epoch shuffle (p10), semantic decontamination (d20), streaming
  * checkpoint restart (st22), EXIF/TIFF metadata (m16), Unicode
  * normalization (t21), and the r15-ADVICE fail-loud guard on binary
  * sign-bit codes.
  */
class Round16OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def artifactRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])].collect().toSet

  test("ChunkedWindow.trailingRange == the global RANGE window, for every chunk width") {
    // Adversarial lattice: duplicate timestamps (RANGE peers), rows
    // exactly ON chunk boundaries, rows exactly frame-width apart
    // (inclusive lower bound), negative timestamps (pmod floor-div
    // domain), and a key whose rows straddle many chunks.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 4000).map { i =>
      val key = s"k${i % 3}"
      val ts = rnd.nextLong() % 4000L match { case t => t } // in [-4000, 4000)
      (i.toLong, key, ts, (i % 17).toLong)
    } ++ Seq( // pinned shapes on top of the fuzz
      (90001L, "k0", 0L, 1L), (90002L, "k0", 0L, 2L),     // boundary + tie
      (90003L, "k0", -100L, 3L), (90004L, "k0", 100L, 4L), // frame edge pair
      (90005L, "k0", -4000L, 5L)) ++ {
      // Nano-epoch magnitudes: Spark's `/` on longs is a DOUBLE divide,
      // and at ~1.7e18 (ulp 256) the rounded quotient truncates to the
      // wrong chunk — these bases are VERIFIED double-divide failures
      // (int(float(q*w)/w) != q) for each chunk width the loop tests
      // (800 = 4*frame default, 200 = frame, 1e6), chosen at today's
      // ns-since-epoch magnitude. Pairs straddle each base so a
      // misassigned row visibly changes its neighbors' frame sums.
      Seq(1700000000000003200L, 1700000000000000400L, 1700000000002000000L)
        .zipWithIndex.flatMap { case (base, i) =>
          Seq((91000L + 10 * i, "k1", base - 100L, 11L),
            (91001L + 10 * i, "k1", base, 12L),
            (91002L + 10 * i, "k1", base + 150L, 13L),
            (91003L + 10 * i, "k1", base + 799L, 14L))
        } ++ Seq((92000L, "k1", -((1L << 62) - 3L), 15L),
          (92001L, "k1", -((1L << 62) - 3L) + 150L, 16L))
    }
    val df = rows.toDF("id", "key", "ts", "v")
    val frame = 200L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("ts").rangeBetween(-frame, 0)
    val want = df.select($"id",
        count(lit(1)).over(w).as("n"), sum($"v").over(w).as("s"))
      .as[(Long, Long, Long)].collect().toSet
    // W = F (max replication), W = 4F (the default), W huge (one chunk —
    // degenerates to the naive plan): all must be bit-identical.
    for (cw <- Seq(frame, -1L, 1000000L)) {
      val got = ChunkedWindow.trailingRange(df, "ts", Seq("key"),
          frame, chunkWidth = cw) { spec =>
          Seq(count(lit(1)).over(spec).as("n"), sum($"v").over(spec).as("s"))
        }.select($"id", $"n", $"s")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"chunkWidth=$cw diverged from the global window")
    }
    val err = intercept[IllegalArgumentException] {
      ChunkedWindow.trailingRange(df, "ts", Seq("key"), frame,
        chunkWidth = frame - 1)(spec => Seq(count(lit(1)).over(spec).as("n")))
    }
    assert(err.getMessage.contains("chunkWidth"))
  }

  test("ivfPqSave/ivfPqLoad round-trips books exactly and the artifact row-for-row") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx @ (artifact, coarse, book) = Similarity.ivfPqIndex(
      e, "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r16_rt_idx", numBuckets = 4)
    val (loaded, lCoarse, lBook) = Similarity.ivfPqLoad(spark, "r16_rt_idx")
    assert(lCoarse.map(_.toSeq).toSeq === coarse.map(_.toSeq).toSeq,
      "coarse centroids must round-trip bit-exactly")
    assert(lBook.map(_.map(_.toSeq).toSeq).toSeq ===
      book.map(_.map(_.toSeq).toSeq).toSeq,
      "residual codebook must round-trip bit-exactly")
    assert(artifactRows(loaded) === artifactRows(artifact))
    // The loaded tuple plugs into maintenance unchanged: add a delta to
    // the RELOADED index and to the in-session one — identical artifacts.
    val delta = e.limit(5).select(($"vec_id" + 1000000L).as("vec_id"),
      $"embedding")
    assert(
      artifactRows(Similarity.ivfPqAdd((loaded, lCoarse, lBook), delta,
        "vec_id", "embedding")._1) ===
      artifactRows(Similarity.ivfPqAdd(idx, delta, "vec_id", "embedding")._1))
  }

  test("ivfPqSearchTable prunes buckets: the scan reads probed cells only") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r16_prune_idx", numBuckets = 4)
    // One query at nProbe=1 probes exactly one cell; the bucketed scan
    // must report SelectedBucketsCount < 4 (a full-artifact scan at
    // nProbe << nCells is the failure mode the layout exists to prevent).
    val res = Similarity.ivfPqSearchTable(e.filter($"vec_id" === 1),
      "r16_prune_idx", "vec_id", "embedding", k = 3, nProbe = 1)
    val plan = res.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$plan")
    val (got, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
    assert(total === 4 && got < total,
      s"expected a pruned scan, got $got out of $total buckets")
    // And the pruned search returns the same rows as the in-session one.
    val want = Similarity.ivfPqTopK(e, e.filter($"vec_id" === 1),
        "vec_id", "embedding", k = 3, nCells = 4, nProbe = 1,
        m = 4, kCent = 8, indexOf = Some(idx))
      .collect().map(_.toString).sorted.toSeq
    assert(res.collect().map(_.toString).sorted.toSeq === want)
  }

  test("ivfPqAddToTable: durable append == in-session add, pruning survives the append") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = e.filter($"vec_id" % 4 =!= 0)
    val delta = e.filter($"vec_id" % 4 === 0)
    val idx @ (_, coarse, book) = Similarity.ivfPqIndex(old,
      "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r16_tadd_idx", numBuckets = 4)
    Similarity.ivfPqAddToTable(delta, "r16_tadd_idx", "vec_id", "embedding")
    val (reloaded, _, _) = Similarity.ivfPqLoad(spark, "r16_tadd_idx")
    // Table rows == the in-session add's artifact, bit-for-bit.
    assert(artifactRows(reloaded) ===
      artifactRows(Similarity.ivfPqAdd(idx, delta, "vec_id", "embedding")._1))
    // The appended table still prunes buckets at serving time (append
    // adds files per bucket; it must not demote the scan to unbucketed).
    val res = Similarity.ivfPqSearchTable(e.filter($"vec_id" === 1),
      "r16_tadd_idx", "vec_id", "embedding", k = 3, nProbe = 1)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(res.queryExecution.executedPlan.toString)
    assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
      "bucket pruning must survive the append")
    // Appending to a non-bucketed table fails loud.
    graft.sources.BucketedTables.replaceSidecar(
      reloaded.localCheckpoint(true), "r16_tadd_flat")
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfPqAddToTable(delta, "r16_tadd_flat", "vec_id", "embedding")
    }
    assert(err.getMessage.contains("bucket spec"))
  }

  test("ivfPqCompact: one file per bucket again, search and pruning unchanged") {
    import graft.sources.BucketedTables
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = Similarity.ivfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r16_cmp_idx", numBuckets = 4)
    // One file per NON-EMPTY bucket per write (cells hash into buckets,
    // so empties are legal): each append adds its own files on top.
    val fSave = BucketedTables.dataFileCount(spark, "r16_cmp_idx")
    assert(fSave >= 1 && fSave <= 4)
    Similarity.ivfPqAddToTable(e.filter($"vec_id" % 4 === 0 && $"vec_id" % 8 === 0),
      "r16_cmp_idx", "vec_id", "embedding")
    Similarity.ivfPqAddToTable(e.filter($"vec_id" % 4 === 0 && $"vec_id" % 8 =!= 0),
      "r16_cmp_idx", "vec_id", "embedding")
    val fFragmented = BucketedTables.dataFileCount(spark, "r16_cmp_idx")
    assert(fFragmented > fSave, "appends must land as new files")
    val before = artifactRows(Similarity.ivfPqLoad(spark, "r16_cmp_idx")._1)
    def search() = Similarity.ivfPqSearchTable(
      e.filter($"vec_id" <= 3), "r16_cmp_idx", "vec_id", "embedding",
      k = 5, nProbe = 2).collect().map(_.toString).sorted.toSeq
    val wantSearch = search()
    Similarity.ivfPqCompact(spark, "r16_cmp_idx")
    // Compaction restores the one-file-per-non-empty-bucket contract:
    // the full artifact's cell set == the build's (the build saw every
    // seed), so the compacted file count is the save-time count again.
    assert(BucketedTables.dataFileCount(spark, "r16_cmp_idx") === fSave)
    // ...moves bytes, never rows or codes...
    assert(artifactRows(Similarity.ivfPqLoad(spark, "r16_cmp_idx")._1) === before)
    // ...search results are bit-identical, and bucket pruning still fires.
    assert(search() === wantSearch)
    val res = Similarity.ivfPqSearchTable(e.filter($"vec_id" === 1),
      "r16_cmp_idx", "vec_id", "embedding", k = 3, nProbe = 1)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(res.queryExecution.executedPlan.toString)
    assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
      "bucket pruning must survive compaction")
    // Idempotent: compacting a compact table is a no-op rewrite.
    Similarity.ivfPqCompact(spark, "r16_cmp_idx")
    assert(BucketedTables.dataFileCount(spark, "r16_cmp_idx") === fSave)
    // Fails loud off the artifact contract: no books sidecar / no spec.
    assert(intercept[IllegalArgumentException] {
      Similarity.ivfPqCompact(spark, "r16_cmp_idx_books")
    }.getMessage.contains("sidecar"))
    assert(intercept[IllegalArgumentException] {
      graft.sources.BucketedTables.compactTable(spark, "r16_cmp_idx_books")
    }.getMessage.contains("bucket spec"))
  }

  test("epochShuffle: dense permutation, nShards-invariant, seed-sensitive") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"doc_id")
    val n = docs.count()
    val got = Sampling.epochShuffle(docs, "doc_id", seed = "epoch-0")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    // Dense permutation of [0, n): no gaps, no collisions.
    assert(got.values.toSeq.sorted === (0L until n))
    // nShards is an implementation detail of the prefix sum: 1 shard
    // (the naive global window), 7 (doesn't divide 2^60), 64 — all must
    // place every row at the same position.
    for (ns <- Seq(1, 7, 64)) {
      val alt = Sampling.epochShuffle(docs, "doc_id", seed = "epoch-0", ns)
        .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
      assert(alt === got, s"positions moved under nShards=$ns")
    }
    // A new seed is a fresh permutation (still dense), not a shift.
    val e1 = Sampling.epochShuffle(docs, "doc_id", seed = "epoch-1")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(e1.values.toSeq.sorted === (0L until n))
    assert(e1 !== got)
    val moved = got.count { case (id, p) => e1(id) != p }
    assert(moved > n / 2, s"only $moved of $n rows moved between epochs")
  }

  test("annRecall: hand-computed hits, zero-hit queries kept, shortfall not penalized") {
    val exact = Seq( // q1: 3 true neighbors (shortfall vs k), q2: 2, q3: 2
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L),
      (3L, 30L), (3L, 31L)).toDF("query_id", "neighbor_id")
    val approx = Seq( // q1 finds 2 of 3, q2 finds both, q3 none right
      (1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 21L), (2L, 20L),
      (3L, 98L), (3L, 97L)).toDF("query_id", "neighbor_id")
    val got = Similarity.annRecall(exact, approx, "query_id", "neighbor_id")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L, 3L, 0.666667), (2L, 2L, 2L, 1.0),
      (3L, 0L, 2L, 0.0)))
    // On the real corpus: IVF-PQ at full probe depth against exact
    // cosine — recall must land strictly between 0 and 1 exclusive of
    // pathologies (all-zero would mean a broken join, all-one would mean
    // the quantizer is magically lossless at m=4).
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    val r = Similarity.annRecall(
      Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
      Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
        nCells = 4, nProbe = 2, m = 4, kCent = 8),
      "query_id", "neighbor_id")
      .agg(avg($"recall")).as[Double].head()
    assert(r >= 0.0 && r <= 1.0)
  }

  test("semanticDecontaminate: planted paraphrase-neighbors flagged, orthogonal corpus clean") {
    def vec(xs: Double*) = xs.toArray ++ Array.fill(8 - xs.length)(0.0)
    val heldOut = Seq(
      (900L, vec(1.0)),            // benchmark item b1
      (901L, vec(0.0, 1.0))        // benchmark item b2
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, vec(1.0)),              // exact copy of b1: cosine 1.0
      (2L, vec(0.8, 0.6)),         // near both: 0.8 to b1, 0.6 to b2
      (3L, vec(0.0, 0.0, 1.0)),    // orthogonal to the whole benchmark
      (4L, vec(0.4, -0.9165151389911680))  // 0.4 to b1 — BELOW threshold
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDecontaminate(corpus, heldOut,
        "vec_id", "embedding", threshold = 0.45)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 1L, 1.0), (2L, 2L, 0.8)))
    // High-threshold wide-band regime (the production near-copy decon
    // the scaladoc documents): r=8 bands catch a planted 0.98-cosine
    // paraphrase of a benchmark item while the orthogonal row stays
    // clean — pins the bands knob actually trading scan for recall.
    val wideCorpus = Seq(
      (10L, vec(0.98, 0.19899748742132397)), // 0.98 to b1
      (11L, vec(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val wide = Dedup.semanticDecontaminate(wideCorpus, heldOut,
        "vec_id", "embedding", threshold = 0.95, nBits = 64, bands = 8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(wide === Seq((10L, 1L, 0.98)))
    // Corpus and benchmark stay distinct sets: nothing self-flags, and
    // the id spaces may legally overlap (no cross-set id assumptions).
    val overlap = Dedup.semanticDecontaminate(
      heldOut.withColumn("vec_id", col("vec_id") - 900L), heldOut,
      "vec_id", "embedding", threshold = 0.45)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(overlap === Seq((0L, 1L, 1.0), (1L, 1L, 1.0)))
  }

  test("streamingFirstSeen restart: checkpoint restores state; a fresh checkpoint undercounts") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("r16-restart").toString
    // Key "a" recurs across the restart boundary: 3 rows in f0, 2 in f1.
    def stage(f: Int, rows: Seq[(Long, String)]): Unit = {
      rows.toDF("doc_id", "k").coalesce(1).write.parquet(s"$dir/stage$f")
      val part = new java.io.File(s"$dir/stage$f").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(s"$dir/in/f$f.parquet")
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.move(part, dst)
    }
    stage(0, Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")))
    val schema = spark.read.parquet(s"$dir/in").schema
    def job(ckpt: String, out: String): Unit = {
      val q = graft.streaming.Streams.streamingFirstSeen(
          spark.readStream.schema(schema).parquet(s"$dir/in"), "doc_id", "k")
        .toDF().writeStream.format("parquet").option("path", s"$dir/$out")
        .option("checkpointLocation", s"$dir/$ckpt").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    job("ckpt", "out")           // job 1: f0 only
    stage(1, Seq((11L, "a"), (12L, "a"), (13L, "c")))
    job("ckpt", "out")           // job 2: resumes, sees only f1
    val got = spark.read.parquet(s"$dir/out").groupBy($"key")
      .agg(min($"min_id").as("m"), max($"cnt").as("c"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // State recovered: "a" counts 5 across both jobs, min from job 1.
    assert(got === Seq(("a", 1L, 5L), ("b", 4L, 1L), ("c", 13L, 1L)))
    // The negative: a FRESH checkpoint that only sees the new file loses
    // "a"'s state — cnt restarts at 2, the undercount the shared
    // checkpoint exists to prevent (and the st22 oracle would catch).
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/in/f0.parquet"),
      java.nio.file.Paths.get(s"$dir/f0.parquet"))
    job("ckpt2", "out2")
    val lost = spark.read.parquet(s"$dir/out2").groupBy($"key")
      .agg(max($"cnt").as("c")).as[(String, Long)].collect().toMap
    assert(lost("a") === 2L)
  }

  test("parseExifMeta: both endiannesses, offset values, sub-IFD; malformed -> None") {
    import graft.multimodal.Multimodal
    // Even id = II (little-endian), odd = MM (big): planted closed forms.
    for (id <- Seq(0L, 1L, 37L, 98L)) {
      val got = Multimodal.parseExifMeta(Multimodal.synthesizeExifJpeg(id))
      assert(got === Some((if (id % 2 == 0) "II" else "MM",
        1 + id % 8, 72 + id % 10, 1L, s"sw-${id % 100}",
        64 + id % 64, 48 + id % 32)), s"id=$id")
    }
    // The APP1 splice keeps the base JPEG valid: the m15 marker walk
    // still parses it, with exactly one extra length-framed segment.
    assert(Multimodal.parseJpegMeta(Multimodal.synthesizeExifJpeg(6L)) ===
      Multimodal.parseJpegMeta(Multimodal.synthesizeJpeg(6L))
        .map { case (w, h, nc, p, nseg) => (w, h, nc, p, nseg + 1) })
    // No EXIF (plain JPEG, and a REAL imageio encode) -> None, no crash.
    assert(Multimodal.parseExifMeta(Multimodal.synthesizeJpeg(3L)).isEmpty)
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    assert(Multimodal.parseExifMeta(bos.toByteArray).isEmpty)
    // Corrupted TIFF blocks -> None, never a throw: truncate the APP1
    // payload at every length (exercises each bounds check), flip the
    // byte-order mark, zero the magic.
    val ok = Multimodal.synthesizeExifJpeg(4L)
    for (cut <- 12 to 40) {
      val t = ok.take(cut) ++ ok.drop(ok.length - 2) // keep EOI shape
      Multimodal.parseExifMeta(t) // must not throw
    }
    // TIFF origin = SOI(2) + APP0(18) + marker/len(4) + "Exif\0\0"(6) = 30.
    val badOrder = ok.clone(); badOrder(30) = 'X'.toByte
    assert(Multimodal.parseExifMeta(badOrder).isEmpty)
    val badMagic = ok.clone(); badMagic(32) = 9; badMagic(33) = 9
    assert(Multimodal.parseExifMeta(badMagic).isEmpty)
  }

  test("nfc/nfkc normalize: variants collapse, NFKC folds compat forms, fast path is identity") {
    import graft.functions.UnicodeNorm
    import org.apache.spark.unsafe.types.UTF8String
    // NFC: decomposed == precomposed after normalization (explicit
    // escapes -- source-file encoding must not decide what is tested).
    val pairs = Seq(("cafe\u0301", "caf\u00e9"),
      ("A\u030Aberg", "\u00C5berg"))
    for ((dec, pre) <- pairs) {
      assert(dec != pre)
      assert(UnicodeNorm.nfcKernel(UTF8String.fromString(dec)).toString === pre)
      assert(UnicodeNorm.nfcKernel(UTF8String.fromString(pre)).toString === pre)
    }
    // NFKC additionally folds compatibility forms; NFC must NOT.
    val compat = "\uFF21\uFB01\u00B2" // fullwidth A, fi ligature, superscript 2
    assert(UnicodeNorm.nfkcKernel(UTF8String.fromString(compat)).toString === "Afi2")
    assert(UnicodeNorm.nfcKernel(UTF8String.fromString(compat)).toString === compat)
    // Fast path: already-NFC input comes back as the SAME UTF8String --
    // no re-encode allocation on the (overwhelmingly common) clean text.
    val clean = UTF8String.fromString("plain ascii caf\u00e9")
    assert(UnicodeNorm.nfcKernel(clean) eq clean)
    // Column surface agrees with the kernel, NULLs propagate.
    val df = Seq((1L, "cafe\u0301"), (2L, "caf\u00e9"))
      .toDF("id", "s")
    val got = df.select($"id", UnicodeNorm.nfc_normalize($"s").as("n"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "caf\u00e9"), (2L, "caf\u00e9")))
    val nulls = Seq((3L, null: String)).toDF("id", "s")
      .select(UnicodeNorm.nfc_normalize($"s").as("n"))
      .as[Option[String]].collect().toSeq
    assert(nulls === Seq(None))
  }

  test("ivfPqTuneNProbe: full curve, chosen = first point meeting target, honest miss") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    val idx = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    def curve(target: Double) =
      Similarity.ivfPqTuneNProbe(idx, e, q, "vec_id", "embedding",
        k = 5, target = target)
        .as[(Int, Double, Boolean)].collect().sortBy(_._1).toSeq
    val c = curve(1e-9)
    assert(c.map(_._1) === (1 to 4))
    // Every sweep point's mean recall must equal the independent
    // annRecall computation at that nProbe (the curve IS s24 swept).
    for ((p, r, _) <- c) {
      val want = Similarity.annRecall(
        Similarity.cosineTopK(e, q, "vec_id", "embedding", 5),
        Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5,
          nCells = 4, nProbe = p, m = 4, kCent = 8, indexOf = Some(idx)),
        "query_id", "neighbor_id")
        .agg(round(avg($"recall"), 6)).head().getDouble(0)
      assert(r === want, s"nProbe=$p curve diverged from annRecall")
    }
    // Any positive recall meets the 1e-9 target at nProbe=1.
    assert(c.head._3 === true && c.tail.forall(!_._3))
    // Target between the p=1 and max recall: chosen moves rightward to
    // the FIRST point meeting it.
    val max = c.map(_._2).max
    if (max > c.head._2) {
      val mid = (c.head._2 + max) / 2
      val c2 = curve(mid)
      val firstMeeting = c2.find(_._2 >= mid).map(_._1)
      assert(c2.filter(_._3).map(_._1) === firstMeeting.toSeq)
    }
    // Unreachable target: all false — surfaced honestly, not clamped.
    assert(curve(1.0).forall(!_._3) || max >= 1.0)
  }

  test("ivfPqLoad fails loud on a corrupted books sidecar") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r16_bad_idx", numBuckets = 4)
    // Drop one codebook row: the (i, j) lattice has a gap — a silent
    // load would score garbage against a null centroid. Materialize the
    // filtered sidecar BEFORE the replace (which deletes the files the
    // lazy frame would otherwise read).
    val corrupted = spark.table("r16_bad_idx_books")
      .filter(!($"kind" === 1 && $"i" === 2 && $"j" === 3))
      .localCheckpoint(true)
    graft.sources.BucketedTables.replaceSidecar(corrupted, "r16_bad_idx_books")
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfPqLoad(spark, "r16_bad_idx")
    }
    assert(err.getMessage.contains("codebook rows"))
  }

  test("ivfPqRemove: left_anti semantics, books untouched, remove-then-add == upsert") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx @ (artifact, coarse, book) = Similarity.ivfPqIndex(
      e, "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    val victims = e.filter($"vec_id" % 5 === 2).select($"vec_id")
    val (survived, sCoarse, sBook) = Similarity.ivfPqRemove(idx,
      victims, "vec_id")
    // Books pass through untouched (same arrays, not copies).
    assert(sCoarse.eq(coarse) && sBook.eq(book))
    // Exactly the victims' rows are gone; survivors are bit-identical.
    assert(artifactRows(survived) ===
      artifactRows(artifact.join(victims.select($"vec_id".as("id")),
        Seq("id"), "left_anti")))
    assert(survived.count() === e.count() - victims.count())

    // remove(ids) then add(delta with those ids) == upsert(delta): the
    // two CRUD compositions that express "replace" must agree.
    val delta = e.filter($"vec_id" % 5 === 2)
      .select($"vec_id",
        transform($"embedding".cast("array<double>"), x => x + lit(1.0))
          .as("embedding"))
    val removeAdd = artifactRows(Similarity.ivfPqAdd(
      (survived, sCoarse, sBook), delta, "vec_id", "embedding")._1)
    val upsert = artifactRows(Similarity.ivfPqUpsert(idx, delta,
      "vec_id", "embedding")._1)
    assert(removeAdd === upsert)
  }

  test("ivfPqStaleness: removed training mass raises retrain pressure") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx @ (_, coarse, book) = Similarity.ivfPqIndex(
      e, "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    val train = Similarity.ivfPqAppend(e, "vec_id", "embedding",
      coarse, book, withDistortion = true)
    val delta = Similarity.ivfPqAppend(e.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", coarse, book, withDistortion = true)
    // No removals: pressure == staleness, removed fraction 0.
    val Array((st0, frac0, pr0)) =
      Similarity.ivfPqStaleness(train, delta, Some(idx._1))
        .select($"staleness", $"removed_train_frac", $"retrain_pressure")
        .as[(Double, Double, Double)].collect()
    assert(frac0 === 0.0 && math.abs(pr0 - st0) < 1e-12)
    // Remove half the training rows: pressure == staleness / (1 - 1/2).
    val (half, _, _) = Similarity.ivfPqRemove(idx,
      e.filter($"vec_id" % 2 === 0).select($"vec_id"), "vec_id")
    val Array((st1, frac1, pr1)) =
      Similarity.ivfPqStaleness(train, delta, Some(half))
        .select($"staleness", $"removed_train_frac", $"retrain_pressure")
        .as[(Double, Double, Double)].collect()
    val nEven = e.filter($"vec_id" % 2 === 0).count().toDouble
    assert(math.abs(frac1 - nEven / e.count()) < 1e-12)
    assert(pr1 > st1, "eroded training support must raise pressure")
    assert(math.abs(pr1 - st1 / (1.0 - frac1)) < 1e-9)
  }

  test("streamingFirstSeenTtl: chains close on eviction, re-seen keys start fresh, state shrinks") {
    // Three hand-computed micro-batches (one file each, mtime-ordered),
    // ttl=10s, lateness=0. Event times sit OFF zero — a row at the
    // initial watermark (0) is dropped as late (measured):
    //   f0: a@1000 (id 1), b@1001 (id 2)
    //   f1: a@1050 (id 3), c@1051 (id 4)  wm=1001 -> a CONTINUES
    //       (the wm, not the gap, decides: 1001 < 1000+10 is false... it
    //       is 1001 > 1010 that's false — no split)
    //   f2: b@1100 (id 5)                 wm=1051 -> b's open chain
    //       (id 2, last 1001) is past the horizon (1051 > 1011): closes
    //       EAGERLY in the data call, fresh chain starts at id 5
    //   final no-data batch (fires timeouts — measured), wm=1100:
    //       a (timeout 1060) and c (1061) evict and emit; b's fresh
    //       chain (timeout 1110) stays open, never emits.
    // Expected emissions: (b,2,1), (a,1,2), (c,4,1); final state = 1 row.
    val dir = java.nio.file.Files.createTempDirectory("graft-st21spec")
    val files = Seq(
      Seq((1L, "a", 1000L), (2L, "b", 1001L)),
      Seq((3L, "a", 1050L), (4L, "c", 1051L)),
      Seq((5L, "b", 1100L)))
    files.zipWithIndex.foreach { case (rows, f) =>
      rows.toDF("id", "key", "sec")
        .select($"id", $"key", timestamp_seconds($"sec").as("ts"))
        .coalesce(1).write.parquet(s"$dir/stage$f")
      val part = new java.io.File(s"$dir/stage$f").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(s"$dir/in/f$f.parquet")
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + f * 60000L))
    }
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = graft.streaming.Streams
      .streamingFirstSeenTtl(stream, "id", "key", "ts",
        ttlSec = 10L, lateness = "0 seconds")
      .toDF()
      .writeStream.format("memory").queryName("st21spec")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("st21spec")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("b", 2L, 1L), ("a", 1L, 2L), ("c", 4L, 1L)),
      "closed-chain emissions (incl. the final timeout batch) must match " +
        s"the hand computation; got $got")
    // Eviction really dropped state: only b's open chain survives.
    val lastState = q.recentProgress.flatMap(_.stateOperators).last
    assert(lastState.numRowsTotal === 1L,
      s"expected 1 surviving state row, got ${lastState.numRowsTotal}")
  }

  test("binaryCodes fails loud on a mis-dimensioned vector (no silent sign-0 fill)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val short = e.limit(3).select($"vec_id",
      slice($"embedding".cast("array<double>"), 1, 32).as("embedding"))
    val err = intercept[Exception] {
      Similarity.binaryCodes(short, "vec_id", "embedding", dim = 64)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("binaryCodes: vector has")), s"got: $err")
    // The guard must also fire through the search entry point (raw-vector
    // path, not just direct encode calls).
    val err2 = intercept[Exception] {
      Similarity.binaryHammingTopK(short,
        e.filter($"vec_id" <= 1), "vec_id", "embedding", dim = 64, k = 2)
        .collect()
    }
    assert(msgs(err2).exists(_.contains("binaryCodes: vector has")), s"got: $err2")
  }
}
