package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class Round12OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // Driver-side twin of the operator's integer lattice: quantized vectors,
  // coarse assignment (ties to the smaller cell), per-query probe list.
  private def lattice(path: String) = {
    val e = spark.read.parquet(path)
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x * 1e6)).toArray)
      .sortBy(_._1)
    (e, vecs)
  }

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("ivfPqTopK: every neighbor lives in a cell its query probed") {
    val (e, vecs) = lattice("/root/testdata/sf0.001/embeddings.parquet")
    val nCells = 4
    val coarse = vecs.take(nCells).map(_._2)
    def cellOf(v: Array[Long]): Int =
      coarse.zipWithIndex.minBy { case (c, i) => (d2(v, c), i) }._2
    val cellById = vecs.map { case (id, v) => id -> cellOf(v) }.toMap
    val probesById = vecs.filter(_._1 <= 3L).map { case (qid, qv) =>
      qid -> coarse.zipWithIndex.map { case (c, i) => (d2(qv, c), i) }
        .sorted.take(2).map(_._2).toSet
    }.toMap
    val out = Similarity.ivfPqTopK(e, e.filter($"vec_id" <= 3),
        "vec_id", "embedding", k = 5, nCells = nCells, nProbe = 2,
        m = 4, kCent = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (qid, nid) =>
      assert(probesById(qid).contains(cellById(nid)),
        s"neighbor $nid (cell ${cellById(nid)}) outside query $qid's " +
          s"probed cells ${probesById(qid)}")
    }
  }

  test("ivfPqTopK containment@50 of the exact top-5 (all cells probed)") {
    // The falsifiable recall pin (the pqTopK discipline): with every cell
    // probed, the only approximation left is the residual PQ coding, so
    // ADC@50 must contain most of the exact integer-L2 top-5. Residual
    // coding at the same (m, kCent) budget must not do WORSE than the raw
    // PQ path's measured 0.8 containment — residuals are tighter than raw
    // vectors by construction.
    val (e, vecs) = lattice("/root/testdata/sf0.001/embeddings.parquet")
    val qs = vecs.filter(_._1 <= 3L)
    val exact = qs.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid).map { case (id, v) => (qid, id, d2(v, qv)) }
        .sortBy(t => (t._3, t._2)).take(5).map(t => (qid, t._2))
    }.toSet
    val short = Similarity.ivfPqTopK(e, e.filter($"vec_id" <= 3),
        "vec_id", "embedding", k = 50, nCells = 4, nProbe = 4,
        m = 8, kCent = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val containment = (short intersect exact).size.toDouble / exact.size
    assert(containment >= 0.8,
      s"IVF-PQ ADC@50 containment of exact top-5 = $containment")
  }

  test("pqTrain: one Lloyd iteration does not increase total distortion") {
    // Lloyd's assignment+update step is non-increasing in within-cluster
    // SSE; the floor-div integer centroid perturbs each dim by < 1 micro,
    // noise orders of magnitude below the distortion scale. Distortion =
    // sum over vectors and subspaces of the encoding d2 under each book.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def distortion(nIter: Int): Double = {
      val book = Similarity.pqTrain(e, "vec_id", "embedding",
        m = 4, kCent = 8, nIter = nIter)
      val codes = Similarity.pqCodes(e, "vec_id", "embedding",
        m = 4, kCent = 8, codebookOf = Some(book))
      val vecs = e.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(x => math.round(x * 1e6)).toArray).toMap
      codes.select("vec_id", "codes").collect().map { r =>
        val v = vecs(r.getLong(0))
        r.getSeq[Int](1).zipWithIndex.map { case (c, s) =>
          d2(v.slice(s * 16, s * 16 + 16), book(s)(c)).toDouble
        }.sum
      }.sum
    }
    val init = distortion(0)
    val trained = distortion(1)
    assert(trained <= init * 1.0001,
      s"trained distortion $trained worse than init $init")
    assert(trained > 0.0)
  }

  test("mp4 stbl walk recovers the synthesized sample tables exactly") {
    import graft.multimodal.Multimodal
    (0L to 50L).foreach { id =>
      val n = (id % 7) + 2
      val expected = Multimodal.TrackSampleTable(
        track = 1L,
        sampleCount = n,
        totalBytes = (0L until n).map(i => (id * 13 + 5 * i) % 200 + 50).sum,
        nChunks = id % 3 + 1,
        firstChunkOffset = Some(1000 + id % 100),
        totalTicks = (n - 1) * (id % 5 + 1) + 100)
      val got = Multimodal.parseMp4SampleTables(Multimodal.synthesizeMp4Track(id))
      assert(got.contains(Seq(expected)), s"id=$id got $got")
      // The mvhd tier still parses the track-bearing container unchanged.
      val ts = 600L + (id % 10) * 100
      val dur = (id * 37) % 100000 + 600
      assert(Multimodal.parseMp4(Multimodal.synthesizeMp4Track(id))
        .contains(("isom", 3L, ts, dur)))
    }
  }

  test("mp4 stbl walk: fixed-size stsz, truncated tables, absent chains") {
    import graft.multimodal.Multimodal
    val good = Multimodal.synthesizeMp4Track(9L)
    // Garbage and truncation: NULL-row path, never a throw.
    assert(Multimodal.parseMp4SampleTables(null).isEmpty)
    assert(Multimodal.parseMp4SampleTables("junk bytes not mp4".getBytes).isEmpty)
    assert(Multimodal.parseMp4SampleTables(good.take(60)).isEmpty)
    // stsz with a non-zero fixed sample_size has NO per-sample table:
    // total bytes = fixed * count. Patch the synthesized stsz in place
    // (body starts after ftyp 16 + moov hdr 8 + mvhd 108 + trak/mdia/minf
    // hdrs 24 + stbl hdr 8 + stts 32 + stsz hdr+verflags 12).
    val stszBody = 16 + 8 + 108 + 24 + 8 + 32 + 12
    val fixed = good.clone()
    val bb = java.nio.ByteBuffer.wrap(fixed)
    assert(new String(fixed, stszBody - 8, 4, "US-ASCII") == "stsz")
    bb.putInt(stszBody, 777) // fixed sample_size; count stays (9%7)+2 = 4
    val t = Multimodal.parseMp4SampleTables(fixed).get.head
    assert(t.sampleCount == 4L && t.totalBytes == 777L * 4)
    // Corrupt the stsz count so the per-sample table overruns its box.
    val overrun = good.clone()
    java.nio.ByteBuffer.wrap(overrun).putInt(stszBody + 4, 100000)
    assert(Multimodal.parseMp4SampleTables(overrun).isEmpty)
    // A trak lacking the mdia chain is skipped -> parse succeeds with no
    // tracks; the extractor then emits the NULL row.
    val bare = Multimodal.synthesizeMp4(5L)
    assert(Multimodal.parseMp4SampleTables(bare).contains(Seq.empty))
    import org.apache.spark.sql.Row
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "garbage".getBytes, Row("video/mp4", 7L, "x")),
        Row(2L, bare, Row("video/mp4", bare.length.toLong, "y")))),
      Multimodal.mediaSchema)
    val out = Multimodal.extractMp4SampleTable(junk).collect()
      .map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("corpusMinhashBy slices == corpusMinhash per slice; matrix replays d16 pairwise") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "one two three four five six"),
      (2L, "alpha beta gamma zeta eta"),
      (3L, "seven eight nine ten eleven"),
      (4L, "one two three four nine ten"),
      (5L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
      .withColumn("slice", col("doc_id") % 3)
    val grouped = Dedup.corpusMinhashBy(docs, "slice", "text", n = 3, k = 8)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    (0L until 3L).foreach { s =>
      val alone = Dedup.corpusMinhash(docs.filter(col("slice") === s),
        "text", n = 3, k = 8).as[(Long, Long)].collect().toMap
      assert(grouped(s) == alone, s"slice $s signature diverges")
    }
    // Matrix = the d16 agree-count on each unordered pair of signatures.
    val m = Dedup.corpusResemblanceMatrix(docs, "slice", "text", n = 3, k = 8)
      .select("slice_a", "slice_b", "k", "matches")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    val expected = (for {
      a <- 0L until 3L; b <- (a + 1) until 3L
    } yield (a, b) -> ((8L,
      (0L until 8L).count(p => grouped(a)(p) == grouped(b)(p)).toLong))).toMap
    assert(m == expected)
    // An all-duplicate pair of slices would agree everywhere; these
    // distinct slices must not.
    assert(m.values.forall(_._2 < 8L))
  }

  test("motif edge predicates match post-hoc filtering; bad names rejected") {
    import graft.graph.GraphFrame
    val edges = Seq(
      (1L, 2L, 10L), (2L, 3L, 50L), (2L, 4L, 5L),
      (1L, 3L, 99L), (3L, 4L, 50L)).toDF("src", "dst", "weight")
    val g = GraphFrame.fromEdges(edges)
    val pattern = "(a)-[e]->(b); (b)-[e2]->(c)"
    val pushed = g.find(pattern, Map("e2" -> (col("weight") >= 50L)))
      .select(col("a.id"), col("b.id"), col("c.id"), col("e2.weight"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val filtered = g.find(pattern).filter(col("e2.weight") >= 50L)
      .select(col("a.id"), col("b.id"), col("c.id"), col("e2.weight"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(pushed == filtered && pushed.nonEmpty, s"pushed=$pushed")
    // A vertex and an edge sharing a name would emit two ambiguous
    // columns — rejected at parse, as is a predicate for an unknown or
    // anonymous edge variable.
    intercept[IllegalArgumentException] {
      g.find("(a)-[b]->(c); (b)-[]->(d)")
    }
    intercept[IllegalArgumentException] {
      g.find(pattern, Map("nope" -> (col("weight") > 0L)))
    }
    intercept[IllegalArgumentException] {
      // Negated terms have anonymous edges; predicates cannot target them.
      g.find("(a)-[e]->(b); !(a)-[]->(b)", Map("__anon_1" -> lit(true)))
    }
  }

  test("streamingDecontaminate size guard fails loudly past the threshold") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val held = Seq((10L, "alpha beta gamma epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    // Guard fires BEFORE the driver collect; the message routes to the
    // distributed variant.
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Streams.streamingDecontaminate(
        docs, held, "doc_id", "text", n = 3, maxHeldOutHashes = 2L)
    }
    assert(e.getMessage.contains("streamingDecontaminateJoin"), e.getMessage)
    // Under the threshold the small-set variant still works (batch frame
    // exercises the same projection/filter the streaming plan runs).
    val flagged = graft.streaming.Streams.streamingDecontaminate(
      docs, held, "doc_id", "text", n = 3)
      .as[Long].collect().toSet
    assert(flagged == Set(1L))
  }

  test("manifest reader falls back to an unpruned exact scan when the manifest is missing") {
    import graft.sources.ManifestTables
    val data = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "grp")
      .repartition(4, col("k"))
    val path = ManifestTables.writeWithManifest(data, "r12_manifest_fallback",
      Seq("k"))
    val expected = data.filter(col("k") >= 100L && col("k") <= 200L)
      .select("k").as[Long].collect().sorted.toSeq
    def readBack() = ManifestTables
      .readPruned(spark, path, "k", 100L, 200L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(readBack() == expected)
    // Simulate the swap window: no manifest at the final path.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"${path}__manifest"),
      new org.apache.hadoop.fs.Path(s"${path}__manifest__old")))
    assert(readBack() == expected, "fallback scan must stay exact")
  }

  test("mp4 sample extraction recovers exact payload bytes through the index") {
    import graft.multimodal.Multimodal
    (0L to 30L).foreach { id =>
      val n = ((id % 7) + 2).toInt
      val sizes = Array.tabulate(n)(i => (id * 13 + 5 * i) % 200 + 50)
      val starts = sizes.scanLeft(0L)(_ + _)
      def sums(i: Int): Long = (starts(i) until starts(i) + sizes(i))
        .map(p => (7 * p + id) % 256).sum
      def extract(mp4: Array[Byte]) = {
        val sink = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
            id, mp4, org.apache.spark.sql.Row("video/mp4", mp4.length.toLong, "x")))),
          Multimodal.mediaSchema)
        Multimodal.extractMp4Samples(sink)
          .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._3).toSeq
      }
      // Single-chunk (faststart) layout: every sample in chunk 0.
      val expected = (0 until n).map(i => (id, 1L, i.toLong, 0L, sizes(i), sums(i)))
      val mp4 = Multimodal.synthesizeMp4Frames(id)
      assert(extract(mp4) == expected, s"id=$id")
      // The extraction container still parses under the m09/m11 tiers.
      assert(Multimodal.parseMp4(mp4).isDefined)
      assert(Multimodal.parseMp4SampleTables(mp4).exists(_.length == 1))
      // Multi-chunk via stsc, junk gaps between chunks: SAME byte sums
      // (sample content is chunk-layout-invariant by construction), the
      // stsc-resolved chunk index attached — a reader walking linearly
      // past the gaps would differ.
      val nc = math.min(((id % 3) + 1).toInt, n)
      val spc = n / nc
      val chunked = (0 until n).map(i =>
        (id, 1L, i.toLong, math.min(i / spc, nc - 1).toLong, sizes(i), sums(i)))
      assert(extract(Multimodal.synthesizeMp4Chunks(id)) == chunked, s"id=$id chunked")
    }
  }

  test("mp4 sample extraction refuses layouts it cannot honestly read") {
    import graft.multimodal.Multimodal
    import org.apache.spark.sql.Row
    // synthesizeMp4Track's stco offsets are formula values, not real file
    // positions: id=0 has one chunk whose offset points past the buffer
    // (poisoned track -> NULL row); id=1 has two chunks (stsc-less
    // multi-chunk -> refused, NULL row); plus plain garbage.
    // ...and an stsc whose expanded run totals disagree with the stsz
    // sample count (id=1: n=3, nc=2, runs [(1,1),(2,2)]; patching the
    // first run's samples_per_chunk — stsc box start + 8 hdr + 4 verflags
    // + 4 entry_count + 4 first_chunk — to 3 claims 5 samples).
    val badStsc = Multimodal.synthesizeMp4Chunks(1L)
    java.nio.ByteBuffer.wrap(badStsc)
      .putInt(16 + 8 + 108 + 24 + 8 + 32 + 20, 3)
    val cases = Seq(
      (0L, Multimodal.synthesizeMp4Track(0L)),
      (1L, Multimodal.synthesizeMp4Track(1L)),
      (2L, "not an mp4".getBytes),
      (3L, badStsc))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (id, b) =>
        Row(id, b, Row("video/mp4", b.length.toLong, "x")) }),
      Multimodal.mediaSchema)
    val out = Multimodal.extractMp4Samples(df).collect()
      .map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out == Map(0L -> true, 1L -> true, 2L -> true, 3L -> true))
  }

  test("ivfPqTopK with a prebuilt index equals the self-contained search") {
    // Encode once, probe many — the production index lifecycle. The
    // prebuilt artifact must reproduce the gate result bit-for-bit, and
    // a shape-mismatched index must be rejected, not silently mis-probed.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    def run(idx: Option[(org.apache.spark.sql.DataFrame,
        Array[Array[Long]], Array[Array[Array[Long]]])]) =
      Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
          nCells = 4, nProbe = 2, m = 4, kCent = 8, indexOf = idx)
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val idx = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    assert(run(Some(idx)) == run(None))
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
        nCells = 8, nProbe = 2, m = 4, kCent = 8, indexOf = Some(idx))
    }
  }

  test("PQ-family operators reject degenerate shape arguments loudly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    // kCent=0 / m=0 used to surface as a bare NoSuchElementException from
    // seed.head inside defaultCodebook — contract errors instead.
    intercept[IllegalArgumentException] {
      Similarity.pqCodes(e, "vec_id", "embedding", m = 4, kCent = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(e, q, "vec_id", "embedding", k = 5, m = 0, kCent = 8)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
        nCells = 4, nProbe = 5, m = 4, kCent = 8)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
        nCells = 4, nProbe = 2, m = 4, kCent = 0)
    }
  }
}
