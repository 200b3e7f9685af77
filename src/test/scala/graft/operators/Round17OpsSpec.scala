package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-17 operator specs: HyperBall closeness centrality (g32) and
  * the shared linear-counting constant table, grouped token drift
  * (t24), the durable-index upsert cadence (s27), snapshot-aware
  * compaction + retention GC (b11), and the per-micro-batch pruned
  * streaming ANN serve (st23b).
  */
class Round17OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // ---- g32 HyperBall closeness ----

  /** Exact out-ball of vertex v on the 1->2->3->4 chain. */
  private def chainBall(v: Long, r: Int): Set[Long] =
    (v to math.min(v + r, 4L)).toSet

  /** Driver replay of the corrected per-vertex ball-size micros (p=4)
    * — shared by the closeness and Lin lattice-replay tests so the
    * correction discipline lives in ONE place.
    */
  private def ballMicros(members: Set[Long]): Long = {
    val p = 4; val m = 16; val sBits = 60 - p + 1
    val regs = members.groupBy(u => Sampling.hash60OfString(u.toString) & 15)
      .map { case (_, ms) => ms.map { u =>
        val w = Sampling.hash60OfString(u.toString) >>> p
        sBits - (if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w))
      }.max }
    val sumScaled = regs.map(r => 1L << (sBits - r)).sum +
      (m - regs.size).toLong * (1L << sBits)
    val nZero = m - regs.size
    val raw = BigDecimal(0.673 * 16.0 * 16.0 * math.pow(2.0, sBits) /
      sumScaled.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val corr = if (nZero > 0 && raw <= 40.0)
      graft.algorithms.HyperBall.lcConstants(4)(nZero - 1)
    else raw
    math.round(corr * 1000000.0)
  }

  test("lcConstants match the former plan-side round(m*ln(m/z), 6) " +
      "exactly; SQL CASE renders every arm") {
    val cs = graft.algorithms.HyperBall.lcConstants(4)
    assert(cs.length == 16)
    (1 to 16).foreach { z =>
      val want = BigDecimal(16.0 * math.log(16.0 / z))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cs(z - 1) == want, s"z=$z")
    }
    assert(cs(15) == 0.0) // ln(1): a full-zero row corrects to m*0
    val sql = graft.algorithms.HyperBall.lcCorrectionSql(4, "n_zero")
    assert((1 to 16).forall(z => sql.contains(s"WHEN $z THEN ")))
  }

  test("closenessCentrality == the exact-ball t-weighted lattice replay " +
      "on a chain; sink vertex reads zero; harmonic/closeness ordering " +
      "agrees on the chain") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val vertices = Seq(1L, 2L, 3L, 4L)
    val g = graft.graph.GraphFrame(
      vertices.toDF("id"), edges.toDF("src", "dst"))
    val got = g.hyperBall.radius(3).precision(4).closenessCentrality()
      .as[(Long, Long)].collect().toMap

    val want = vertices.map { v =>
      val b = (0 to 3).map(t => ballMicros(chainBall(v, t)))
      v -> (1L * (b(1) - b(0)) + 2L * (b(2) - b(1)) + 3L * (b(3) - b(2)))
    }.toMap
    assert(got == want)
    // Vertex 4 has no out-edges: every shell is empty -> distance sum 0.
    assert(got(4L) == 0L)
    // On the chain, deeper reach => larger truncated distance sum.
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L))
  }

  // ---- t24 grouped drift ----

  test("groupedDriftTv obeys the group-isolation law: each row == " +
      "corpusDriftTv on that group's documents alone") {
    import graft.text.TextFunctions
    // Three groups: mixed slices, one B-heavy, one present in slice A
    // ONLY (its slice-B totals must read absent, not zero-divide).
    // ... plus a NULL category: a real group on a mixing dashboard (a
    // plain equi-join would silently drop it — the st26 lesson).
    val docs = Seq(
      ("g1", "0", "the cat sat"), ("g1", "1", "the cat ran far"),
      ("g1", "0", "dog days"), ("g2", "1", "red blue blue"),
      ("g2", "0", "red"), ("g3", "0", "lonely side alpha"),
      (null, "0", "nul nul one"), (null, "1", "nul two")
    ).toDF("src", "half", "text")
    val got = TextFunctions.groupedDriftTv(
        docs, "src", "half", "text", "0", "1")
      .as[(Option[String], Long, Long)].collect()
      .map { case (g, n, tv) => g -> ((n, tv)) }.toMap
    val want = (Seq("g1", "g2", "g3").map(Option(_)) :+ None).map { g =>
      val slice = g.map(v => docs.filter($"src" === v))
        .getOrElse(docs.filter($"src".isNull))
      val row = TextFunctions.corpusDriftTv(
          slice, "half", "text", "0", "1")
        .as[(Long, Long)].head()
      g -> row
    }.toMap
    assert(got == want)
    // The A-only group drifts by exactly its own full rate mass.
    assert(got(Some("g3"))._2 > 0L)
    // The NULL group is present, isolated, and nonzero (its halves differ).
    assert(got(None)._2 > 0L)
  }

  // ---- s27 durable upsert cadence ----

  test("durable remove -> compact -> re-add cadence round-trips to the " +
      "in-session upsert; pre-compact re-add stays loud") {
    val dim = 8
    def vec(id: Long, bump: Double) =
      (0 until dim).map(j => ((id * 31 + j * 7) % 50).toDouble / 10.0 + bump)
    val corpus = (1L to 40L).map(i => (i, vec(i, 0.0))).toDF("vec_id", "embedding")
    val existing = corpus.filter($"vec_id" % 4 =!= 0)
    val idx = Similarity.ivfPqIndex(existing, "vec_id", "embedding",
      nCells = 2, m = 2, kCent = 4)
    Similarity.ivfPqSave(idx, "r17_upsert_idx", numBuckets = 2)
    val delta = corpus.filter($"vec_id" % 4 === 0)
      .unionByName((1L to 40L).filter(_ % 8 == 1)
        .map(i => (i, vec(i, 1.0))).toDF("vec_id", "embedding"))
    Similarity.ivfPqRemoveFromTable(
      delta.select($"vec_id"), "r17_upsert_idx", "vec_id")
    // The log is pending: a direct re-add must refuse (it would vanish
    // at read time behind the anti-join).
    val loud = intercept[IllegalArgumentException] {
      Similarity.ivfPqAddToTable(delta, "r17_upsert_idx",
        "vec_id", "embedding")
    }
    assert(loud.getMessage.contains("compact"))
    Similarity.ivfPqCompact(spark, "r17_upsert_idx")
    Similarity.ivfPqAddToTable(delta, "r17_upsert_idx",
      "vec_id", "embedding")
    val queries = corpus.filter($"vec_id" <= 3L)
    val got = Similarity.ivfPqSearchTable(queries, "r17_upsert_idx",
        "vec_id", "embedding", k = 4, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val want = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        k = 4, nCells = 2, nProbe = 1, m = 2, kCent = 4,
        indexOf = Some(Similarity.ivfPqUpsert(idx, delta,
          "vec_id", "embedding")))
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  // ---- b11 snapshot retention + GC ----

  test("expireSnapshot GCs retained files only once no live snapshot " +
      "pins them; the retained dir disappears when empty") {
    import graft.sources.BucketedTables
    val gen = (lo: Long, hi: Long) =>
      (lo to hi).map(i => (i, i * 10)).toDF("id", "v")
    BucketedTables.writeBucketed(gen(1, 8), "r17_gc", 2, Seq("id"))
    BucketedTables.snapshot(spark, "r17_gc", "a")
    BucketedTables.appendBucketed(gen(9, 12), "r17_gc")
    BucketedTables.snapshot(spark, "r17_gc", "b")
    BucketedTables.compactTable(spark, "r17_gc")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("r17_gc")).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retained = new org.apache.hadoop.fs.Path(
      loc.getParent, "r17_gc__retained")
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty,
      "compaction should have retained the pinned files")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    // Expiring 'a' deletes nothing: every file it pins, 'b' pins too
    // (b was taken after a, over a superset of files).
    val before = fs.listStatus(retained).length
    BucketedTables.expireSnapshot(spark, "r17_gc", "a")
    assert(fs.listStatus(retained).length == before)
    assert(BucketedTables.snapshotTags(spark, "r17_gc") == Seq("b"))
    assert(ids(BucketedTables.readSnapshot(spark, "r17_gc", "b")) ==
      (1L to 12L))
    // Expiring 'b' releases the last pins: retained dir is GCed away.
    BucketedTables.expireSnapshot(spark, "r17_gc", "b")
    assert(!fs.exists(retained))
    assert(ids(spark.table("r17_gc")) == (1L to 12L))
    // Expiring a snapshot that does not exist stays loud.
    val e = intercept[IllegalArgumentException] {
      BucketedTables.expireSnapshot(spark, "r17_gc", "zz")
    }
    assert(e.getMessage.contains("no snapshot"))
  }

  // ---- st23b per-micro-batch pruned streaming serve ----

  test("streamingIvfPqServeTable prunes EVERY micro-batch's scan to its " +
      "probed buckets and matches the batch serving path") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = 8
    def vec(id: Long, bump: Double) =
      (0 until dim).map(j => ((id * 31 + j * 7) % 50).toDouble / 10.0 + bump)
    val corpus = (1L to 40L).map(i => (i, vec(i, 0.0)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 2, m = 2, kCent = 4)
    Similarity.ivfPqSave(idx, "r17_serve_idx", numBuckets = 2)
    val input = MemoryStream[(Long, Seq[Double])]
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val prunes = scala.collection.mutable.Buffer.empty[(Int, Int)]
    val served = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
    val q = graft.streaming.Streams.streamingIvfPqServeTable(
        input.toDF().toDF("vec_id", "embedding"),
        "r17_serve_idx", "vec_id", "embedding", k = 4, nProbe = 1) {
        (res, _) =>
          val m = sel.findFirstMatchIn(
            res.queryExecution.executedPlan.toString)
          assert(m.isDefined, "no bucket pruning in the batch plan")
          prunes += ((m.get.group(1).toInt, m.get.group(2).toInt))
          served ++= res.select("query_id", "rank", "neighbor_id")
            .as[(Long, Long, Long)].collect()
      }.start()
    try {
      input.addData((1L, vec(1L, 0.0)))
      q.processAllAvailable()
      input.addData((2L, vec(2L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    // Two non-empty batches served, each reading ONLY its probed
    // buckets (nProbe=1 of 2 cells -> strictly fewer than total).
    assert(prunes.size == 2 && prunes.forall { case (g, t) =>
      t == 2 && g < t }, s"per-batch pruning missing: $prunes")
    // Stream == batch: the drained union equals the batch serving path
    // over the same query set.
    val want = Similarity.ivfPqSearchTable(
        corpus.filter($"vec_id" <= 2), "r17_serve_idx",
        "vec_id", "embedding", k = 4, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(served.toSet == want)
  }

  // ---- b12 snapshot delta ----

  test("readSnapshotDelta reads exactly the appended rows; same-tag " +
      "delta empty; compaction between pins fails loud") {
    import graft.sources.BucketedTables
    val gen = (lo: Long, hi: Long) =>
      (lo to hi).map(i => (i, i * 10)).toDF("id", "v")
    BucketedTables.writeBucketed(gen(1, 10), "r17_delta", 2, Seq("id"))
    BucketedTables.snapshot(spark, "r17_delta", "t1")
    BucketedTables.appendBucketed(gen(11, 16), "r17_delta")
    BucketedTables.snapshot(spark, "r17_delta", "t2")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    assert(ids(BucketedTables.readSnapshotDelta(
      spark, "r17_delta", "t1", "t2")) == (11L to 16L))
    // Same tag: legally empty, schema intact.
    val empty = BucketedTables.readSnapshotDelta(
      spark, "r17_delta", "t1", "t1")
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("id", "v"))
    // A compaction between the pins re-homes rows: the file-level law
    // breaks, and the read must refuse rather than return a wrong delta.
    BucketedTables.compactTable(spark, "r17_delta")
    BucketedTables.snapshot(spark, "r17_delta", "t3")
    val e = intercept[IllegalArgumentException] {
      BucketedTables.readSnapshotDelta(spark, "r17_delta", "t1", "t3")
    }
    assert(e.getMessage.contains("append-ordered"))
  }

  test("linCentrality == the exact-ball replay on a chain; sink takes " +
      "the defined value 1; mid-chain vertices outrank the sink") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val vertices = Seq(1L, 2L, 3L, 4L)
    val g = graft.graph.GraphFrame(
      vertices.toDF("id"), edges.toDF("src", "dst"))
    val got = g.hyperBall.radius(3).precision(4).linCentrality()
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    val want = vertices.map { v =>
      val b = (0 to 3).map(t => ballMicros(chainBall(v, t)))
      val cb = 1L * (b(1) - b(0)) + 2L * (b(2) - b(1)) + 3L * (b(3) - b(2))
      val lin = if (cb == 0L) 1.0
        else BigDecimal(b(3).toDouble * b(3).toDouble /
          (cb.toDouble * 1000000.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      v -> ((b(3), cb, lin))
    }.toMap
    assert(got == want)
    // Sink: reaches only itself -> the defined value 1.
    assert(got(4L)._3 == 1.0)
  }

  // ---- g34 incremental WCC ----

  test("incremental WCC == full recompute on random graphs across " +
      "splits: bridging deltas, internal deltas, brand-new vertices") {
    import graft.algorithms.ConnectedComponents
    val rnd = new scala.util.Random(1717)
    for (trial <- 1 to 4) {
      val n = 40 + trial * 10
      val all = (1 to (n * 3 / 2)).map(_ =>
        (rnd.nextInt(n).toLong + 1L, rnd.nextInt(n).toLong + 1L))
        .filter { case (a, b) => a != b } ++
        // Edges reaching OUTSIDE [1, n]: vertices the base never sees.
        Seq((1L, (n + 5).toLong), ((n + 5).toLong, (n + 6).toLong))
      val edges = all.toDF("src", "dst")
      val isDelta = (e: (Long, Long)) => (e._1 + e._2) % 3 == 0
      val base = all.filterNot(isDelta).toDF("src", "dst")
      val delta = all.filter(isDelta).toDF("src", "dst")
      val prev = graft.graph.GraphFrame.fromEdges(base)
        .connectedComponents.run().components
      val got = ConnectedComponents.incremental(prev, delta)
        .as[(Long, Long)].collect().toSet
      val want = graft.graph.GraphFrame.fromEdges(edges)
        .connectedComponents.run().components
        .as[(Long, Long)].collect().toSet
      assert(got == want, s"trial $trial diverged")
    }
    // Empty-contraction path: a delta internal to one component.
    val base2 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val prev2 = graft.graph.GraphFrame.fromEdges(base2)
      .connectedComponents.run().components
    val got2 = ConnectedComponents.incremental(
        prev2, Seq((1L, 3L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(got2 == Set((1L, 1L), (2L, 1L), (3L, 1L)))
    // Malformed label frame refused loudly.
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.incremental(
        Seq((1L, 1L)).toDF("id", "label"), base2)
    }
    assert(e.getMessage.contains("component"))
  }

  // ---- q36 nearest as-of ----

  test("nearestInTime hand case: closer-after beats farther-before, " +
      "equidistant tie goes backward, tolerance excludes, null-t probe " +
      "matches nothing, exact-t wins at distance zero") {
    import graft.operators.AsOfJoin
    val build = Seq((1L, 10L, "b10"), (1L, 20L, "b20"), (1L, 100L, "b100"))
      .toDF("k", "t", "pay")
    val probe = Seq(
      (1L, Some(18L)),  // |18-20|=2 < |18-10|=8 -> b20 (closer after)
      (1L, Some(15L)),  // |15-10| == |15-20| == 5 -> b10 (tie backward)
      (1L, Some(20L)),  // exact -> b20 at distance 0
      (1L, Some(70L)),  // |70-100|=30 > tol=25; |70-20|=50 > tol -> none
      (1L, None),       // null t -> none
      (2L, Some(15L))   // no build rows for key 2 -> none
    ).toDF("k", "t")
    val got = AsOfJoin.nearestInTime(probe, build, "k", "t",
        Seq("k", "t"), Seq("pay"), tolerance = Some(25L))
      .as[(Long, Option[Long], Option[String], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (1L, Some(18L), Some("b20"), Some(20L)),
      (1L, Some(15L), Some("b10"), Some(10L)),
      (1L, Some(20L), Some("b20"), Some(20L)),
      (1L, Some(70L), None, None),
      (1L, None, None, None),
      (2L, Some(15L), None, None)))
    // Timestamp time columns refuse loudly (the distance is arithmetic).
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nearestInTime(
        probe.withColumn("t", col("t").cast("timestamp")),
        build.withColumn("t", col("t").cast("timestamp")),
        "k", "t", Seq("k"), Seq("pay"))
    }
    assert(e.getMessage.contains("NUMERIC"))
  }

  test("nearestInTime == brute-force |dt|-argmin on fuzz with " +
      "collisions, with and without tolerance") {
    import graft.operators.AsOfJoin
    val rnd = new scala.util.Random(3636)
    val build = (1 to 120).map(_ =>
      (rnd.nextInt(6).toLong, rnd.nextInt(200).toLong))
      .distinct.map { case (k, t) => (k, t, s"p$k-$t") }
    val probe = (1 to 200).map(i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(220).toLong, i.toLong))
    val bDf = build.toDF("k", "t", "pay")
    val pDf = probe.toDF("k", "t", "pid")
    for (tol <- Seq(None, Some(15L))) {
      val got = AsOfJoin.nearestInTime(pDf, bDf, "k", "t",
          Seq("pid"), Seq("pay"), tolerance = tol)
        .as[(Long, Option[String], Option[Long])].collect().toSet
      val want = probe.map { case (k, t, pid) =>
        val cands = build.filter(b => b._1 == k &&
          tol.forall(x => math.abs(b._2 - t) <= x))
        if (cands.isEmpty) (pid, None, None)
        else {
          val best = cands.minBy(b => (math.abs(b._2 - t), b._2))
          (pid, Some(best._3), Some(best._2))
        }
      }.toSet
      assert(got == want, s"tol=$tol diverged")
    }
  }

  test("closenessCentrality radius guard refuses past the lattice bound") {
    val g = graft.graph.GraphFrame(
      Seq(1L, 2L).toDF("id"), Seq((1L, 2L)).toDF("src", "dst"))
    val e = intercept[IllegalArgumentException] {
      g.hyperBall.radius(13).precision(4).closenessCentrality()
    }
    assert(e.getMessage.contains("lattice"))
  }
}
