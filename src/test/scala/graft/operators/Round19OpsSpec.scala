package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-19 operator specs: the snapshot re-pin hardened against the
  * r18-ADVICE finding — a FAILING re-pin (the new file set does not
  * validate) must leave the previous snapshot and its retained files
  * intact, so a nightly re-pin cadence never loses its last good
  * snapshot to one bad run.
  */
class Round19OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._
  import graft.sources.BucketedTables

  private def gen(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("id").as[Long].collect().sorted.toSeq

  private def locOf(table: String) = new org.apache.hadoop.fs.Path(
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location)

  test("a FAILING re-pin leaves the old snapshot intact: validation " +
      "(flat layout) runs BEFORE the old same-tag pin is expired") {
    BucketedTables.writeBucketed(gen(1, 8), "r19_repin", 2, Seq("id"))
    BucketedTables.snapshot(spark, "r19_repin", "nightly")
    BucketedTables.appendBucketed(gen(9, 12), "r19_repin")
    // Compaction moves the old pin's files to the retained dir — the
    // state in which expiring the pin is destructive.
    BucketedTables.compactTable(spark, "r19_repin")
    val loc = locOf("r19_repin")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retained = new org.apache.hadoop.fs.Path(
      loc.getParent, "r19_repin__retained")
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty)
    // Break the NEW pin's validation: a subdirectory under the table
    // location fails the flat-layout check.
    val subdir = new org.apache.hadoop.fs.Path(loc, "stray_partition")
    fs.mkdirs(subdir)
    try {
      val e = intercept[IllegalArgumentException] {
        BucketedTables.snapshot(spark, "r19_repin", "nightly")
      }
      assert(e.getMessage.contains("subdirectories"))
    } finally fs.delete(subdir, true)
    // The old pin survived the failed re-pin: manifest still present,
    // retained files not GCed, pinned read still returns the frozen rows.
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty,
      "failed re-pin must not GC the old pin's retained files")
    assert(ids(BucketedTables.readSnapshot(spark, "r19_repin", "nightly")) ==
      (1L to 8L), "the last good snapshot must still read after a bad re-pin")
    // And the cadence recovers: the next (valid) re-pin works as before.
    BucketedTables.snapshot(spark, "r19_repin", "nightly")
    assert(!fs.exists(retained))
    assert(ids(BucketedTables.readSnapshot(spark, "r19_repin", "nightly")) ==
      (1L to 12L))
    BucketedTables.expireSnapshot(spark, "r19_repin", "nightly")
  }

  // ---- deletion-aware incremental maintenance (g37/g38) ----

  private def randomGraph(rnd: scala.util.Random) = {
    val n = 20 + rnd.nextInt(20)
    val m = 60 + rnd.nextInt(120)
    (1 to m).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.toDF("src", "dst")
  }

  test("incremental WCC with deletions == full recompute on random " +
      "graphs: splits, stranded singletons, remove+re-add, absent removals") {
    import graft.graph.GraphFrame
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 6) {
      val all = randomGraph(rnd)
      val bucket = pmod(col("src") + col("dst") * 7, lit(5 + rnd.nextInt(3)))
      val base = all.filter(bucket =!= 0).localCheckpoint()
      val added = all.filter(bucket === 0)
      // Removals: a slice of the base, PLUS a remove+re-add of one
      // added edge (net no-op on that edge — it is not in the base, so
      // removing it must be harmless), a self-loop, and an edge absent
      // from the base entirely — all tolerated by contract.
      val removed = base.filter(bucket === 1)
        .unionByName(added.limit(1))
        .unionByName(Seq((3L, 3L), (900L, 901L)).toDF("src", "dst"))
      val removedCanon = base.filter(bucket === 1)
        .select(least(col("src"), col("dst")).as("l"),
          greatest(col("src"), col("dst")).as("g"))
      val edited = base
        .join(removedCanon,
          least(col("src"), col("dst")) === col("l") &&
            greatest(col("src"), col("dst")) === col("g"), "left_anti")
        .unionByName(added)
      // Vertex universe = base endpoints ∪ added endpoints (removals
      // never drop a vertex).
      val universe = base.select(col("src").as("id"))
        .unionByName(base.select(col("dst").as("id")))
        .unionByName(added.select(col("src").as("id")))
        .unionByName(added.select(col("dst").as("id"))).distinct()
      val fullLabels = GraphFrame.fromEdges(edited)
        .connectedComponents.run().components
        .select(col("id"), col("component").as("c"))
      val full = universe.join(fullLabels, Seq("id"), "left")
        .select(col("id"), coalesce(col("c"), col("id")).as("component"))
      val prev = GraphFrame.fromEdges(base)
        .connectedComponents.run().components
      val inc = graft.algorithms.ConnectedComponents
        .incrementalWithDeletions(prev, base, added, removed)
      val d1 = inc.exceptAll(full).count()
      val d2 = full.exceptAll(inc).count()
      assert(d1 == 0 && d2 == 0,
        s"trial $trial: WCC-with-deletions vs full diverge ($d1/$d2 rows)")
    }
  }

  test("incremental WCC, deletions only (empty additions): a component " +
      "split to singletons composes exactly") {
    import graft.graph.GraphFrame
    // A path 1-2-3-4 plus a disjoint pair 10-11; removing both middle
    // path edges strands 2 and 3 as singletons and splits {1,4}.
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val removed = Seq((2L, 3L), (3L, 4L)).toDF("src", "dst")
    val added = base.limit(0)
    val prev = GraphFrame.fromEdges(base).connectedComponents.run().components
    val inc = graft.algorithms.ConnectedComponents
      .incrementalWithDeletions(prev, base, added, removed)
      .as[(Long, Long)].collect().toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      10L -> 10L, 11L -> 10L))
  }

  test("incremental triangle counts with deletions == full recompute on " +
      "random graphs; cold and warm adjacency paths") {
    import graft.graph.GraphFrame
    val rnd = new scala.util.Random(38)
    for (trial <- 1 to 6) {
      val all = randomGraph(rnd)
      val bucket = pmod(col("src") + col("dst") * 7, lit(5 + rnd.nextInt(3)))
      val base = all.filter(bucket =!= 0).localCheckpoint()
      val added = all.filter(bucket === 0)
        // remove+re-add the same edge within one delta: net no-op.
        .unionByName(base.filter(bucket === 1).limit(1))
      val removed = base.filter(bucket === 1)
        .unionByName(Seq((3L, 3L), (900L, 901L)).toDF("src", "dst"))
      val removedCanon = base.filter(bucket === 1)
        .select(least(col("src"), col("dst")).as("l"),
          greatest(col("src"), col("dst")).as("g"))
      val edited = base
        .join(removedCanon,
          least(col("src"), col("dst")) === col("l") &&
            greatest(col("src"), col("dst")) === col("g"), "left_anti")
        .unionByName(added)
      val vertices = base.select(col("src").as("id"))
        .unionByName(base.select(col("dst").as("id")))
        .unionByName(added.select(col("src").as("id")))
        .unionByName(added.select(col("dst").as("id"))).distinct()
        .localCheckpoint()
      val full = GraphFrame(vertices, edited).triangleCount.run()
      val prev = GraphFrame(vertices, base).triangleCount.run()
      val inc =
        if (trial % 2 == 0) graft.algorithms.TriangleCount
          .incrementalWithDeletions(prev, base, added, removed)
        else graft.algorithms.TriangleCount.incrementalWithDeletions(
          prev, base, added, removed,
          Some(GraphFrame.symmetrizeEdges(base, doDistinct = true)))
      val d1 = inc.exceptAll(full).count()
      val d2 = full.exceptAll(inc).count()
      assert(d1 == 0 && d2 == 0,
        s"trial $trial: tri-with-deletions vs full diverge ($d1/$d2 rows)")
    }
  }

  // ---- warm-start PageRank (g40) ----

  test("warm-start PageRank == cold recompute on the edited graph " +
      "(additions AND removals), to convergence, on random graphs") {
    import graft.graph.GraphFrame
    val rnd = new scala.util.Random(40)
    for (trial <- 1 to 3) {
      val all = randomGraph(rnd).filter(col("src") =!= col("dst"))
      val bucket = pmod(col("src") + col("dst") * 7, lit(6))
      val base = all.filter(bucket =!= 0).localCheckpoint()
      val edited = all.filter(bucket =!= 1).localCheckpoint() // drop a slice, add the 0-slice
      val prevRaw = GraphFrame.fromEdges(base).pageRank
        .tolerance(1e-9).run().rawMass.localCheckpoint()
      val cold = GraphFrame.fromEdges(edited).pageRank.tolerance(1e-9).run()
      val warm = GraphFrame.fromEdges(edited).pageRank.tolerance(1e-9)
        .warmStart(prevRaw).run()
      def r6(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), round(col("pagerank"), 6).as("p"))
          .as[(Long, Double)].collect().toMap
      val (c, w) = (r6(cold.ranks), r6(warm.ranks))
      assert(c.keySet == w.keySet)
      // Both runs stop within tol of the unique fixed point; at
      // tol=1e-9 the residual bound is ~6e-9, far inside 1e-6.
      val worst = c.map { case (k, v) => math.abs(v - w(k)) }.max
      assert(worst <= 2e-6, s"trial $trial: warm vs cold ranks differ by $worst")
    }
  }

  test("warm-start PageRank from a converged prior over a small delta " +
      "converges in FEWER iterations than the cold run") {
    import graft.graph.GraphFrame
    val rnd = new scala.util.Random(41)
    val n = 40
    val all = (1 to 200).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter(e => e._1 != e._2).toDF("src", "dst").distinct().localCheckpoint()
    // Tiny delta: 3 edges.
    val delta = all.limit(3).localCheckpoint()
    val base = all.exceptAll(delta).localCheckpoint()
    val prevRaw = GraphFrame.fromEdges(base).pageRank
      .tolerance(1e-9).run().rawMass.localCheckpoint()
    val cold = GraphFrame.fromEdges(all).pageRank.tolerance(1e-9).run()
    val warm = GraphFrame.fromEdges(all).pageRank.tolerance(1e-9)
      .warmStart(prevRaw).run()
    assert(warm.iterations < cold.iterations,
      s"warm ${warm.iterations} !< cold ${cold.iterations}")
  }

  test("warm-start PageRank over an UNCHANGED graph from a tighter-" +
      "converged mass terminates in at most 2 iterations") {
    import graft.graph.GraphFrame
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 1L))
      .toDF("src", "dst")
    // The prior's own slack is ~α/(1−α)·tol ≈ 5.7·tol, so a SAME-tol
    // resume legitimately runs a few shrink rounds; a prior converged
    // 100× tighter leaves every residual under the resume tolerance —
    // nobody participates and the loop exits immediately.
    val prev = GraphFrame.fromEdges(edges).pageRank.tolerance(1e-8).run()
    val warm = GraphFrame.fromEdges(edges).pageRank.tolerance(1e-6)
      .warmStart(prev.rawMass).run()
    assert(warm.iterations <= 2,
      s"resume on an unchanged graph took ${warm.iterations} iterations")
  }

  test("triangle deletions only: a triangle losing 2 edges is debited " +
      "ONCE per corner (canonical-triple dedup on the destroy pass)") {
    import graft.graph.GraphFrame
    // Two triangles sharing edge {1,2}: {1,2,3} and {1,2,4}; remove
    // {1,2} and {1,3} — triangle {1,2,3} loses TWO edges (found from
    // both) and must be debited once; {1,2,4} loses one.
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val removed = Seq((2L, 1L), (1L, 3L)).toDF("src", "dst") // one reversed
    val vertices = Seq(1L, 2L, 3L, 4L).toDF("id")
    val prev = GraphFrame(vertices, base).triangleCount.run()
    assert(prev.as[(Long, Long)].collect().toMap ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    val inc = graft.algorithms.TriangleCount.incrementalWithDeletions(
      prev, base, base.limit(0), removed)
      .as[(Long, Long)].collect().toMap
    assert(inc == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("warm-start k-means: resuming yesterday's centroids for b rounds " +
      "== one cold (a+b)-round run (Lloyd purity); k mismatch is loud") {
    val pts = (0L to 63L).map { i =>
      (i, Seq(((i % 4) * 10 + (i % 3)).toFloat, ((i / 16) * 5).toFloat))
    }.toDF("id", "vec")
    val cold = KMeans.fitCentroids(pts, "id", "vec", k = 4, nIter = 3)
    val day1 = KMeans.fitCentroids(pts, "id", "vec", k = 4, nIter = 2)
    val warm = KMeans.fitCentroids(pts, "id", "vec", k = 4, nIter = 1,
      initOpt = Some(day1))
    assert(cold.length == warm.length &&
      cold.zip(warm).forall { case (c, w) => c.sameElements(w) })
    // nIter=0 warm-start is the identity, and the caller's array is
    // NOT mutated by a later resumed round (defensive clone).
    val frozen = day1.map(_.clone())
    val id0 = KMeans.fitCentroids(pts, "id", "vec", k = 4, nIter = 0,
      initOpt = Some(day1))
    KMeans.fitCentroids(pts, "id", "vec", k = 4, nIter = 2,
      initOpt = Some(day1))
    assert(id0.zip(day1).forall { case (a, b) => a.sameElements(b) })
    assert(day1.zip(frozen).forall { case (a, b) => a.sameElements(b) })
    val e = intercept[IllegalArgumentException] {
      KMeans.fitCentroids(pts, "id", "vec", k = 3, nIter = 1,
        initOpt = Some(day1))
    }
    assert(e.getMessage.contains("warm-start"))
  }

  test("warm-start power iteration: resuming yesterday's direction for " +
      "b rounds == one cold (a+b)-round run (purity); guards are loud") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def eig(iters: Int, init: Option[Array[Long]] = None) =
      graft.operators.Spectral
        .topEigenvector(emb, "vec_id", "embedding", iters, init)
        .orderBy("i").collect().map(_.getLong(1))
    val cold3 = eig(3)
    val day1 = eig(2)
    val frozen = day1.clone()
    val warm = eig(1, Some(day1))
    assert(warm.sameElements(cold3),
      "resume(2+1) must be bit-identical to cold(3) — pure function of (G, v)")
    assert(day1.sameElements(frozen), "caller's init array was mutated")
    val eLen = intercept[IllegalArgumentException] {
      eig(1, Some(Array(1000L, 1000L)))
    }
    assert(eLen.getMessage.contains("components"))
    val eScale = intercept[IllegalArgumentException] {
      eig(1, Some(Array.fill(64)(999999L)))
    }
    assert(eScale.getMessage.contains("lattice"))
    val eZero = intercept[IllegalArgumentException] {
      eig(1, Some(Array.fill(64)(0L)))
    }
    assert(eZero.getMessage.contains("zeros"))
  }

  private def embCorpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  test("ivfPqPin: a pin taken with PENDING tombstones keeps excluding " +
      "them after the live table compacts the log away; the live and " +
      "pinned reads serve different generations side by side") {
    import graft.operators.Similarity
    val e = embCorpus
    val idx = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r19_pin_idx", numBuckets = 4)
    // Tombstone the %5==2 ids, then PIN with the log pending.
    Similarity.ivfPqRemoveFromTable(
      e.filter($"vec_id" % 5 === 2).select($"vec_id"),
      "r19_pin_idx", "vec_id")
    Similarity.ivfPqPin(spark, "r19_pin_idx", "serving")
    // Maintenance lands: compaction truncates the log and makes deletes
    // physical; an append changes the live generation's content.
    Similarity.ivfPqCompact(spark, "r19_pin_idx")
    Similarity.ivfPqAddToTable(
      e.filter($"vec_id" % 4 === 0)
        .select(($"vec_id" + 100000L).as("vec_id"),
          $"embedding".cast("array<double>").as("embedding")),
      "r19_pin_idx", "vec_id", "embedding")
    val q = e.filter($"vec_id" <= 3)
    val pinned = resultSet(Similarity.ivfPqSearchPinned(q,
      "r19_pin_idx", "serving", "vec_id", "embedding", k = 5, nProbe = 4))
    // The pinned read equals searching the tombstone-applied original
    // index in-session — the generation's LOGICAL content at pin time.
    val survivors = Similarity.ivfPqRemove(idx,
      e.filter($"vec_id" % 5 === 2).select($"vec_id"), "vec_id")
    val want = resultSet(Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      k = 5, nCells = 4, nProbe = 4, m = 4, kCent = 8,
      indexOf = Some(survivors)))
    assert(pinned === want)
    // The live read sees the appended rows; the pinned one never does.
    val live = Similarity.ivfPqSearchTable(q, "r19_pin_idx",
      "vec_id", "embedding", k = 5, nProbe = 4)
    assert(live.filter($"neighbor_id" >= 100000L).count() > 0)
    assert(!pinned.exists(_._2 >= 100000L))
  }

  test("ivfPqPin coherence: a data pin re-pinned to a DIFFERENT " +
      "generation fails loud at load; a deleted data pin fails loud; " +
      "unpin releases the sidecar, the snapshot and the retained files") {
    import graft.operators.Similarity
    import graft.sources.BucketedTables
    val e = embCorpus
    val idx = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r19_pinm_idx", numBuckets = 4)
    Similarity.ivfPqPin(spark, "r19_pinm_idx", "night")
    // Maintenance changes the file set, then someone re-pins the DATA
    // tag directly (not through ivfPqPin): the books the sidecar
    // recorded no longer describe what the data pin now points at.
    Similarity.ivfPqAddToTable(
      e.limit(3).select(($"vec_id" + 200000L).as("vec_id"),
        $"embedding".cast("array<double>").as("embedding")),
      "r19_pinm_idx", "vec_id", "embedding")
    BucketedTables.snapshot(spark, "r19_pinm_idx", "night")
    val mismatch = intercept[IllegalArgumentException] {
      Similarity.ivfPqLoadPinned(spark, "r19_pinm_idx", "night")
    }
    assert(mismatch.getMessage.contains("pin mismatch"))
    // Re-pin properly; serve works; then kill the data snapshot directly
    // — the load names the divergence instead of scanning nothing.
    Similarity.ivfPqPin(spark, "r19_pinm_idx", "night")
    assert(Similarity.ivfPqSearchPinned(e.filter($"vec_id" === 1),
      "r19_pinm_idx", "night", "vec_id", "embedding",
      k = 3, nProbe = 2).count() === 3)
    BucketedTables.expireSnapshot(spark, "r19_pinm_idx", "night")
    val gone = intercept[IllegalArgumentException] {
      Similarity.ivfPqLoadPinned(spark, "r19_pinm_idx", "night")
    }
    assert(gone.getMessage.contains("diverged"))
    // Unpin tolerates the half-diverged state and cleans up fully.
    Similarity.ivfPqUnpin(spark, "r19_pinm_idx", "night")
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(
        "r19_pinm_idx__gen_night")))
    // A full pin → compact (files re-home to the retained dir) → unpin
    // cycle leaves no retained directory behind.
    Similarity.ivfPqPin(spark, "r19_pinm_idx", "night")
    Similarity.ivfPqCompact(spark, "r19_pinm_idx")
    val loc = locOf("r19_pinm_idx")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retained = new org.apache.hadoop.fs.Path(
      loc.getParent, "r19_pinm_idx__retained")
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty)
    Similarity.ivfPqUnpin(spark, "r19_pinm_idx", "night")
    assert(!fs.exists(retained))
    assert(BucketedTables.snapshotTags(spark, "r19_pinm_idx").isEmpty)
  }
}
