package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame

/** Round-19 streaming specs: the incremental-graph maintenance loops at
  * ingest — st30 (WCC labels) and st31 (triangle counts + adjacency).
  * The batch-composition exactness is already fuzz-pinned on the batch
  * operators; these pin the STREAMING claims: exact intermediate state
  * after every micro-batch (not just at drain), duplicate edges across
  * batches are no-ops, and the adjacency grows by truly-new edges only.
  */
class Round19StreamsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def fullWcc(edges: Seq[(Long, Long)]) =
    GraphFrame.fromEdges(edges.toDF("src", "dst"))
      .connectedComponents.run().components
      .as[(Long, Long)].collect().toMap

  test("streamingWccMaintain: labels table is the EXACT min-member WCC " +
      "after every micro-batch; cross-batch merges and dup edges compose") {
    implicit val sqlCtx = spark.sqlContext
    Streams.initWccLabelsTable(spark, "r19_wcc_labels")
    val input = MemoryStream[(Long, Long)]
    val q = Streams.streamingWccMaintain(
      input.toDF().toDF("src", "dst"), "r19_wcc_labels").start()
    def labels: Map[Long, Long] = {
      spark.catalog.refreshTable("r19_wcc_labels")
      spark.table("r19_wcc_labels").as[(Long, Long)].collect().toMap
    }
    try {
      // Batch 1: two separate chains.
      input.addData((1L, 2L), (3L, 4L))
      q.processAllAvailable()
      assert(labels == fullWcc(Seq((1L, 2L), (3L, 4L))))
      // Batch 2: a bridging edge MERGES the chains (the composition
      // case a per-batch-only view cannot get right), plus a dup of an
      // already-ingested edge (must be a no-op) and a new component.
      input.addData((2L, 3L), (1L, 2L), (10L, 11L))
      q.processAllAvailable()
      val all = Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L))
      assert(labels == fullWcc(all))
      assert(labels(4L) == 1L, "merged chain must take the min member id")
      // Batch 3: an edge landing entirely inside an existing component
      // changes nothing.
      input.addData((1L, 4L))
      q.processAllAvailable()
      assert(labels == fullWcc(all))
    } finally q.stop()
  }

  test("streamingTriangleMaintain: counts equal the full recompute after " +
      "every batch; the adjacency grows by truly-new edges only") {
    implicit val sqlCtx = spark.sqlContext
    Streams.initTriangleTables(spark, "r19_tri_counts", "r19_tri_adj")
    val input = MemoryStream[(Long, Long)]
    val q = Streams.streamingTriangleMaintain(
      input.toDF().toDF("src", "dst"), "r19_tri_counts", "r19_tri_adj")
      .start()
    def counts: Map[Long, Long] = {
      spark.catalog.refreshTable("r19_tri_counts")
      spark.table("r19_tri_counts").as[(Long, Long)].collect().toMap
    }
    def adjRows: Long = {
      spark.catalog.refreshTable("r19_tri_adj")
      spark.table("r19_tri_adj").count()
    }
    def fullTri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
      new graft.algorithms.TriangleCount(
        GraphFrame(vs, edges.toDF("src", "dst"))).run()
        .as[(Long, Long)].collect().toMap
    }
    try {
      // Batch 1: a wedge — no triangle yet.
      input.addData((1L, 2L), (2L, 3L))
      q.processAllAvailable()
      assert(counts.values.forall(_ == 0L))
      assert(adjRows == 4L)
      // Batch 2: the closing edge creates the triangle ACROSS batches,
      // a reversed duplicate of an ingested edge is a no-op (adjacency
      // must not grow for it), and a second wedge seeds the next close.
      input.addData((3L, 1L), (2L, 1L), (3L, 4L), (4L, 5L))
      q.processAllAvailable()
      val e2 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      assert(counts == fullTri(e2))
      assert(counts(1L) == 1L && counts(4L) == 0L)
      assert(adjRows == 10L, "reversed dup must not grow the adjacency")
      // Batch 3: close the second wedge — triangle {3,4,5}.
      input.addData((5L, 3L))
      q.processAllAvailable()
      val e3 = e2 :+ (5L, 3L)
      assert(counts == fullTri(e3))
      assert(counts(3L) == 2L)
      assert(adjRows == 12L)
    } finally q.stop()
  }

  test("streamingWccMaintainCdc: a takedown SPLITS the component at " +
      "ingest; re-adding the edge resurrects its tombstone and re-merges") {
    implicit val sqlCtx = spark.sqlContext
    Streams.initWccCdcTables(spark, "r19_cdc_labels", "r19_cdc_edges",
      "r19_cdc_tombs")
    val input = MemoryStream[(Long, Long, String)]
    val q = Streams.streamingWccMaintainCdc(
      input.toDF().toDF("src", "dst", "op"), "r19_cdc_labels",
      "r19_cdc_edges", "r19_cdc_tombs").start()
    def labels: Map[Long, Long] = {
      spark.catalog.refreshTable("r19_cdc_labels")
      spark.table("r19_cdc_labels").as[(Long, Long)].collect().toMap
    }
    def tombRows: Long = {
      spark.catalog.refreshTable("r19_cdc_tombs")
      spark.table("r19_cdc_tombs").count()
    }
    try {
      // Batch 1: a path 1-2-3-4.
      input.addData((1L, 2L, "add"), (2L, 3L, "add"), (3L, 4L, "add"))
      q.processAllAvailable()
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      // Batch 2: takedown of the middle edge — the component SPLITS at
      // ingest (this is what the additions-only loop cannot do).
      input.addData((2L, 3L, "remove"))
      q.processAllAvailable()
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      assert(tombRows == 1L)
      // Batch 3: the edge comes back (reversed) — the tombstone is
      // RESURRECTED (dropped, not shadowed by a duplicate log row) and
      // the components re-merge.
      input.addData((3L, 2L, "add"))
      q.processAllAvailable()
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      assert(tombRows == 0L,
        "re-add must drop the tombstone, not mask it")
      // Batch 4: remove it AGAIN — if batch 3 had appended a shadow log
      // row, this tombstone would kill only one copy and the split
      // would not happen.
      input.addData((2L, 3L, "remove"))
      q.processAllAvailable()
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    } finally q.stop()
  }

  test("streamingTriangleMaintainCdc: a takedown debits the destroyed " +
      "triangle at ingest; re-add re-credits without duplicating the log") {
    implicit val sqlCtx = spark.sqlContext
    Streams.initTriangleCdcTables(spark, "r19_ct_counts", "r19_ct_adj",
      "r19_ct_tombs")
    val input = MemoryStream[(Long, Long, String)]
    val q = Streams.streamingTriangleMaintainCdc(
      input.toDF().toDF("src", "dst", "op"), "r19_ct_counts",
      "r19_ct_adj", "r19_ct_tombs").start()
    def counts: Map[Long, Long] = {
      spark.catalog.refreshTable("r19_ct_counts")
      spark.table("r19_ct_counts").as[(Long, Long)].collect().toMap
    }
    def adjRows: Long = {
      spark.catalog.refreshTable("r19_ct_adj")
      spark.table("r19_ct_adj").count()
    }
    try {
      // Two triangles sharing edge {1,2}.
      input.addData((1L, 2L, "add"), (2L, 3L, "add"), (3L, 1L, "add"),
        (1L, 4L, "add"), (2L, 4L, "add"))
      q.processAllAvailable()
      assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
      assert(adjRows == 10L)
      // Takedown of the shared edge destroys BOTH triangles.
      input.addData((1L, 2L, "remove"))
      q.processAllAvailable()
      assert(counts == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
      assert(adjRows == 10L, "takedown tombstones; the log is not rewritten")
      // Re-add re-creates both; the adjacency log must NOT grow (the
      // edge's rows are already there — resurrect, don't duplicate).
      input.addData((2L, 1L, "add"))
      q.processAllAvailable()
      assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
      assert(adjRows == 10L, "resurrect must not duplicate log rows")
      // And a second takedown still works (no shadow copy survived).
      input.addData((1L, 2L, "remove"))
      q.processAllAvailable()
      assert(counts == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    } finally q.stop()
  }

  test("streamingKCoreMaintainCdc: exact coreness after every batch; a " +
      "takedown lowers cores at ingest; same-batch remove+re-add nets " +
      "present; distant insertions move an untouched vertex's core") {
    implicit val sqlCtx = spark.sqlContext
    Streams.initKCoreCdcTables(spark, "r19_kc_cores", "r19_kc_edges",
      "r19_kc_tombs")
    val input = MemoryStream[(Long, Long, String)]
    val q = Streams.streamingKCoreMaintainCdc(
      input.toDF().toDF("src", "dst", "op"), "r19_kc_cores",
      "r19_kc_edges", "r19_kc_tombs").start()
    def cores: Map[Long, Long] = {
      spark.catalog.refreshTable("r19_kc_cores")
      spark.table("r19_kc_cores").as[(Long, Long)].collect().toMap
    }
    try {
      // Batch 1: the star 0-{1,2,3} — a 1-core everywhere.
      input.addData((0L, 1L, "add"), (0L, 2L, "add"), (0L, 3L, "add"))
      q.processAllAvailable()
      assert(cores == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
      // Batch 2: the leaf triangle lands — K4, core 3 everywhere. The
      // CENTER had no incident change (the g41 star counterexample,
      // now exercised through the streaming warm seed).
      input.addData((1L, 2L, "add"), (1L, 3L, "add"), (2L, 3L, "add"))
      q.processAllAvailable()
      assert(cores == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
      // Batch 3: takedown of one clique edge — the 3-core dissolves
      // ENTIRELY at ingest (K4 minus an edge: the two degree-2 vertices
      // peel and strand the rest — every core drops to 2, including the
      // two untouched vertices; deletions are where the warm seed stays
      // tight).
      input.addData((2L, 3L, "remove"))
      q.processAllAvailable()
      assert(cores == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
      // Batch 4: remove AND re-add the same edge in one batch — nets
      // to present (removals first, adds after), back to the K4 cores.
      input.addData((0L, 1L, "remove"), (1L, 0L, "add"), (2L, 3L, "add"))
      q.processAllAvailable()
      assert(cores == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
      spark.catalog.refreshTable("r19_kc_tombs")
      assert(spark.table("r19_kc_tombs").count() == 0L,
        "re-adds must resurrect tombstones, not mask them")
    } finally q.stop()
  }

  test("compactCdcEdgeLog: folds tombstones into the log, preserves the " +
      "net edge set, empties tombstones, idempotent, stale re-apply no-op") {
    Streams.initWccCdcTables(spark, "r19_cp_labels", "r19_cp_edges",
      "r19_cp_tombs")
    // Log with a duplicate row and a reversed form of a tombstoned edge:
    // the canonical-pair predicate must kill BOTH orientations/copies.
    Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 4L)).toDF("src", "dst")
      .write.mode("overwrite").saveAsTable("r19_cp_edges")
    Seq((2L, 3L)).toDF("src", "dst")
      .write.mode("overwrite").saveAsTable("r19_cp_tombs")
    def logSet: Set[(Long, Long)] = {
      spark.catalog.refreshTable("r19_cp_edges")
      spark.table("r19_cp_edges").as[(Long, Long)].collect().toSet
    }
    Streams.compactCdcEdgeLog(spark, "r19_cp_edges", "r19_cp_tombs")
    assert(logSet == Set((1L, 2L), (3L, 4L)),
      "both orientations of the tombstoned edge must fold out")
    spark.catalog.refreshTable("r19_cp_tombs")
    assert(spark.table("r19_cp_tombs").count() == 0L)
    // Idempotent.
    Streams.compactCdcEdgeLog(spark, "r19_cp_edges", "r19_cp_tombs")
    assert(logSet == Set((1L, 2L), (3L, 4L)))
    // Crash-window recovery: tombstones already folded re-appear (the
    // log wrote, the tombstone clear did not) — re-running compaction
    // must be a no-op on the log, not resurrect or over-delete.
    Seq((2L, 3L)).toDF("src", "dst")
      .write.mode("overwrite").saveAsTable("r19_cp_tombs")
    Streams.compactCdcEdgeLog(spark, "r19_cp_edges", "r19_cp_tombs")
    assert(logSet == Set((1L, 2L), (3L, 4L)),
      "re-applying an already-folded tombstone must be a no-op")
  }

  test("streamingPageRankMaintain: the raw-mass table after every batch " +
      "equals the manual warm chain through the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    Streams.initPageRankTables(spark, "r19_pr_mass", "r19_pr_edges")
    val input = MemoryStream[(Long, Long)]
    val q = Streams.streamingPageRankMaintain(
      input.toDF().toDF("src", "dst"), "r19_pr_mass", "r19_pr_edges",
      iterations = 2, tol = 1e-9).start()
    def mass: Map[Long, Double] = {
      spark.catalog.refreshTable("r19_pr_mass")
      spark.table("r19_pr_mass").as[(Long, Double)].collect().toMap
    }
    def close(a: Map[Long, Double], b: Map[Long, Double]): Boolean =
      a.keySet == b.keySet &&
        a.forall { case (k, v) => math.abs(v - b(k)) < 1e-12 }
    def manual(edges: Seq[(Long, Long)],
        prev: org.apache.spark.sql.DataFrame) =
      GraphFrame.fromEdges(edges.toDF("src", "dst")).pageRank
        .tolerance(1e-9).maxIterations(2).warmStart(prev).run().rawMass
    val emptyPrev = spark.range(0)
      .select(col("id"), col("id").cast("double").as("pagerank"))
    try {
      val e1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
      input.addData(e1: _*)
      q.processAllAvailable()
      val m1 = manual(e1, emptyPrev)
      assert(close(mass,
        m1.as[(Long, Double)].collect().toMap),
        "batch 1 must equal the cold (g = 0 warm) run")
      // Batch 2 grows the graph; the loop must resume from batch 1's
      // PERSISTED mass (parquet-round-tripped doubles), matching the
      // manual chain resumed from the in-memory frame exactly.
      val e2 = Seq((3L, 4L), (4L, 1L))
      input.addData(e2: _*)
      q.processAllAvailable()
      val m2 = manual(e1 ++ e2, m1)
      assert(close(mass, m2.as[(Long, Double)].collect().toMap),
        "batch 2 must equal the warm chain resumed from batch 1")
    } finally q.stop()
  }
}
