package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Plan-shape assertions (SURVEY §5 layer 5): the optimizations the engine
  * relies on at 100 TB must be visible in the physical plan at any scale —
  * filter pushdown into the parquet scan, column pruning, broadcast of the
  * small join side, and map-side partial aggregation.
  */
class PlanSpec extends AnyFunSuite with SparkTestHarness {

  private val sf = "/root/testdata/sf0.001"

  test("filter is pushed into the parquet scan") {
    val plan = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 50000.0)
      .select("o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,50000.0)]"),
      s"missing pushed filter in:\n$plan")
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val plan = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string>"),
      s"scan reads more than the projection needs:\n$plan")
  }

  test("html extraction is map-only: no exchange, scan reads only doc_id+text") {
    val plan = graft.SparkEntry.queries("t18_html_extract")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"html extraction must not shuffle:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan reads more than doc_id+text:\n$plan")
    // Shared-aux shape: the expensive per-line pass (htmlLineAux — the ONE
    // regexp_extract_all in the kernel) must survive CollapseProject as a
    // single lower-projection expression feeding all three outputs. If the
    // optimizer ever starts inlining it, each output column re-runs the
    // whole block-strip/split/visible chain (the measured 2.2x regression).
    val passes = "regexp_extract_all".r.findAllIn(plan).size
    assert(passes == 1,
      s"per-line aux pass must appear exactly once, found $passes:\n$plan")
  }

  test("group-by aggregation is partial (map-side combine) before the shuffle") {
    val plan = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"no partial aggregation in:\n$plan")
  }

  test("q13 percentiles: both windows and the final agg share ONE shuffle") {
    // row_number (ordered window), count (unordered window) and the
    // terminal groupBy all key on event_type — the plan must hash-exchange
    // once and reuse the partitioning for everything downstream.
    val q = graft.SparkEntry.queries("q13_percentiles")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
  }

  test("label_mode aggregates with map-side partials (the hub-safe LPA shape)") {
    // The whole point of replacing collect_list (no map-side reduction)
    // with the histogram aggregate is that partials combine BEFORE the
    // shuffle — a hub's neighbourhood reduces to per-partition histograms.
    val plan = spark.range(1000)
      .selectExpr("id % 10 AS g", "id % 3 AS v")
      .groupBy("g").agg(graft.functions.LabelModeAgg.label_mode(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_label_mode"),
      s"label_mode not partially aggregated map-side:\n$plan")
  }

  test("cosine top-k broadcasts the query side — corpus is never shuffled") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = Similarity.cosineTopK(e, e.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
    // The corpus side of the scoring join must not be exchanged.
    val joinIdx = plan.indexOf("Broadcast")
    assert(joinIdx >= 0)
    // Top-k is the bounded-heap aggregate with MAP-SIDE partials — never a
    // window (which would shuffle and sort every scored row per query).
    assert(plan.contains("partial_top_k_by_score"),
      s"top-k not partially aggregated map-side:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in top-k plan:\n$plan")
    val sorts = plan.linesIterator.count(_.contains("Sort ["))
    assert(sorts == 0, s"expected no SortExec in top-k plan, got $sorts:\n$plan")
  }

  test("partitioned table: value filter prunes directories at planning time") {
    import graft.sources.PartitionedTables
    val src = spark.range(0, 1000)
      .selectExpr("id", "CASE WHEN id % 4 = 0 THEN 'a' WHEN id % 4 = 1 THEN 'b' " +
        "WHEN id % 4 = 2 THEN 'c' ELSE 'd' END AS part")
    val path = PartitionedTables.writePartitioned(src, "planspec_parted", Seq("part"))
    val filtered = PartitionedTables.readPartitioned(spark, path)
      .filter(col("part") === "a")
    // The partition predicate must reach the scan's PartitionFilters (file
    // planning), not a post-scan Filter over all directories.
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("part#"),
      s"partition filter not pushed to file planning:\n$scan")
    // And pruning is real: the executed scan reads only the matching
    // directory's files (inputFiles ignores partition filters — the
    // post-execution numFiles metric is the honest count).
    // collect() (not count()) so the metric lands on THIS QueryExecution —
    // count() plans and executes a separate aggregate query.
    assert(filtered.collect().length == 250)
    val allFiles = PartitionedTables.readPartitioned(spark, path).inputFiles.length
    val scanExec = filtered.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scanExec.isDefined, "no FileSourceScanExec leaf found")
    val read = scanExec.get.metrics("numFiles").value
    assert(read > 0 && read < allFiles,
      s"no directory pruned: read $read of $allFiles files")
  }

  test("maxsim: partial max bounds the shuffle, heap top-k, no window/sort") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = Similarity.maxSimTopK(e, e.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", "label", 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
    // The group score must combine map-side: the shuffle then carries at
    // most queries x groups rows, not the scored stream.
    assert(plan.contains("partial_max"),
      s"group max not partially aggregated map-side:\n$plan")
    assert(plan.contains("partial_top_k_by_score"),
      s"top-k not partially aggregated map-side:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort [")) == 0,
      s"expected no SortExec:\n$plan")
  }

  test("as-of join: ONE exchange + one in-partition sort, no join node, no replication") {
    // The whole point of the union-tag formulation (AsOfJoin.scala): the
    // plan must be scan+scan -> union -> ONE hash exchange on the key ->
    // ONE in-partition sort -> running-last window — the sort-merge-join
    // cost shape. Any Join node, second Exchange, or per-probe candidate
    // replication means the naive O(n*m) formulation snuck back in.
    import spark.implicits._
    val probe = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "t")
    val build = (1L to 200L).map(i => (i % 50, i * 3, s"v$i")).toDF("k", "t", "v")
    val q = graft.operators.AsOfJoin.lastAtOrBefore(
      probe, build, "k", "t", Seq("k", "t"), Seq("v"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one Exchange:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort [")) == 1,
      s"expected exactly one SortExec:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
    assert(plan.contains("Union"), s"missing union:\n$plan")
  }

  test("nearest as-of: BOTH carries share the one exchange + one sort " +
      "(same partitioning/ordering, two frames, no second pass)") {
    // nearestInTime's cost claim: the backward and forward carries ride
    // the SAME sorted frame — different window FRAMES over identical
    // partition/order collapse into the one exchange + one sort; a
    // second Exchange or SortExec would mean the two directions pay the
    // merge shape twice.
    import spark.implicits._
    val probe = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "t")
    val build = (1L to 200L).map(i => (i % 50, i * 3, s"v$i")).toDF("k", "t", "v")
    val q = graft.operators.AsOfJoin.nearestInTime(
      probe, build, "k", "t", Seq("k", "t"), Seq("v"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one Exchange:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort [")) == 1,
      s"expected exactly one SortExec:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
  }

  test("declared partitioning+ordering checkpoint: SMJ with no exchange, no sort") {
    // The checkpoint both hash-partitions AND sorts within partitions, and
    // declares both on the LogicalRDD — a sort-merge join on the keys must
    // then plan with NO Exchange and NO SortExec on either side (the Spark
    // analogue of the reference's hash-partitioned pre-sorted spill files,
    // hash_partitioned.rs:146-361).
    import org.apache.spark.sql.graft.checkpointing
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val a0 = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "va")
      val b0 = (1L to 1000L).map(i => (i % 89, i)).toDF("k", "vb")
      val a = checkpointing.localCheckpointHashPartitioned(
        a0.repartition(4, col("k")), Seq("k"), 4, eager = true)
      val b = checkpointing.localCheckpointHashPartitioned(
        b0.repartition(4, col("k")), Seq("k"), 4, eager = true)
      val j = a.join(b, "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected exchange in:\n$plan")
      val sorts = plan.linesIterator.count(_.contains("Sort ["))
      assert(sorts == 0, s"expected 0 SortExec, got $sorts in:\n$plan")
      // And the elided plan still computes the right thing.
      val expected = a0.join(b0, "k").count()
      assert(j.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("symmetry-swap keeps the declared layout: swapped join plans exchange-free") {
    // The MIS contraction restores the hash(dst) edge layout by SWAPPING
    // columns (the edge set is symmetric, so the mirror IS the frame, and
    // the mirror of a hash(src) frame is hash(dst) by construction). The
    // partitioning must survive the rename: a join on the swapped frame's
    // dst against an id-declared state frame plans with no exchange and
    // no sort on either side.
    import org.apache.spark.sql.graft.checkpointing
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val e0 = (1L to 500L).flatMap(i => Seq((i % 53, i % 47), (i % 47, i % 53)))
        .toDF("src", "dst")
      val edges = checkpointing.localCheckpointHashPartitioned(
        e0.repartition(4, col("src")), Seq("src"), 4, eager = true)
      val swapped = edges.select(col("dst").as("src"), col("src").as("dst"))
      val state = checkpointing.localCheckpointHashPartitioned(
        (0L to 52L).map(i => (i, 0.5)).toDF("id", "p").repartition(4, col("id")),
        Seq("id"), 4, eager = true)
      val j = swapped.join(state, col("dst") === col("id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected exchange in:\n$plan")
      val sorts = plan.linesIterator.count(_.contains("Sort ["))
      assert(sorts == 0, s"expected 0 SortExec, got $sorts in:\n$plan")
      val expected = e0.select(col("dst").as("src"), col("src").as("dst"))
        .join((0L to 52L).map(i => (i, 0.5)).toDF("id", "p"), col("dst") === col("id")).count()
      assert(j.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("declared-partitioning contract violation fires the guard") {
    import org.apache.spark.sql.graft.checkpointing
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 7, i)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      // Input really has 4 partitions; declaring 8 would silently mis-route
      // rows in any exchange-elided downstream join.
      checkpointing.localCheckpointHashPartitioned(
        df.repartition(4, col("k")), Seq("k"), 8, eager = true)
    }
    assert(ex.getMessage.contains("declared-partitioning contract violated"))
  }

  test("whole-stage codegen covers the custom expression pipeline") {
    // shingle_hashes -> simhash64 and shingle_hashes -> minhash_signature
    // are native expressions: the entire dedup map stage must stay inside
    // one WholeStageCodegen span (the composable higher-order-function
    // formulation is CodegenFallback and breaks the span — that regression
    // is exactly what this guards).
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        graft.functions.TextHashes.simhash64(
          graft.text.TextFunctions.shingleHashes(col("text"), 3)).as("sh"),
        graft.functions.TextHashes.minhashSignature(
          graft.text.TextFunctions.shingleHashes(col("text"), 3), 16).as("sig"),
        graft.text.TextFunctions.fingerprints(col("text"), 3, 4).as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"custom expressions broke codegen:\n$plan")
  }

  test("bm25: query terms broadcast onto the postings — corpus never shuffles for the probe") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = graft.operators.Retrieval.bm25Frame(
      docs, docs.filter(col("doc_id") % 100 === 0), "doc_id", "text", 5,
      1.2, 0.75, identity)
    val plan = q.queryExecution.executedPlan.toString
    // Every join of postings with query-side tables is a broadcast build.
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast probe join:\n$plan")
    assert(plan.contains("partial_top_k_by_score"),
      s"top-k not partially aggregated map-side:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in bm25 plan:\n$plan")
  }

  test("decontaminate: held-out hash set broadcast, per-doc count partial") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = graft.operators.Dedup.decontaminate(
      docs, docs.filter(col("doc_id") % 10 === 7), "doc_id", "text", n = 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"held-out set not broadcast:\n$plan")
    assert(plan.contains("partial_count"), s"count not map-side partial:\n$plan")
  }

  test("kmeans update: one exchange total — k x dim partials, no join back to points") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    // Probe the single-round update plan via the public fit (nIter=1) by
    // checking the flagship invariants on the ASSIGNMENT plan instead: the
    // assignment is a pure projection chain over the scan — no Exchange,
    // no Join, whole-stage codegen.
    val asg = graft.operators.KMeans.fitAssign(e, "vec_id", "embedding", k = 4, nIter = 0)
    val plan = asg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    // codegen'd stages render as "*(n)" in the executed-plan string
    assert(plan.contains("*(1)"), s"assignment fell out of codegen:\n$plan")
  }

  test("rrf fusion: map-side partial sum + heap top-k, no window, no sort") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i % 5, i, i % 7 + 1)).toDF("query_id", "doc_id", "rnk")
    val b = (1L to 100L).map(i => (i % 5, (i * 3) % 90, i % 9 + 1)).toDF("query_id", "doc_id", "rnk")
    val plan = graft.operators.Retrieval.rrfFuse(Seq(a, b), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"rrf sum not map-side partial:\n$plan")
    assert(plan.contains("partial_top_k_by_score"),
      s"top-k not partially aggregated map-side:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort [")) == 0,
      s"expected no SortExec:\n$plan")
  }

  test("pq adc: query tables broadcast, heap top-k, no corpus shuffle before scoring") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.pqTopK(e, e.filter(col("vec_id") <= 3),
        "vec_id", "embedding", k = 5, m = 4, kCent = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"query tables not broadcast:\n$plan")
    assert(plan.contains("partial_top_k_by_score"),
      s"top-k not partially aggregated map-side:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    // The only Exchange allowed is the broadcast + the queries x k heap
    // shuffle — never a corpus-sized hash partitioning before scoring.
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"corpus shuffled before scoring:\n$plan")
  }

  test("ivf-pq: probe tables broadcast onto the code scan, no corpus shuffle") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.ivfPqTopK(e, e.filter(col("vec_id") <= 3),
        "vec_id", "embedding", k = 5, nCells = 4, nProbe = 2, m = 4, kCent = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"probe tables not broadcast:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"cell join must be broadcast-hash (equi-join on cell):\n$plan")
    assert(plan.contains("partial_top_k_by_score"),
      s"top-k not partially aggregated map-side:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    // The only shuffle allowed is the queries x k heap aggregate — the
    // checkpointed code table and the broadcast join never repartition
    // the corpus.
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"corpus shuffled before scoring:\n$plan")
  }

  test("filtered ivf-pq: predicate prunes the index side BELOW the cell join") {
    // The s16 contract: the metadata predicate must land on the index
    // scan (the streamed side of the broadcast cell join), upstream of
    // ADC scoring — never as a post-filter above the ranked top-k, which
    // would break top-k semantics. In the plan tree the Filter therefore
    // prints BELOW (after) the BroadcastHashJoin line, and no label
    // predicate appears above the top-k aggregate.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.ivfPqTopK(e, e.filter(col("vec_id") <= 3),
        "vec_id", "embedding", k = 5, nCells = 4, nProbe = 2, m = 4, kCent = 8,
        indexFilter = Some(col("label") % 2 === 0), metaCols = Seq("label"))
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toIndexedSeq
    val joinAt = lines.indexWhere(_.contains("BroadcastHashJoin"))
    val filterAt = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("label") && l.contains("% 2"))
    assert(joinAt >= 0, s"expected a broadcast cell join:\n$plan")
    assert(filterAt >= 0, s"label predicate missing from the plan:\n$plan")
    assert(filterAt > joinAt,
      s"predicate must sit on the join's input (index side), not above it:\n$plan")
    val aggAt = lines.indexWhere(_.contains("top_k_by_score"))
    assert(aggAt >= 0 && !lines.take(aggAt).exists(l =>
        l.contains("Filter") && l.contains("label")),
      s"predicate must never post-filter the ranked top-k:\n$plan")
  }

  test("motif edge predicate reaches the parquet scan below the join spine") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val edges = li.select(col("l_orderkey").as("src"),
      col("l_partkey").as("dst"), col("l_quantity").as("weight"))
    val vertices = edges.select(col("src").as("id")).union(
      edges.select(col("dst").as("id"))).distinct()
    val plan = graft.graph.Motifs.find(
        vertices, edges, "(a)-[e]->(b); (b)-[e2]->(c)",
        Map("e2" -> (col("weight") > 30.0)))
      .queryExecution.executedPlan.toString
    // The predicate must be pushed through the alias into e2's SCAN —
    // visible as a parquet pushed filter on the SOURCE column (cast-free
    // predicates push all the way into the reader; a cast would stop at
    // a scan-level DataFilter, still below the join) — never applied to
    // assembled paths above the join.
    assert(plan.contains("GreaterThan(l_quantity,30.0)"),
      s"weight predicate not pushed into the parquet scan:\n$plan")
  }

  test("ivf-pq encode stays in whole-stage codegen at production arity") {
    // The residual CASE chain at nCells=32 is a ~2k-node expression tree
    // (32 arms x 64 element_at each) — this pin catches it falling out of
    // codegen (the interpreted-execution cliff class measured at 15x on
    // the PQ argmin) before a corpus-scale run would. The un-checkpointed
    // encode frame is probed directly; the public ivfPqIndex wraps it in
    // a local checkpoint that would hide the plan behind a scanned RDD.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    // 32 cells AND 64 cells: the 64-arity pin is the r15 regression
    // guard — the per-cell CASE residual blew the 64 KB generated-method
    // limit there and the whole stage silently ran interpreted (caught
    // by the ivfpq-add probe); the indexed-literal residual keeps code
    // size O(d) regardless of nCells.
    for (nCells <- Seq(32, 64)) {
      val (encoded, _, _) = Similarity.ivfPqEncode(e, "vec_id", "embedding",
        nCells = nCells, m = 8, kCent = 16)
      val plan = encoded.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
      assert(!plan.contains("Join"), s"encode must not join:\n$plan")
      assert(plan.contains("*(1)"),
        s"encode fell out of codegen at nCells=$nCells:\n$plan")
      // The executed stage must actually COMPILE — a janino 64 KB
      // failure logs an error and silently interprets, which the plan
      // string alone cannot distinguish.
      org.apache.spark.sql.graft.TestCodegenProbe.assertCompiles(encoded)
    }
  }

  test("q17d heavy-hitter probe: heap top-k per group, no window, no sort") {
    val plan = SparkEntry.queries("q17d_cms_grouped_est")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by_score"), s"expected heap top-k:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in q17d plan:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort [")) == 0,
      s"expected no SortExec:\n$plan")
  }

  test("bloom prune: codegen filter on the scan — no join, no exchange") {
    // The probe must be a predicate directly above the fact scan, inside
    // whole-stage codegen — a 16 MB bitset riding as a codegen reference,
    // never a join node. The EXACT join comes later and only sees
    // survivors; the prune stage itself must be shuffle-free.
    val fact = spark.read.parquet(s"$sf/lineitem.parquet")
    val words = graft.operators.RuntimeFilter.bloomBitsetWords(
      spark.read.parquet(s"$sf/orders.parquet"), "o_orderkey", 1 << 16, 3)
    val pruned = graft.operators.RuntimeFilter.bloomPrune(
      fact, "l_orderkey", words, 1 << 16, 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"prune stage shuffles:\n$plan")
    assert(!plan.contains("Join"), s"prune stage joins:\n$plan")
    assert(plan.contains("bloom_contains"), s"probe predicate missing:\n$plan")
    assert(plan.contains("*(1)"), s"probe fell out of codegen:\n$plan")
  }
}
