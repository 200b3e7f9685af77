package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-16 back-half operator specs: priority sampling (p11) and its
  * streaming candidate twin (st24), Resource-Allocation link prediction
  * (g28), the vocabulary coverage curve (t22), and chunk-parallel exact
  * weighted percentiles (q31) — hand-computed cases, the scale-knob
  * invariances (chunkWidth, arrival order), the loud guards, and the
  * config matrix.
  */
class Round16bOpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // ---- p11 priority sampling ----

  /** In-test replay of the operator's exact priority formula. */
  private def prio(seed: String, key: Long, w: Long): Double = {
    val u = Sampling.hash60OfString(s"$seed:$key") + 1L
    w.toDouble / (u.toDouble / (1L << 60).toDouble)
  }

  test("prioritySample matches the hand-replayed DLT construction") {
    val rows = (1L to 40L).map(i => (i, 10L + (i * 7) % 50))
    val df = rows.toDF("doc_id", "w")
    val k = 5
    val got = Sampling.prioritySample(df, "doc_id", "w", k, "s16b")
      .select("doc_id", "weight", "priority", "est_weight")
      .as[(Long, Long, Double, Double)].collect().toSet

    val scored = rows.map { case (id, w) => (id, w, prio("s16b", id, w)) }
      .sortBy { case (id, _, q) => (-q, id) }
    val tau = scored(k)._3 // (k+1)-th priority, 0-indexed
    val want = scored.take(k)
      .map { case (id, w, q) => (id, w, q, math.max(w.toDouble, tau)) }
      .toSet
    assert(got == want)
    // tau must actually bite for at least one kept row (est > w) —
    // otherwise the estimator leg of the gate is vacuous.
    assert(got.exists { case (_, w, _, est) => est > w.toDouble })
  }

  test("prioritySample with n <= k keeps everything with est_weight = w") {
    val df = Seq((1L, 5L), (2L, 7L), (3L, 11L)).toDF("doc_id", "w")
    val got = Sampling.prioritySample(df, "doc_id", "w", k = 8, "s16b")
      .select("doc_id", "weight", "est_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 5L, 5.0), (2L, 7L, 7.0), (3L, 11L, 11.0)))
  }

  test("prioritySample rejects non-positive weights loudly") {
    val df = Seq((1L, 5L), (2L, 0L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      Sampling.prioritySample(df, "doc_id", "w", k = 1, "s16b").collect()
    }
    assert(e.getMessage.contains("weights must be >= 1"))
  }

  test("stratifiedPrioritySample: each category == the ungrouped sample " +
      "of its subset; small groups exhaust with est = w") {
    val rows = (1L to 120L).map(i =>
      (s"c${i % 4}", i, 5L + (i * 11) % 60)) ++
      Seq(("tiny", 900L, 7L), ("tiny", 901L, 9L))
    val df = rows.toDF("cat", "doc_id", "w")
    val k = 6
    val got = Sampling.stratifiedPrioritySample(
        df, "cat", "doc_id", "w", k, "s16d")
      .select("cat", "doc_id", "weight", "priority", "est_weight")
      .as[(String, Long, Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t =>
        (t._2, t._3, t._4, t._5)).toSet).toMap
    for (c <- Seq("c0", "c1", "c2", "c3", "tiny")) {
      val want = Sampling.prioritySample(
          df.filter($"cat" === c), "doc_id", "w", k, "s16d")
        .select("doc_id", "weight", "priority", "est_weight")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(got(c) == want, s"category $c diverged from its solo sample")
    }
    // The 2-row category exhausts: both kept, est = w (tau_g = 0).
    assert(got("tiny") == Set((900L, 7L, got("tiny").find(_._1 == 900L).get._3, 7.0),
      (901L, 9L, got("tiny").find(_._1 == 901L).get._3, 9.0)))
  }

  test("streaming stratified priority candidates finalize to the batch " +
      "per-category sample under adversarial arrival orders") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 150L).map(i => (s"c${i % 3}", i, 10L + (i * 17) % 80))
    val k = 5
    val batch = Sampling.stratifiedPrioritySample(
        rows.toDF("cat", "doc_id", "w"), "cat", "doc_id", "w", k, "s16e")
      .collect().map(_.toString).toSet
    val asc = rows.sortBy(r => prio("s16e", r._2, r._3))
    for (order <- Seq(asc, asc.reverse)) {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long, Long)]
      val sink = s"st26_spec_${order.head._2}"
      val q = graft.streaming.Streams.streamingStratifiedPriorityCandidates(
          input.toDF().toDF("cat", "doc_id", "w"), "cat", "doc_id", "w",
          k, "s16e")
        .toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        order.grouped(40).foreach { c =>
          input.addData(c: _*); q.processAllAvailable()
        }
        assert(spark.table(sink).count() <= rows.size)
        val got = Sampling.stratifiedPrioritySample(
            spark.table(sink).select(col("cat"), col("key").as("doc_id"),
              col("weight").as("w")),
            "cat", "doc_id", "w", k, "s16e")
          .collect().map(_.toString).toSet
        assert(got == batch, s"drain starting at ${order.head._2} diverged")
      } finally q.stop()
    }
  }

  // ---- st24 streaming candidate emitter ----

  test("streaming priority candidates finalize to the batch sample " +
      "under adversarial arrival orders") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 60L).map(i => (i, 10L + (i * 13) % 90))
    val k = 6
    val batch = Sampling.prioritySample(
        rows.toDF("doc_id", "w"), "doc_id", "w", k, "s16c")
      .select("doc_id", "weight", "priority", "est_weight")
      .as[(Long, Long, Double, Double)].collect().toSet

    // Ascending-priority arrival is the worst case (every improvement
    // emits); deliver in three batches sorted ascending by the true
    // priority so later batches keep displacing state.
    val asc = rows.sortBy { case (id, w) => prio("s16c", id, w) }
    for (chunks <- Seq(asc.grouped(20).toSeq, asc.reverse.grouped(25).toSeq)) {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      val cand = graft.streaming.Streams.streamingPriorityCandidates(
        input.toDF().toDF("doc_id", "w"), "doc_id", "w", k, "s16c",
        nShards = 4)
      val sink = s"st24_spec_${chunks.head.head._1}_${chunks.size}"
      val q = cand.toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        val drained = spark.table(sink)
          .select(col("key").as("doc_id"), col("weight"), col("priority"))
        // Bounded emission: at most one candidate row per input row.
        assert(spark.table(sink).count() <= rows.size)
        val got = Sampling.priorityFinalize(drained, "doc_id", k)
          .select("doc_id", "weight", "priority", "est_weight")
          .as[(Long, Long, Double, Double)].collect().toSet
        assert(got == batch, s"order ${chunks.size}-chunk drain diverged")
      } finally q.stop()
    }
  }

  // ---- g28 Resource-Allocation link prediction ----

  test("resourceAllocation scores the 4-cycle by hand") {
    // 1-2-3-4-1: candidates (1,3) and (2,4), each with two degree-2
    // shared neighbors -> ra = 2 * (1e12 div 2) = 1e12, cn = 2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = graft.algorithms.LinkPrediction
      .resourceAllocation(edges, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 2L, 1000000000000L),
      (2L, 4L, 2L, 1000000000000L)))
  }

  test("resourceAllocation: adjacency excluded, degrees uncapped, " +
      "hub centers pruned, self-loops dropped") {
    // z(5) connects a(1), b(2), e(3): wedges (1,2),(1,3),(2,3) with
    // deg(z)=3 -> term 333333333333; (1,2) is ALSO an edge -> dropped.
    // Self-loop (5,5) must not inflate deg(z).
    val edges = Seq((5L, 1L), (5L, 2L), (5L, 3L), (1L, 2L), (5L, 5L))
      .toDF("src", "dst")
    val got = graft.algorithms.LinkPrediction
      .resourceAllocation(edges, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    val t = 1000000000000L / 3
    assert(got == Set((1L, 3L, 1L, t), (2L, 3L, 1L, t)))

    // Star hub above the cap: no wedge centers survive -> empty.
    val star = (11L to 20L).map(l => (10L, l)).toDF("src", "dst")
    assert(graft.algorithms.LinkPrediction
      .resourceAllocation(star, topK = 10, degreeCap = 5).isEmpty)
    // At cap >= deg the same star yields all leaf pairs.
    assert(graft.algorithms.LinkPrediction
      .resourceAllocation(star, topK = 1000, degreeCap = 10).count() == 45L)
  }

  // ---- t22 vocabulary coverage ----

  test("vocabCoverage hand case with saturation row") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val got = graft.text.TextFunctions
      .vocabCoverage(docs, "text", Seq(1, 2, 3, 9))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    // counts: a=2, b=2, c=1 (rank ties break on term); total 5.
    assert(got.toSeq == Seq((1, 2L, 5L, 0.4), (2, 4L, 5L, 0.8),
      (3, 5L, 5L, 1.0), (9, 5L, 5L, 1.0)))
  }

  test("vocabCoverage on an empty corpus emits zero-coverage rows") {
    val docs = Seq((1L, "...!!!")).toDF("doc_id", "text")
    val got = graft.text.TextFunctions.vocabCoverage(docs, "text", Seq(2, 5))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2, 0L, 0L, 0.0), (5, 0L, 0L, 0.0)))
  }

  // ---- t23 token drift ----

  test("tokenDrift hand case: exact ppm rates, one-sided terms, " +
      "identical slices read zero") {
    val docs = Seq(
      ("a", 1L, "x x y"), ("a", 2L, "x"),        // a: x=3, y=1, na=4
      ("b", 3L, "x y y z"), ("b", 4L, "y")       // b: x=1, y=3, z=1, nb=5
    ).toDF("s", "doc_id", "text")
    val got = graft.text.TextFunctions
      .tokenDriftTopK(docs, "s", "text", "a", "b", topK = 10)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // rates: a: x=750000, y=250000; b: x=200000, y=600000, z=200000.
    assert(got == Seq(
      ("x", 750000L, 200000L, 550000L),
      ("y", 250000L, 600000L, 350000L),
      ("z", 0L, 200000L, 200000L)))
    val tv = graft.text.TextFunctions
      .corpusDriftTv(docs, "s", "text", "a", "b")
      .as[(Long, Long)].head()
    assert(tv == ((3L, 1100000L)))
    // Identical slices: zero drift everywhere.
    val same = docs.withColumn("s",
        when($"doc_id" <= 2, "p").otherwise("q"))
      .withColumn("text", lit("u v u"))
    val tv0 = graft.text.TextFunctions
      .corpusDriftTv(same, "s", "text", "p", "q")
      .as[(Long, Long)].head()
    assert(tv0._2 == 0L)
  }

  // ---- q31 weighted percentiles ----

  test("weightedPercentiles hand case") {
    val df = Seq((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L)).toDF("v", "w")
    val got = WeightedQuantiles
      .weightedPercentiles(df, "v", "w", Seq(1, 50, 100))
      .select("pct", "value", "cum_w", "total_w")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    // W=10: T(1)=1 -> 10 (cum 1); T(50)=5 -> 30 (cum 6); T(100)=10 -> 40.
    assert(got.toSeq == Seq((1, 10L, 1L, 10L), (50, 30L, 6L, 10L),
      (100, 40L, 10L, 10L)))
  }

  test("weightedPercentiles is chunkWidth-invariant (incl. negatives, " +
      "duplicates) and equals the sort-replay") {
    val rnd = new scala.util.Random(163)
    val rows = (1 to 3000).map { _ =>
      (rnd.nextLong() % 5000L, 1L + rnd.nextInt(9).toLong)
    }
    val df = rows.toDF("v", "w")
    val pcts = Seq(10, 25, 50, 75, 90, 99, 100)
    // In-test reference: the one global cumulative sweep.
    val total = rows.map(_._2).sum
    val cums = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
      .scanLeft((Long.MinValue, 0L)) { case ((_, c), (v, s)) => (v, c + s) }
      .drop(1)
    val want = pcts.map { p =>
      val t = (p * total + 99) / 100
      val (v, c) = cums.find(_._2 >= t).get
      (p, v, c, total)
    }.toSet
    for (cw <- Seq(1L, 7L, 100L, 1L << 16, 1L << 40)) {
      val got = WeightedQuantiles.weightedPercentiles(df, "v", "w", pcts, cw)
        .as[(Int, Long, Long, Long)].collect().toSet
      assert(got == want, s"chunkWidth $cw diverged")
    }
  }

  test("weightedPercentilesBy: per-group hand case, groups isolated, " +
      "NULL group kept") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L), ("a", 40L, 4L),
      ("b", 5L, 10L),
      (null.asInstanceOf[String], 7L, 2L))
      .toDF("g", "v", "w")
    val got = WeightedQuantiles
      .weightedPercentilesBy(df, "g", "v", "w", Seq(50, 100))
      .select("g", "pct", "value", "cum_w", "total_w")
      .as[(Option[String], Int, Long, Long, Long)].collect()
      .sortBy(r => (r._1.getOrElse(""), r._2)).toSeq
    assert(got == Seq(
      (None, 50, 7L, 2L, 2L), (None, 100, 7L, 2L, 2L),
      (Some("a"), 50, 30L, 6L, 10L), (Some("a"), 100, 40L, 10L, 10L),
      (Some("b"), 50, 5L, 10L, 10L), (Some("b"), 100, 5L, 10L, 10L)))
    // Group isolation: "a" alone gives the same "a" rows.
    val solo = WeightedQuantiles.weightedPercentilesBy(
        df.filter($"g" === "a"), "g", "v", "w", Seq(50, 100))
      .select("g", "pct", "value").as[(String, Int, Long)]
      .collect().sortBy(_._2).toSeq
    assert(solo == Seq(("a", 50, 30L), ("a", 100, 40L)))
  }

  test("weightedPercentiles rejects non-positive weights loudly") {
    val df = Seq((10L, 1L), (20L, -3L)).toDF("v", "w")
    val e = intercept[Exception] {
      WeightedQuantiles.weightedPercentiles(df, "v", "w", Seq(50)).collect()
    }
    assert(e.getMessage.contains("weights must be >= 1"))
  }

  // ---- q32 forward as-of with tolerance ----

  test("firstAtOrAfter hand case: next match, inclusive tie, tolerance " +
      "null-out, no-successor and NULL-time probes") {
    val probe = Seq(
      (1L, 10L, 100L),  // next build at t=100 (inclusive equal-t below)
      (2L, 10L, 100L),  // exactly ON a build time -> matches it
      (3L, 10L, 150L),  // next build 200, gap 50 > tol 30 -> NULLs
      (4L, 10L, 300L),  // no successor -> NULLs
      (5L, 99L, 100L),  // key with no build rows -> NULLs
      (6L, 10L, -5L)    // before everything, nearest 100 beyond tol
    ).toDF("event_id", "user_id", "ts")
      .unionByName(Seq((7L, 10L, Option.empty[Long]))
        .toDF("event_id", "user_id", "ts")) // NULL-t probe -> NULLs
    val build = Seq((10L, 100L, 1000L), (10L, 200L, 2000L))
      .toDF("user_id", "ts", "payload")
    val got = AsOfJoin.firstAtOrAfter(probe, build, "user_id", "ts",
        Seq("event_id", "user_id", "ts"), Seq("payload"),
        tolerance = Some(30L))
      .select("event_id", "payload", "asof_t")
      .as[(Long, Option[Long], Option[Long])].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some(1000L), Some(100L)),
      (2L, Some(1000L), Some(100L)),
      (3L, None, None),
      (4L, None, None),
      (5L, None, None),
      (6L, None, None),
      (7L, None, None)))
    // Without tolerance, 3 and 6 match their true successors.
    val open = AsOfJoin.firstAtOrAfter(probe, build, "user_id", "ts",
        Seq("event_id"), Seq("payload"))
      .select("event_id", "payload")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(open == Seq((1L, Some(1000L)), (2L, Some(1000L)),
      (3L, Some(2000L)), (4L, None), (5L, None), (6L, Some(1000L)),
      (7L, None)))
  }

  test("firstAtOrAfter == lastAtOrBefore on the time-negated stream") {
    // Mirror law: next-at-or-after over t equals last-at-or-before over
    // -t. Fuzz with duplicate probe times, build-on-probe collisions,
    // and multiple keys.
    val rnd = new scala.util.Random(331)
    val probe = (1 to 800).map(i =>
      (i.toLong, (i % 7).toLong, (rnd.nextInt(500) - 250).toLong))
      .toDF("pid", "k", "t")
    val build = (1 to 300).map { i =>
      ((i % 7).toLong, (rnd.nextInt(500) - 250).toLong, (i * 11).toLong)
    }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "t", "v") // unique per (k, t) — the operator contract
    val fwd = AsOfJoin.firstAtOrAfter(probe, build, "k", "t",
        Seq("pid"), Seq("v"))
      .select("pid", "v", "asof_t")
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    val mirrored = AsOfJoin.lastAtOrBefore(
        probe.withColumn("t", -$"t"), build.withColumn("t", -$"t"),
        "k", "t", Seq("pid"), Seq("v"))
      .select("pid", "v", "asof_t")
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1)
      .map { case (p, v, at) => (p, v, at.map(-_)) }.toSeq
    assert(fwd == mirrored)
  }

  // ---- s26 durable tombstone delete ----

  test("ivfPqRemoveFromTable: tombstone log == in-session remove; " +
      "compaction makes it physical and truncates the log") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    Similarity.ivfPqSave(idx, "r16b_ts_idx", numBuckets = 4)
    val dead = e.filter($"vec_id" % 5 === 2).select($"vec_id")
    Similarity.ivfPqRemoveFromTable(dead, "r16b_ts_idx", "vec_id")
    // Idempotent and unordered: duplicate batches and never-indexed ids
    // are no-ops under anti-join semantics.
    Similarity.ivfPqRemoveFromTable(dead, "r16b_ts_idx", "vec_id")
    Similarity.ivfPqRemoveFromTable(Seq(999999L).toDF("vec_id"),
      "r16b_ts_idx", "vec_id")

    def search() = Similarity.ivfPqSearchTable(e.filter($"vec_id" <= 3),
        "r16b_ts_idx", "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(_.toString).sorted.toSeq
    val got = search()
    val want = Similarity.ivfPqTopK(e, e.filter($"vec_id" <= 3),
        "vec_id", "embedding", k = 5, nCells = 4, nProbe = 2,
        m = 4, kCent = 8,
        indexOf = Some(Similarity.ivfPqRemove(idx, dead, "vec_id")))
      .collect().map(_.toString).sorted.toSeq
    assert(got === want, "pending log must equal in-session remove")
    // The loaded artifact is the LOGICAL index — tombstoned ids gone.
    val loadedIds = Similarity.ivfPqLoad(spark, "r16b_ts_idx")._1
      .select("id").as[Long].collect()
    assert(loadedIds.nonEmpty && loadedIds.forall(_ % 5 != 2))
    // Bucket pruning survives a LIVE log (the scan-side literal filter
    // pushes below the anti-join).
    val res = Similarity.ivfPqSearchTable(e.filter($"vec_id" === 1),
      "r16b_ts_idx", "vec_id", "embedding", k = 3, nProbe = 1)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(res.queryExecution.executedPlan.toString)
    assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
      "bucket pruning must survive a pending tombstone log")
    // Re-adding a tombstoned id before compaction fails LOUD (the log
    // cannot order a delete before a re-add).
    val clash = intercept[IllegalArgumentException] {
      Similarity.ivfPqAddToTable(e.filter($"vec_id" % 5 === 2).limit(2),
        "r16b_ts_idx", "vec_id", "embedding")
    }
    assert(clash.getMessage.contains("tombstoned"))

    // Compaction: rows physically drop, the log truncates, search is
    // bit-identical, and the id is re-addable again.
    val rawBefore = spark.table("r16b_ts_idx").count()
    Similarity.ivfPqCompact(spark, "r16b_ts_idx")
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("r16b_ts_idx_tombstones")))
    assert(spark.table("r16b_ts_idx").count() < rawBefore,
      "compaction must drop tombstoned rows physically")
    assert(search() === got, "compaction must not change search results")
    Similarity.ivfPqAddToTable(
      e.filter($"vec_id" % 5 === 2).limit(2), "r16b_ts_idx",
      "vec_id", "embedding")
    assert(Similarity.ivfPqLoad(spark, "r16b_ts_idx")._1.count() ===
      spark.table("r16b_ts_idx").count())

    // A re-SAVE under the same name is a NEW index generation: a live
    // tombstone log from the previous generation must not leak into it
    // (stale ids would silently vanish from the fresh artifact).
    Similarity.ivfPqRemoveFromTable(dead, "r16b_ts_idx", "vec_id")
    Similarity.ivfPqSave(idx, "r16b_ts_idx", numBuckets = 4)
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("r16b_ts_idx_tombstones")))
    val fresh = Similarity.ivfPqLoad(spark, "r16b_ts_idx")._1
      .select("id").as[Long].collect()
    assert(fresh.exists(_ % 5 == 2), "re-save must shed the stale log")
  }

  test("weightedPercentiles rejects NULL values loudly") {
    val df = Seq((Some(10L), 1L), (None, 10L), (Some(20L), 1L))
      .toDF("v", "w")
    val e = intercept[Exception] {
      WeightedQuantiles.weightedPercentiles(df, "v", "w", Seq(50)).collect()
    }
    assert(e.getMessage.contains("NULL values"))
  }

  // ---- q35 KMV set operations ----

  test("kmvSketchBy == exact bottom-k; merge law; set-op edge cases") {
    val rows = (1L to 500L).map(i => (if (i <= 300) "x" else "y", i))
      .toDF("slice", "key")
    val k = 32
    val sk = Sketches.kmvSketchBy(rows, "slice", "key", k)
    // Exact bottom-k under the double-cast heap score (monotone cast +
    // id tie-break): equals the integer ORDER BY replay.
    for (s <- Seq("x", "y")) {
      val got = sk.filter($"slice" === s).select("h").as[Long]
        .collect().sorted.toSeq
      val want = rows.filter($"slice" === s)
        .select(Sampling.keyHash60($"key").as("h"))
        .distinct().orderBy("h").limit(k).as[Long].collect().sorted.toSeq
      assert(got == want, s"bottom-k diverged for slice $s")
    }
    // KMV merge law: sketching the CONCATENATED slice equals merging
    // the two sketches and re-truncating.
    val whole = Sketches.kmvSketchBy(
      rows.withColumn("slice", lit("all")), "slice", "key", k)
      .select("h").as[Long].collect().sorted.toSeq
    val merged = sk.select("h").distinct().orderBy("h").limit(k)
      .as[Long].collect().sorted.toSeq
    assert(whole == merged, "KMV merge law broke")

    // Disjoint slices: intersection reads zero.
    val est = Sketches.kmvSetEstimates(sk, "x", "y", k)
      .as[(Int, Long, Long, Long, Double, Double)].head()
    assert(est._4 == 0L && est._6 == 0.0)
    // Identical slices: intersection == union, both full-k estimates.
    val dup = rows.withColumn("slice", lit("a"))
      .unionByName(rows.withColumn("slice", lit("b")))
    val estDup = Sketches.kmvSetEstimates(
        Sketches.kmvSketchBy(dup, "slice", "key", k), "a", "b", k)
      .as[(Int, Long, Long, Long, Double, Double)].head()
    assert(estDup._4 == k.toLong && estDup._5 == estDup._6)
    // Small sets (< k distinct): estimates are exact counts.
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("slice", "key")
    val estTiny = Sketches.kmvSetEstimates(
        Sketches.kmvSketchBy(tiny, "slice", "key", k), "a", "b", k)
      .as[(Int, Long, Long, Long, Double, Double)].head()
    assert(estTiny._3 == 3L && estTiny._4 == 1L &&
      estTiny._5 == 3.0 && estTiny._6 == 1.0)
  }

  // ---- st25 streaming KMV candidates ----

  test("streaming KMV candidates reproduce the batch set estimates " +
      "under adversarial arrival orders") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 400L).map(i => (if (i % 3 == 0) "x" else "y", i))
    val k = 16
    val batch = Sketches.kmvSetEstimates(
        Sketches.kmvSketchBy(rows.toDF("slice", "key"), "slice", "key", k),
        "x", "y", k)
      .collect().map(_.toString).toSeq
    // Ascending-hash arrival maximizes emissions (every row improves);
    // descending minimizes; both must finalize identically.
    val byHash = rows.sortBy(r => Sampling.hash60OfString(r._2.toString))
    for (order <- Seq(byHash, byHash.reverse)) {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long)]
      val sink = s"st25_spec_${order.head._2}"
      val q = graft.streaming.Streams.streamingKmvCandidates(
          input.toDF().toDF("slice", "key"), "slice", "key", k)
        .toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        order.grouped(90).foreach { c =>
          input.addData(c: _*); q.processAllAvailable()
        }
        assert(spark.table(sink).count() <= rows.size)
        val got = Sketches.kmvSetEstimates(
            spark.table(sink).select(col("slice"), col("h")), "x", "y", k)
          .collect().map(_.toString).toSeq
        assert(got == batch, s"drain starting at ${order.head} diverged")
      } finally q.stop()
    }
  }

  // ---- k02 frozen-centroid predict + inertia ----

  test("predictAssign over the training set == the training assignment; " +
      "1-row delta works; inertia folds exactly") {
    val pts = (1L to 90L).map(i =>
      (i, Seq((i % 7).toFloat, (i % 11).toFloat, (i % 3).toFloat)))
      .toDF("id", "vec")
    val cents = KMeans.fitCentroids(pts, "id", "vec", k = 4, nIter = 2)
    val trained = KMeans.fitAssign(pts, "id", "vec", k = 4, nIter = 2)
      .select("id", "cell", "d2").as[(Long, Int, Long)].collect().toSet
    val predicted = KMeans.predictAssign(pts, "id", "vec", cents)
      .select("id", "cell", "d2").as[(Long, Int, Long)].collect().toSet
    assert(predicted == trained,
      "frozen-centroid predict must reproduce the training assignment")
    // A 1-row delta assigns without any retrain machinery.
    val one = KMeans.predictAssign(
      Seq((999L, Seq(1.0f, 2.0f, 1.0f))).toDF("id", "vec"),
      "id", "vec", cents).collect()
    assert(one.length == 1)
    // Inertia = the exact per-cell integer fold of the same frame.
    val inertia = KMeans.clusterInertia(
        KMeans.predictAssign(pts, "id", "vec", cents))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = predicted.groupBy(_._2.toLong).view
      .mapValues(rs => (rs.size.toLong, rs.toSeq.map(_._3).sum)).toMap
    assert(inertia == want)
  }

  // ---- q33 rollup-sliced HLL distinct ----

  test("hllRollupRegisters: slices equal per-slice global sketches, the " +
      "lattice merge law holds, NULL data stays distinct from subtotals") {
    val df = (1L to 300L).map { i =>
      val g1 = s"a${i % 3}"
      val g2 = if (i % 7 == 0) null else s"b${i % 2}"
      (g1, g2, i % 97) // keys overlap across slices
    }.toDF("g1", "g2", "k")
    val p = 4
    val regs = Sketches.hllRollupRegisters(df, "g1", "g2", "k", p)
      .as[(String, String, Long, Long, Long)].collect()
    def slice(gid: Long) = regs.filter(_._3 == gid)
      .map(r => ((Option(r._1), Option(r._2)), (r._4, r._5)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toMap).toMap

    // Leaf slices == a global sketch of each filtered subset (NULL data
    // group included — it is a LEAF at gid 0).
    val leaves = slice(0L)
    val leafKeys = df.select("g1", "g2").distinct()
      .as[(String, String)].collect().map { case (a, b) => (Option(a), Option(b)) }
    assert(leaves.keySet == leafKeys.toSet)
    for ((a, b) <- leafKeys) {
      val sub = df.filter($"g1" === a.get &&
        (if (b.isDefined) $"g2" === b.get else $"g2".isNull))
      val want = Sketches.hllRegisters(sub, "k", p)
        .as[(Long, Long)].collect().toMap
      assert(leaves((a, b)) == want, s"leaf ($a, $b) diverged")
    }
    // Merge law up the lattice: gid-1 slice (a, NULL-subtotal) ==
    // per-register max over its gid-0 children.
    val mids = slice(1L)
    for ((a, regsMap) <- mids) {
      val children = leaves.filter(_._1._1 == a._1).values
      val want = (0L until (1L << p)).map(r =>
        r -> children.map(_(r)).max).toMap
      assert(regsMap == want, s"merge law broke at $a")
    }
    // Grand total (gid 3) == the plain global sketch.
    val want = Sketches.hllRegisters(df, "k", p).as[(Long, Long)]
      .collect().toMap
    assert(slice(3L)((None, None)) == want)
    // NULL-data leaf and the g2 subtotal coexist, disambiguated by gid:
    // (a0, null) appears at BOTH gid 0 (data) and gid 1 (subtotal) with
    // different registers (the subtotal folds more keys).
    assert(leaves.contains((Some("a0"), None)) &&
      mids.contains((Some("a0"), None)))
    assert(leaves((Some("a0"), None)) != mids((Some("a0"), None)))
  }

  // ---- d21 LSH band calibration ----

  test("lshBandCalibration: nested-band candidate monotonicity, recall " +
      "ordering, cheapest-deploy pick") {
    // Corpus with planted near-dup pairs of varying similarity: base
    // docs plus copies with a few words swapped (high-but-not-1.0
    // jaccard — the regime where banding actually loses pairs).
    val words = (0 until 40).map(i => s"w$i")
    val rnd = new scala.util.Random(59)
    val docs = (0 until 60).flatMap { i =>
      val base = Seq.fill(30)(words(rnd.nextInt(words.size))).mkString(" ")
      val toks = base.split(" ")
      val mutated = toks.zipWithIndex.map { case (t, j) =>
        if (j % 11 == (i % 11)) words(rnd.nextInt(words.size)) else t
      }.mkString(" ")
      Seq((i * 2L, base), (i * 2L + 1L, mutated))
    }.toDF("doc_id", "text")
    val cal = Dedup.lshBandCalibration(docs, "doc_id", "text",
        n = 3, threshold = 0.5, k = 16, bandOptions = Seq(2, 4, 8),
        recallTargetPpm = 900000L)
      .select("bands", "n_candidates", "hits", "exact_n", "recall_ppm",
        "deploy")
      .as[(Int, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(cal.map(_._1).toSeq == Seq(2, 4, 8))
    val exactN = cal.head._4
    assert(exactN > 0L, "planted pairs must exist above threshold")
    // 2/4/8 bands over k=16 NEST (a 4-position band agreement implies
    // both its 2-position halves agree), so candidates and recall are
    // monotone non-decreasing in b.
    assert(cal.map(_._2).toSeq == cal.map(_._2).sorted.toSeq, "candidates not monotone")
    assert(cal.map(_._5).toSeq == cal.map(_._5).sorted.toSeq, "recall not monotone")
    // deploy = exactly the first option meeting the target (if any).
    val firstOk = cal.find(_._5 >= 900000L).map(_._1)
    assert(cal.filter(_._6).map(_._1).toSeq == firstOk.toSeq)
  }

  test("lshBandCalibration on a truth-free corpus: vacuous full recall, " +
      "cheapest option deploys") {
    val docs = (1L to 30L).map(i => (i, s"unique$i text$i body$i tail$i end$i"))
      .toDF("doc_id", "text")
    val cal = Dedup.lshBandCalibration(docs, "doc_id", "text",
        n = 3, threshold = 0.8, k = 16, bandOptions = Seq(2, 4))
      .select("bands", "exact_n", "recall_ppm", "deploy")
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(cal.forall(_._2 == 0L) && cal.forall(_._3 == 1000000L))
    assert(cal.filter(_._4).map(_._1).toSeq == Seq(2))
  }

  // ---- g29 HyperBall ----

  test("HyperBall registers == the exact ball's own sketch (fuzz BFS " +
      "cross-check), estimates monotone in radius") {
    // The defining invariant: after r rounds, a vertex's registers are
    // EXACTLY the HLL observations of its true r-ball membership set —
    // sketch-of-ball == ball's-sketch. Verified against a driver-side
    // BFS on a seeded random graph with hubs, cycles, and isolates.
    val rnd = new scala.util.Random(47)
    val n = 120
    val edges = Seq.fill(260)(
      (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))) ++
      (1L to 10L).map(i => (111L, 100L + i)) // hub fan-out
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def ball(v: Long, r: Int): Set[Long] = {
      var cur = Set(v)
      (1 to r).foreach { _ =>
        cur = cur ++ cur.flatMap(u => adj.getOrElse(u, Set.empty))
      }
      cur
    }
    val vertices = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val g = graft.graph.GraphFrame(
      vertices.toDF("id"), edges.toDF("src", "dst"))
    val p = 4; val sBits = 60 - p + 1
    def expectedRegs(r: Int): Set[(Long, Long, Long)] =
      vertices.flatMap { v =>
        ball(v, r).groupBy(u => Sampling.hash60OfString(u.toString) & 15)
          .map { case (reg, members) =>
            val rk = members.map { u =>
              val w = Sampling.hash60OfString(u.toString) >>> p
              (sBits - (if (w == 0L) 0 else 64 - java.lang.Long
                .numberOfLeadingZeros(w))).toLong
            }.max
            (v, reg.toLong, rk)
          }
      }.toSet
    for (r <- Seq(1, 2)) {
      val got = g.hyperBall.radius(r).precision(p).registers()
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expectedRegs(r), s"radius $r registers diverged")
    }
    // Registers only grow -> per-vertex sum_scaled non-increasing with
    // radius (estimates monotone non-decreasing).
    def sums(r: Int): Map[Long, Long] =
      g.hyperBall.radius(r).precision(p).run()
        .select("id", "sum_scaled").as[(Long, Long)].collect().toMap
    val s1 = sums(1); val s2 = sums(2)
    assert(vertices.forall(v => s2(v) <= s1(v)))
  }

  test("neighborhoodFunction == the exact-ball replay on a chain; " +
      "eff_diameter at the 90% crossing; saturation pinned") {
    // 1 -> 2 -> 3 -> 4: balls are suffix sets, saturating at radius 3.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val vertices = Seq(1L, 2L, 3L, 4L)
    val g = graft.graph.GraphFrame(
      vertices.toDF("id"), edges.toDF("src", "dst"))
    val got = g.hyperBall.radius(4).precision(4).neighborhoodFunction()
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq

    // Driver replay of the full corrected pipeline over EXACT balls.
    val p = 4; val m = 16; val sBits = 60 - p + 1
    def ball(v: Long, r: Int): Set[Long] =
      (v to math.min(v + r, 4L)).toSet
    def estMicros(members: Set[Long]): Long = {
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
        BigDecimal(16.0 * math.log(16.0 / nZero.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else raw
      math.round(corr * 1000000.0)
    }
    val wantNf = (0 to 4).map(r =>
      (r.toLong, vertices.map(v => estMicros(ball(v, r))).sum))
    assert(got.map(t => (t._1, t._3)) == wantNf, "nf_micros diverged")
    assert(got.map(_._2).forall(_ == 4L))
    // Saturation: N(4) == N(3) (the chain has depth 3).
    assert(got(4)._3 == got(3)._3)
    // The flag sits exactly at the replayed 90% crossing, once.
    val thresh = (9L * wantNf.last._2 + 9L) / 10L
    val wantEff = wantNf.collectFirst { case (r, nf) if nf >= thresh => r }
    assert(got.filter(_._4).map(_._1).toSeq == wantEff.toSeq)
  }

  test("harmonicCentrality == the exact-ball lattice replay on a chain; " +
      "sink vertex reads zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val vertices = Seq(1L, 2L, 3L, 4L)
    val g = graft.graph.GraphFrame(
      vertices.toDF("id"), edges.toDF("src", "dst"))
    val got = g.hyperBall.radius(3).precision(4).harmonicCentrality()
      .as[(Long, Long)].collect().toMap

    val p = 4; val m = 16; val sBits = 60 - p + 1
    def ball(v: Long, r: Int): Set[Long] =
      (v to math.min(v + r, 4L)).toSet
    def bMicros(members: Set[Long]): Long = {
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
        BigDecimal(16.0 * math.log(16.0 / nZero.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else raw
      math.round(corr * 1000000.0)
    }
    val want = vertices.map { v =>
      val b = (0 to 3).map(t => bMicros(ball(v, t)))
      v -> (6L * (b(1) - b(0)) + 3L * (b(2) - b(1)) + 2L * (b(3) - b(2)))
    }.toMap
    assert(got == want)
    // Vertex 4 has no out-edges: every shell is empty -> exactly 0.
    assert(got(4L) == 0L)
    // Deeper reach => strictly larger mass down the chain.
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L))
  }

  test("HyperBall isolated vertex: ball = self, 15 empty registers") {
    val g = graft.graph.GraphFrame(
      Seq(1L, 2L, 3L).toDF("id"), Seq((2L, 3L)).toDF("src", "dst"))
    val iso = g.hyperBall.radius(2).precision(4).run()
      .filter($"id" === 1L)
      .select("n_zero").as[Long].head()
    assert(iso == 15L)
  }

  // ---- b09 dynamic partition overwrite ----

  test("overwritePartitions rewrites only the partitions present; " +
      "untouched files byte-identical; static mode truncates") {
    import graft.sources.PartitionedTables
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L),
      ("c", 4L, 40L)).toDF("part", "id", "v")
    val path = PartitionedTables.writePartitioned(df, "r16b_dpo", Seq("part"))
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(sub: String): Map[String, Long] = {
      val d = new org.apache.hadoop.fs.Path(s"$path/part=$sub")
      fs.listStatus(d).filter(_.isFile)
        .map(s => s.getPath.getName -> s.getLen).toMap
    }
    val bBefore = listing("b"); val cBefore = listing("c")
    PartitionedTables.overwritePartitions(
      Seq(("a", 9L, 90L)).toDF("part", "id", "v"), path, Seq("part"))
    // Only partition a was replaced; b and c keep their exact files.
    assert(listing("b") == bBefore && listing("c") == cBefore,
      "untouched partitions must keep their files")
    val rows = PartitionedTables.readPartitioned(spark, path)
      .select("part", "id", "v").as[(String, Long, Long)]
      .collect().sortBy(_._2).toSeq
    assert(rows == Seq(("b", 3L, 30L), ("c", 4L, 40L), ("a", 9L, 90L)))
    // Conf restored after the call (the mode flip is scoped).
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("static"))
    // Partition pruning on the reader is unaffected by the overwrite.
    val plan = PartitionedTables.readPartitioned(spark, path)
      .filter($"part" === "b").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part#"),
      s"expected partition pruning in:\n$plan")
    // The STATIC-mode contrast — the incident the operator exists to
    // prevent: a default overwrite of one partition truncates the rest.
    Seq(("a", 5L, 50L)).toDF("part", "id", "v")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/part=b")),
      "static overwrite should have truncated partition b — if it " +
        "stopped doing so, the operator's reason-to-exist changed")
  }

  // ---- b10 snapshot / time-travel reads ----

  test("snapshot pins content across appends; compaction retains " +
      "pinned files; appendBucketed rejects spec-less tables") {
    import graft.sources.BucketedTables
    val gen = (lo: Long, hi: Long) =>
      (lo to hi).map(i => (i, i * 10)).toDF("id", "v")
    BucketedTables.writeBucketed(gen(1, 10), "r16b_snap", 4, Seq("id"))
    BucketedTables.snapshot(spark, "r16b_snap", "a")
    BucketedTables.appendBucketed(gen(11, 15), "r16b_snap")
    BucketedTables.snapshot(spark, "r16b_snap", "b")
    BucketedTables.appendBucketed(gen(16, 18), "r16b_snap")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    // Each snapshot is frozen at its pin time; the live table moves on.
    assert(ids(BucketedTables.readSnapshot(spark, "r16b_snap", "a")) ==
      (1L to 10L))
    assert(ids(BucketedTables.readSnapshot(spark, "r16b_snap", "b")) ==
      (1L to 15L))
    assert(ids(spark.table("r16b_snap")) == (1L to 18L))
    // Compaction RETAINS pinned files (round 17, b11): the rewrite
    // moves them to the sibling retained dir and re-points the
    // manifests, so both snapshots stay readable at their frozen
    // content while the live table compacts.
    BucketedTables.compactTable(spark, "r16b_snap")
    assert(ids(spark.table("r16b_snap")) == (1L to 18L))
    assert(ids(BucketedTables.readSnapshot(spark, "r16b_snap", "a")) ==
      (1L to 10L))
    assert(ids(BucketedTables.readSnapshot(spark, "r16b_snap", "b")) ==
      (1L to 15L))
    // Spec-less target rejected before any write happens. (Drop with
    // location first: the shared /tmp warehouse outlives JVMs, and a
    // leftover directory under a dropped catalog entry fails CREATE.)
    graft.sources.BucketedTables.dropWithLocation(spark, "r16b_snap_flat")
    gen(1, 3).write.mode("overwrite").saveAsTable("r16b_snap_flat")
    val e = intercept[IllegalArgumentException] {
      BucketedTables.appendBucketed(gen(4, 5), "r16b_snap_flat")
    }
    assert(e.getMessage.contains("bucket spec"))
  }

  // ---- config matrix (the standing round rule) ----

  test("p11/g28/t22/q31/q32 results are config-invariant") {
    def runAll(): Seq[Set[String]] = {
      val docs = (1L to 80L).map(i => (i, s"w${i % 5} w${i % 11} x$i", 10L + i % 37))
        .toDF("doc_id", "text", "n_chars")
      val edges = (1L to 120L).map(i => (i % 17, 100L + i % 23)).toDF("src", "dst")
      val li = (1L to 500L).map(i => ((i * 31) % 997, 1L + i % 7)).toDF("v", "w")
      val probe = (1L to 90L).map(i => (i, i % 9, (i * 37) % 211))
        .toDF("pid", "k", "t")
      val build = (1L to 40L).map(i => (i % 9, (i * 53) % 211, i * 100))
        .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "t", "v")
      Seq(
        Sampling.prioritySample(docs, "doc_id", "n_chars", 10, "cfg"),
        graft.algorithms.LinkPrediction.resourceAllocation(edges, topK = 50),
        graft.text.TextFunctions.vocabCoverage(docs, "text", Seq(3, 10)),
        WeightedQuantiles.weightedPercentiles(li, "v", "w", Seq(25, 50, 95)),
        AsOfJoin.firstAtOrAfter(probe, build, "k", "t", Seq("pid"),
          Seq("v"), tolerance = Some(40L)))
        .map(_.collect().map(_.toString).toSet)
    }
    val baseline = runAll()
    val olds = Seq("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try assert(runAll() == baseline, "AQE-off + partitions=5 changed results")
    finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
