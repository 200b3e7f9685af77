package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class StreamsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streamingExactDedup drops duplicate payloads across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = Streams.streamingExactDedup(
      input.toDF().toDF("ts", "text"), "ts", "text")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "alpha"), (ts(1), "beta"), (ts(2), "alpha"))
      q.processAllAvailable()
      input.addData((ts(3), "beta"), (ts(4), "gamma"))
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text").as[String].collect().sorted
      assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("streamingDecontaminateJoin flags the batch decon set via a relation " +
      "join — held-out side never a driver set") {
    implicit val sqlCtx = spark.sqlContext
    val heldOut = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val d1 = 1L -> "xx alpha beta gamma delta epsilon yy"   // shares gram 1
    val d2 = 2L -> "one two three four five six"            // clean
    val d3 = 3L -> "pp qq beta gamma delta epsilon zeta"    // shares gram 2
    val d4 = 4L -> "seven eight nine ten eleven twelve"     // clean
    val input = MemoryStream[(Long, String)]
    val plans = scala.collection.mutable.Buffer.empty[String]
    val flaggedIds = scala.collection.mutable.Set.empty[Long]
    var batches = 0
    val (writer, release) = Streams.streamingDecontaminateJoin(
      input.toDF().toDF("doc_id", "text"), heldOut, "doc_id", "text", n = 5) {
      (flagged, _) =>
        batches += 1
        plans += flagged.queryExecution.optimizedPlan.toString
        flaggedIds ++= flagged.collect().map(_.getLong(0))
    }
    val q = writer.start()
    try {
      input.addData(d1, d2)
      q.processAllAvailable()
      input.addData(d3, d4)
      q.processAllAvailable()
    } finally { q.stop(); release() }
    val batch = graft.operators.Dedup.decontaminate(
      Seq(d1, d2, d3, d4).toDF("doc_id", "text"), heldOut,
      "doc_id", "text", n = 5, broadcastHeldOut = false)
      .select("doc_id").as[Long].collect().toSet
    assert(batch == Set(1L, 3L), s"batch twin sanity: $batch")
    assert(flaggedIds.toSet == batch, s"stream $flaggedIds vs batch $batch")
    assert(batches >= 2, "multi-micro-batch drain expected")
    // The scale contract: the probe is a JOIN against the hash relation,
    // not a collected-set UDF probe (st05's stateless shape).
    assert(plans.forall(_.contains("Join")), plans.mkString("\n---\n"))
    assert(plans.forall(p => !p.toLowerCase.contains("udf")),
      "held-out probe must not be a driver-set UDF")
  }

  test("streamingDriftCounts: cross-batch additive counts == the batch " +
      "counts on the union; finalize tail == corpusDriftTv") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = Streams.streamingDriftCounts(
      input.toDF().toDF("half", "text"), "half", "text", "0", "1")
    val q = out.writeStream.format("memory").queryName("drift_out")
      .outputMode("complete").start()
    try {
      input.addData(("0", "the cat sat"), ("1", "the cat ran"))
      q.processAllAvailable()
      input.addData(("0", "dog days the"), ("1", "red red cat"),
        ("2", "ignored slice"))
      q.processAllAvailable()
      val all = Seq(("0", "the cat sat"), ("1", "the cat ran"),
        ("0", "dog days the"), ("1", "red red cat"), ("2", "ignored slice"))
        .toDF("half", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(String, String, Long)].collect().toSet
      assert(rows(spark.table("drift_out")) ==
        rows(graft.text.TextFunctions.driftCounts(
          all, "half", "text", "0", "1")))
      // The drained state finalizes to the batch monitor's scalar.
      val got = graft.text.TextFunctions
        .driftRatesFromCounts(spark.table("drift_out"), "0", "1")
        .agg(count(lit(1)), sum($"drift_ppm")).as[(Long, Long)].head()
      val want = graft.text.TextFunctions
        .corpusDriftTv(all, "half", "text", "0", "1")
        .as[(Long, Long)].head()
      assert(got == want)
    } finally q.stop()
  }

  test("streamingHllRollupRegisters: cross-batch lattice state == the " +
      "batch rollup on the union; state bounded by slices x 2^p") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val out = Streams.streamingHllRollupRegisters(
      input.toDF().toDF("f", "st", "k"), "f", "st", "k", p = 6)
    val q = out.writeStream.format("memory").queryName("hllru_out")
      .outputMode("complete").start()
    try {
      def rows(n: Long) = (1L to n).map(i =>
        (if (i % 3 == 0) "A" else "R", if (i % 2 == 0) "O" else "F", i))
      input.addData(rows(400): _*)
      q.processAllAvailable()
      input.addData((401L to 800L).map(i =>
        (if (i % 3 == 0) "A" else "R", if (i % 2 == 0) "O" else "F", i)): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
          r.getLong(3))
      val streamed = spark.table("hllru_out").collect()
        .map(r => key(r) -> r.getLong(4)).toMap
      val batch = graft.operators.Sketches.hllRollupSeen(
          (1L to 800L).map(i => (if (i % 3 == 0) "A" else "R",
            if (i % 2 == 0) "O" else "F", i)).toDF("f", "st", "k"),
          "f", "st", "k", p = 6)
        .collect().map(r => key(r) -> r.getLong(4)).toMap
      assert(streamed == batch)
      // Slices: 2x2 leaves + 2 g1 subtotals + 1 grand total = 7, each
      // holding at most 64 registers.
      assert(streamed.size <= 7 * 64)
    } finally q.stop()
  }

  test("streamingHllRegisters merges register state across micro-batches") {
    // The st07 drain delivers one batch; THIS is where the cross-batch
    // state merge is forced: two disjoint key batches must leave exactly
    // the registers the batch sketch computes over their union.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val out = Streams.streamingHllRegisters(input.toDF().toDF("k"), "k", p = 6)
    val q = out.writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").start()
    try {
      input.addData(1L to 500L: _*)
      q.processAllAvailable()
      val afterFirst = spark.table("hll_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      input.addData(501L to 1000L: _*)
      q.processAllAvailable()
      val streamed = spark.table("hll_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.operators.Sketches
        .hllRegisters((1L to 1000L).toDF("k"), "k", p = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0L).toMap
      assert(streamed == batch)
      // Monotone state: no register regressed when the second batch landed.
      afterFirst.foreach { case (reg, rank) =>
        assert(streamed.getOrElse(reg, 0L) >= rank, s"register $reg regressed")
      }
      // Bounded state: never more rows than 2^p, regardless of stream length.
      assert(streamed.size <= 64)
    } finally q.stop()
  }

  test("streamingCmsRegisters accumulates additive grid state across micro-batches") {
    // Same cross-batch obligation as the HLL spec, for the ADDITIVE merge
    // discipline: two batches with overlapping keys must sum into the
    // union's exact batch grid (not max, not last-writer).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = Streams.streamingCmsRegisters(input.toDF().toDF("k"), "k",
      depth = 3, width = 64)
    val q = out.writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      val batch1 = (1 to 200).map(i => s"k${i % 23}")
      val batch2 = (1 to 100).map(i => s"k${i % 31}") // overlaps batch1's keys
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = graft.operators.Sketches
        .cmsRegisters((batch1 ++ batch2).toDF("k"), "k", depth = 3, width = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .filter(_._2 > 0L).toMap
      assert(streamed == batch)
      assert(streamed.size <= 3 * 64)
    } finally q.stop()
  }

  test("windowedEventStats aggregates sliding windows with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = Streams.windowedEventStats(
      input.toDF().toDF("ts", "event_type", "value"), "ts", "event_type",
      window = "10 minutes", slide = "10 minutes", lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("event_type", "cnt", "value_sum").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedEventStats append mode emits exactly the watermark-finalized windows") {
    // Pins the finalization boundary the st02 oracle encodes: a window is
    // emitted in append mode once watermark >= window_end, where watermark
    // = max event time - lateness. The boundary window (end == watermark)
    // IS emitted; the window holding the max event is retained in state.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = Streams.windowedEventStats(
      input.toDF().toDF("ts", "event_type", "value"), "ts", "event_type",
      window = "10 minutes", slide = "10 minutes", lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_append_out")
      .outputMode("append").start()
    try {
      // max = 10:45 -> watermark 10:40. Window ends: 10:10 (< wm, emits),
      // 10:40 (== wm, boundary), 10:50 (> wm, retained).
      input.addData((ts(5), "a", 1.0), (ts(35), "b", 2.0), (ts(45), "c", 3.0))
      q.processAllAvailable()
      input.addData((ts(45), "c", 4.0)) // second batch: watermark now applied
      q.processAllAvailable()
      val ends = spark.table("win_append_out")
        .select(col("window_end").cast("long"), col("event_type")).collect()
        .map(r => (r.getLong(0) - ts(0).getTime / 1000, r.getString(1))).toSet
      assert(ends === Set((600L, "a"), (2400L, "b")),
        s"observed finalized windows: $ends")
    } finally q.stop()
  }

  test("qualityFilter reuses the batch formula on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = Streams.qualityFilter(input.toDF().toDF("text"), "text", 0.5)
    val q = out.writeStream.format("memory").queryName("q_out")
      .outputMode("append").start()
    try {
      input.addData(
        "the data pipeline processes a batch of documents and it is quite good for the query engine to scan",
        "x")
      q.processAllAvailable()
      val kept = spark.table("q_out").select("text").as[String].collect()
      assert(kept.length == 1 && kept.head.startsWith("the data"))
    } finally q.stop()
  }

  test("streamingAttribution: stream-stream join pairs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, String)] // ts, user, id, type
    val out = Streams.streamingAttribution(
      input.toDF().toDF("ts", "user_id", "event_id", "event_type"),
      "ts", "user_id", "event_id", "event_type",
      fromType = "click", toType = "purchase", horizonSec = 600L)
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, 10L, "click"), (ts(30), 1L, 11L, "click"))
      q.processAllAvailable()
      assert(spark.table("attr_out").count() == 0)
      // Purchase arrives in a LATER batch: joins the 10:00 click (gap 5
      // min) but not the 10:30 one (purchase precedes it).
      input.addData((ts(5), 1L, 20L, "purchase"), (ts(59), 2L, 21L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("attr_out")
        .select("user_id", "from_id", "to_id", "gap_sec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows === Set((1L, 10L, 20L, 300L)))
    } finally q.stop()
  }

  test("streamingSessionize: successor-closed sessions with custom state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long)] // ts, user, event_id
    val out = Streams.streamingSessionize(
      input.toDF().toDF("ts", "user_id", "event_id"), "ts", "user_id", "event_id",
      gapSec = 600L) // 10-minute gap
    val q = out.toDF().writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00, 10:05 (one session), then 10:20 (new session)
      input.addData((ts(0), 1L, 1L), (ts(5), 1L, 2L))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // nothing closed yet
      input.addData((ts(20), 1L, 3L)) // closes the first session ACROSS batches
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val t0 = ts(0).getTime / 1000; val t5 = ts(5).getTime / 1000
      assert(rows.toSeq == Seq((1L, t0, t5, 2L)))
      // the 10:20 session stays open (never emitted)
      input.addData((ts(25), 1L, 4L)) // within gap: extends, still open
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 1)
    } finally q.stop()
  }

  test("file-streamed st* queries equal their batch formulations (sf0.001)") {
    // Batch/stream equivalence IS the oracle contract for the st* queries:
    // AvailableNow drains the parquet through the micro-batch engine and
    // must produce exactly the batch result. Mirrors the driver's DuckDB
    // gate inside the test suite.
    val sf = "/root/testdata/sf0.001"
    def sym(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.exceptAll(b).isEmpty, "stream rows missing from batch")
      assert(b.exceptAll(a).isEmpty, "batch rows missing from stream")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    val st01 = graft.SparkEntry.queries("st01_stream_dedup")(spark, sf)
    sym(st01, docs.select(md5(col("text")).as("fingerprint")).distinct())

    val st03 = graft.SparkEntry.queries("st03_stream_quality")(spark, sf)
    sym(st03, docs
      .withColumn("quality", graft.text.TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .select(col("doc_id"), round(col("quality"), 6).as("quality")))

    val evRaw = graft.SparkEntry.eventsNanos(spark, sf)
      .withColumn("ets", timestamp_seconds(expr("ts div 1000000000")))
    val st06 = graft.SparkEntry.queries("st06_stream_join")(spark, sf)
    val a6 = evRaw.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("event_id").as("from_id"), col("ets").as("ats"))
    val b6 = evRaw.filter(col("event_type") === "purchase")
      .select(col("user_id").as("bu"), col("event_id").as("to_id"), col("ets").as("bts"))
    sym(st06, a6.join(b6, col("u") === col("bu") &&
        col("bts") >= col("ats") && col("bts") <= col("ats") + expr("INTERVAL 3600 SECONDS"))
      .select(col("u").as("user_id"), col("from_id"), col("to_id"),
        (col("bts").cast("long") - col("ats").cast("long")).as("gap_sec")))

    val st05 = graft.SparkEntry.queries("st05_stream_decon")(spark, sf)
    val batchDecon = graft.operators.Dedup.decontaminate(
      docs.filter(col("doc_id") % 10 =!= 7), docs.filter(col("doc_id") % 10 === 7),
      "doc_id", "text", n = 5).select("doc_id")
    sym(st05, batchDecon)

    val st02 = graft.SparkEntry.queries("st02_stream_window")(spark, sf)
    val events = graft.SparkEntry.eventsNanos(spark, sf)
      .withColumn("ets", timestamp_seconds(expr("ts div 1000000000")))
      .withColumn("value", round(col("value") * 100, 0).cast("long"))
    val batchWin = events
      .groupBy(window(col("ets"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("value_sum"))
      .select(col("window.start").cast("long").as("ws"),
        col("window.end").cast("long").as("we"),
        col("event_type"), col("cnt"), col("value_sum"))
    // Append mode drains only watermark-finalized windows: we <= max - 30min.
    val maxSec = events.agg(max(col("ets").cast("long"))).head.getLong(0)
    sym(st02, batchWin.filter(col("we") <= maxSec - 1800L))

    // Sketch-state streams equal their batch register constructions — the
    // family symmetry gate (st07/st08 are covered by the driver oracle;
    // st09 shares q16's batch query verbatim).
    val st09 = graft.SparkEntry.queries("st09_stream_hist")(spark, sf)
    sym(st09, graft.SparkEntry.queries("q16_hist_registers")(spark, sf))

    // Streaming HTML extraction at ingest shares t18's batch body — the
    // stateless ingest-transform symmetry (st03/st13/st14 discipline).
    val st15 = graft.SparkEntry.queries("st15_stream_html_extract")(spark, sf)
    sym(st15, graft.SparkEntry.queries("t18_html_extract")(spark, sf))

    // Streaming filtered ANN serves the s16 batch result: same index,
    // same predicate, same top-k — the stream-static cell join plus the
    // complete-mode bounded top-k state must reproduce batch exactly.
    val st16 = graft.SparkEntry.queries("st16_stream_filtered_ann")(spark, sf)
    sym(st16, graft.SparkEntry.queries("s16_ivfpq_filtered")(spark, sf))

    // Streaming sequence packing reproduces p08's coordinates exactly:
    // per-shard running totals as state + the packCoords finalize ==
    // the batch two-level prefix sum.
    val st17 = graft.SparkEntry.queries("st17_stream_seq_pack")(spark, sf)
    sym(st17, graft.SparkEntry.queries("p08_sequence_pack")(spark, sf))

    // Streaming index ingest == batch incremental add: per-micro-batch
    // frozen-book encode + union must serve the same search results.
    val st18 = graft.SparkEntry.queries("st18_stream_index_add")(spark, sf)
    sym(st18, graft.SparkEntry.queries("s17_ivfpq_add")(spark, sf))

    // Streaming PII scrub shares t19's body — the stateless
    // ingest-transform symmetry (st15/t18 discipline).
    val st19 = graft.SparkEntry.queries("st19_stream_pii_redact")(spark, sf)
    sym(st19, graft.SparkEntry.queries("t19_pii_redact")(spark, sf))
  }

  test("streaming ivfPqAppend: per-batch encode is order- and batching-independent") {
    // Frozen-book encode is a pure per-row function, so HOW the delta is
    // micro-batched must not matter: two scrambled batches == one batch
    // == the batch operator on the union.
    implicit val sqlCtx = spark.sqlContext
    val corpus = (1L to 8L).map(i =>
      (i, Seq(i.toFloat, (i % 3).toFloat, (i % 5).toFloat, (i % 2).toFloat)))
      .toDF("vec_id", "embedding")
    val (_, coarse, book) = graft.operators.Similarity.ivfPqIndex(
      corpus, "vec_id", "embedding", nCells = 2, m = 2, kCent = 2)
    val delta = (101L to 108L).map(i =>
      (i, Seq((i % 7).toFloat, i.toFloat / 2, (i % 4).toFloat, 1.0f)))
    val input = MemoryStream[(Long, Seq[Float])]
    val out = graft.operators.Similarity.ivfPqAppend(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      coarse, book)
    val q = out.writeStream.format("memory").queryName("idxadd_out")
      .outputMode("append").start()
    try {
      val scrambled = delta.sortBy(_._1.toString.reverse)
      input.addData(scrambled.take(3): _*)
      q.processAllAvailable()
      input.addData(scrambled.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("idxadd_out")
        .as[(Long, Int, Seq[Int])].collect().toSet
      val batch = graft.operators.Similarity.ivfPqAppend(
        delta.toDF("vec_id", "embedding"), "vec_id", "embedding",
        coarse, book).as[(Long, Int, Seq[Int])].collect().toSet
      assert(streamed === batch)
      assert(streamed.size === 8)
    } finally q.stop()
  }

  test("streamingSequenceOffsets carries per-shard running totals across batches") {
    // nShards=1 so every key lands in one shard and the cross-batch
    // continuation is observable. Keys feed in HASH order split across
    // two batches — the delivery contract under which stream == batch —
    // with DISTINCT weights so any offset swap would be visible.
    implicit val sqlCtx = spark.sqlContext
    val keys = (1L to 8L)
    val weights = keys.map(k => k -> (k + 2L)).toMap
    val hashOrder = Seq(keys.map(k => (k, weights(k))): _*)
      .toDF("doc_id", "w")
      .withColumn("h", graft.operators.Sampling.keyHash60(col("doc_id")))
      .orderBy("h").select("doc_id").as[Long].collect().toSeq
    val (b1, b2) = hashOrder.splitAt(4)

    val input = MemoryStream[(Long, Long)]
    val out = Streams.streamingSequenceOffsets(
      input.toDF().toDF("doc_id", "w"), "doc_id", "w", nShards = 1)
    val q = out.toDF().writeStream.format("memory").queryName("seqpack_out")
      .outputMode("append").start()
    try {
      input.addData(b1.map(k => (k, weights(k))): _*)
      q.processAllAvailable()
      val afterB1 = spark.table("seqpack_out")
        .agg(max(col("cum"))).head.getLong(0)
      assert(afterB1 === b1.map(weights).sum,
        "batch-1 running total must equal its weight sum")
      input.addData(b2.map(k => (k, weights(k))): _*)
      q.processAllAvailable()
      val drained = spark.table("seqpack_out")
      // Batch 2 CONTINUED from batch 1's total (no state reset): its
      // first row's cum strictly exceeds the whole of batch 1.
      val b2first = drained.filter(col("key") === b2.head)
        .select(col("cum"), col("w")).head
      assert(b2first.getLong(0) === afterB1 + b2first.getLong(1))

      // Finalized coordinates == the batch operator on the same rows.
      val batch = graft.operators.Sampling.packSequences(
        keys.map(k => (k, weights(k))).toDF("doc_id", "w"),
        "doc_id", "w", seqLen = 5L, nShards = 1)
        .collect().map(_.toString).sorted.toSeq
      val streamed = graft.operators.Sampling.packCoords(
        drained, "doc_id", seqLen = 5L, nShards = 1)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streamingFirstSeen: order-free state — adversarial arrival equals batch") {
    // Ids arrive DESCENDING and split mid-key across two batches: the
    // first ARRIVAL per key is the largest id, so a dropDuplicates-style
    // first-arrival winner would differ — the (min, count) fold must not.
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((9L, "a"), (8L, "b"), (7L, "a"), (6L, "c"),
      (5L, "b"), (4L, "a"), (3L, "c"), (2L, "b"), (1L, "a"))
    val input = MemoryStream[(Long, String)]
    val out = Streams.streamingFirstSeen(
      input.toDF().toDF("doc_id", "canon"), "doc_id", "canon")
    val q = out.toDF().writeStream.format("memory").queryName("fs_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(4)
      input.addData(b1: _*); q.processAllAvailable()
      // Mid-run state is already the fold of batch 1.
      val mid = spark.table("fs_out").groupBy("key")
        .agg(min("min_id"), max("cnt")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(mid("a") === ((7L, 2L)) && mid("b") === ((8L, 1L)))
      input.addData(b2: _*); q.processAllAvailable()
      val fin = spark.table("fs_out").groupBy("key")
        .agg(min("min_id").as("keep"), max("cnt").as("n")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // == the batch first-occurrence aggregate on the same rows.
      assert(fin === Map("a" -> ((1L, 4L)), "b" -> ((2L, 3L)),
        "c" -> ((3L, 2L))))
    } finally q.stop()
  }

  test("st20 gate == d19 gate row-for-row (stream==batch on the URL dedup)") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.SparkEntry.queries("st20_stream_url_dedup")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("d19_url_dedup")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streamingSequenceOffsets: zero-weight rows fail loud (the p08 guard)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = Streams.streamingSequenceOffsets(
      input.toDF().toDF("doc_id", "w"), "doc_id", "w", nShards = 1)
    val q = out.toDF().writeStream.format("memory").queryName("seqpack_bad")
      .outputMode("append").start()
    try {
      input.addData((1L, 3L), (2L, 0L))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("weights must be >= 1"))
    } finally q.stop()
  }

  test("streamingLatestVersion: upserts on newer, silent on stale, idempotent replay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, java.lang.Long)]
    val out = Streams.streamingLatestVersion(
      input.toDF().toDF("u", "t", "e", "y", "c"), "u", "t", "e", "y", "c")
    val q = out.toDF().writeStream.format("memory").queryName("latest_out")
      .outputMode("append").start()
    def rows() = spark.table("latest_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    try {
      input.addData(Seq((1L, 10L, 100L, "a", java.lang.Long.valueOf(5L)), (1L, 20L, 101L, "b", java.lang.Long.valueOf(6L))))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 20L, 101L)), "batch 1 emits only the winner")
      // Stale row (older ts): no emission, no state change.
      input.addData(Seq((1L, 15L, 102L, "c", java.lang.Long.valueOf(7L))))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 20L, 101L)), "stale row must not emit")
      // Replay of the current winner: idempotent, no duplicate emission.
      input.addData(Seq((1L, 20L, 101L, "b", java.lang.Long.valueOf(6L))))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 20L, 101L)), "replay must not re-emit")
      // Genuinely newer: one upsert. Ties on ts break by event_id.
      input.addData(Seq((1L, 20L, 103L, "d", java.lang.Long.valueOf(8L))))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 20L, 101L), (1L, 20L, 103L)),
        "newer version must upsert once")
    } finally q.stop()
  }

  test("streamingTokenBudget carries the running total across batches") {
    // Budget 10. Batch 1: docs 1 (4 toks) and 2 (4 toks) admit, cum 4/8.
    // Batch 2: doc 3 (4 toks) pushes cum to 12 > 10 -> rejected AND the
    // category closes; doc 4 (1 tok) would fit a naive remaining-budget
    // rule (9 + 1 <= 10) but NOT the prefix rule (cum 13) — rejecting it
    // is exactly the cross-batch state the spec pins. A fresh category in
    // batch 2 starts from zero.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val out = Streams.streamingTokenBudget(
      input.toDF().toDF("doc_id", "lang", "text"), "doc_id", "lang", "text",
      budget = 10L)
    val q = out.toDF().writeStream.format("memory").queryName("budget_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "en", "a b c d"), (2L, "en", "e f g h"))
      q.processAllAvailable()
      input.addData((3L, "en", "i j k l"), (4L, "en", "m"),
        (5L, "fr", "un deux trois"))
      q.processAllAvailable()
      val got = spark.table("budget_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set((1L, "en", 4L, 4L), (2L, "en", 4L, 8L),
        (5L, "fr", 3L, 3L)), s"got $got")
    } finally q.stop()
  }
}
