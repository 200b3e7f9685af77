package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-15 operator specs: IVF-PQ index maintenance (s17/s18 —
  * incremental add/upsert under frozen books, staleness, the scan-only
  * append plan), PII scrub (t19), binary sign-bit quantization (s19),
  * URL canonicalization (t20/d19), JPEG container metadata (m15), the
  * native session_window merge (q29), the trailing RANGE frame (q28),
  * the binned interval join (q27), and pivot/unpivot (q26).
  */
class Round15OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def artifactRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])].collect().toSet

  test("ivfPqAdd == full re-encode under the SAME frozen books (the s17 oracle claim)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = e.filter($"vec_id" % 4 =!= 0)
    val delta = e.filter($"vec_id" % 4 === 0)
    val idx @ (_, coarse, book) = Similarity.ivfPqIndex(old,
      "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    val (merged, mCoarse, mBook) = Similarity.ivfPqAdd(idx, delta,
      "vec_id", "embedding")
    // Books pass through untouched (same arrays, not equal copies).
    assert(mCoarse.eq(coarse) && mBook.eq(book))
    val full = Similarity.ivfPqAppend(e, "vec_id", "embedding", coarse, book)
    assert(artifactRows(merged) === artifactRows(full),
      "build-on-old + append-delta must equal encoding the full corpus " +
        "under the old books")
    assert(merged.count() === e.count())
  }

  test("ivfPqAdd freezes the books: a fresh full-corpus rebuild derives different ones") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    def flat(b: Array[Array[Array[Long]]]) =
      b.map(_.map(_.toSeq).toSeq).toSeq
    val (_, _, oldBook) = Similarity.ivfPqIndex(
      e.filter($"vec_id" % 4 =!= 0), "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    val (_, _, freshBook) = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    // Seeds are the smallest-id vectors: the old subset excludes vec_id
    // 0/4/8, so its seed set — hence its residual codebook — differs.
    // This is WHY the s17 oracle discriminates: encoding under the wrong
    // (fresh) books would change codes and fail the hash.
    assert(flat(oldBook) !== flat(freshBook),
      "old-subset and full-corpus codebooks must differ for the add " +
        "path to be distinguishable from a rebuild")
  }

  test("withDistortion: re-encoding a codebook seed vector gives dist == 0 exactly") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = e.filter($"vec_id" % 4 =!= 0)
    val (_, coarse, book) = Similarity.ivfPqIndex(old, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    // vec_id=1 is the smallest old id => its residual IS codebook entry 0
    // in every subspace; re-encoding the same vector under a new id must
    // quantize with zero ADC error (exact integer lattice — 0.0, not
    // epsilon).
    val clone = old.filter($"vec_id" === 1L)
      .select(lit(999999L).as("vec_id"), $"embedding")
    val enc = Similarity.ivfPqAppend(clone, "vec_id", "embedding",
      coarse, book, withDistortion = true)
    val Array(row) = enc.select($"dist").as[Double].collect()
    assert(row === 0.0)
  }

  test("ivfPqStaleness: a shifted delta reads > 1; dist column is required") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = e.filter($"vec_id" % 4 =!= 0)
    val (_, coarse, book) = Similarity.ivfPqIndex(old, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    val train = Similarity.ivfPqAppend(old, "vec_id", "embedding",
      coarse, book, withDistortion = true)
    // A delta drawn from a shifted distribution: +10 on every dim (the
    // corpus lives in [-1, 1], so residuals blow up against books that
    // never saw this region) — the retrain signal must fire.
    val shifted = e.filter($"vec_id" % 4 === 0)
      .select($"vec_id",
        transform($"embedding".cast("array<double>"), x => x + lit(10.0))
          .as("embedding"))
    val drifted = Similarity.ivfPqAppend(shifted, "vec_id", "embedding",
      coarse, book, withDistortion = true)
    val Array((tr, dl, st)) = Similarity.ivfPqStaleness(train, drifted)
      .as[(Double, Double, Double)].collect()
    assert(tr > 0.0 && dl > tr && st > 1.0,
      s"shifted delta must read stale: train=$tr delta=$dl staleness=$st")
    // In-distribution delta reads ~1 (same generator, different rows).
    val Array(stIn) = Similarity.ivfPqStaleness(train,
      Similarity.ivfPqAppend(e.filter($"vec_id" % 4 === 0),
        "vec_id", "embedding", coarse, book, withDistortion = true))
      .select($"staleness").as[Double].collect()
    assert(stIn > 0.2 && stIn < 5.0,
      s"in-distribution staleness should sit near 1, got $stIn")
    assert(st > stIn, "drift must read staler than in-distribution data")

    val noDist = Similarity.ivfPqAppend(old, "vec_id", "embedding",
      coarse, book)
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfPqStaleness(noDist, drifted)
    }
    assert(err.getMessage.contains("withDistortion"))
  }

  test("ivfPqUpsert: changed ids replaced, new ids appended, the rest untouched") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val old = e.filter($"vec_id" % 4 =!= 0)
    val idx @ (artifact, coarse, book) = Similarity.ivfPqIndex(old,
      "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    val changed = e.filter($"vec_id" % 8 === 1)
      .select($"vec_id",
        transform($"embedding".cast("array<double>"), x => x + lit(1.0))
          .as("embedding"))
    val fresh = e.filter($"vec_id" % 4 === 0)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val (merged, _, _) = Similarity.ivfPqUpsert(idx,
      fresh.unionByName(changed), "vec_id", "embedding")

    // One row per id over old ∪ new; nothing dropped, nothing doubled.
    assert(merged.count() === e.count())
    assert(merged.select("id").distinct().count() === e.count())
    // Changed ids carry the NEW vector's codes (== a direct frozen-book
    // encode of the modified rows), not the original artifact's.
    val want = artifactRows(Similarity.ivfPqAppend(changed,
      "vec_id", "embedding", coarse, book))
    val gotChanged = artifactRows(merged.join(
      changed.select($"vec_id".as("id")), Seq("id")))
    assert(gotChanged === want)
    assert(gotChanged.nonEmpty)
    val origChanged = artifactRows(artifact.join(
      changed.select($"vec_id".as("id")), Seq("id")))
    assert(gotChanged !== origChanged,
      "the +1.0 re-embedding must move codes, or the spec checks nothing")
    // Untouched ids keep their original artifact rows bit-for-bit.
    val untouched = artifactRows(merged
      .join(changed.select($"vec_id".as("id")), Seq("id"), "left_anti")
      .join(fresh.select($"vec_id".as("id")), Seq("id"), "left_anti"))
    val origUntouched = artifactRows(artifact.join(
      changed.select($"vec_id".as("id")), Seq("id"), "left_anti"))
    assert(untouched === origUntouched)
  }

  test("ivfPqUpsert with a disjoint delta equals ivfPqAdd") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = Similarity.ivfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", nCells = 4, m = 4, kCent = 8)
    val delta = e.filter($"vec_id" % 4 === 0)
    val up = artifactRows(Similarity.ivfPqUpsert(idx, delta,
      "vec_id", "embedding")._1)
    val add = artifactRows(Similarity.ivfPqAdd(idx, delta,
      "vec_id", "embedding")._1)
    assert(up === add)
  }

  test("ivfPqAppend fails loud on a mis-dimensioned delta (no silent NULL codes)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val (_, coarse, book) = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    val short = e.limit(3).select($"vec_id",
      slice($"embedding".cast("array<double>"), 1, 32).as("embedding"))
    val err = intercept[Exception] {
      Similarity.ivfPqAppend(short, "vec_id", "embedding", coarse, book)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("delta vector has")), s"got: $err")
  }

  test("ivfPqAppend validates hand-supplied books (ragged coarse rejected)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val (_, coarse, book) = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    val ragged = coarse.zipWithIndex.map { case (cv, i) =>
      if (i == 2) cv ++ Array(0L) else cv
    }
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfPqAppend(e, "vec_id", "embedding", ragged, book)
    }
    assert(err.getMessage.contains("ragged coarse"))
    val badBook = book.map(_.map(_.clone())); badBook(1) = badBook(1).take(3)
    val err2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqAppend(e, "vec_id", "embedding", coarse, badBook)
    }
    assert(err2.getMessage.contains("ragged codebook"))
  }

  test("piiCounts / piiRedact: hand-computed counts, class disjointness, boundaries") {
    import graft.text.TextFunctions
    def run(s: String): (Long, Long, Long, String) = {
      val Array(r) = Seq(Tuple1(s)).toDF("t")
        .select(TextFunctions.piiCounts($"t").as("c"),
          TextFunctions.piiRedact($"t").as("r"))
        .select($"c.emails", $"c.ips", $"c.phones", $"r")
        .as[(Long, Long, Long, String)].collect()
      r
    }
    // Two emails, one IP, one phone, mixed punctuation.
    assert(run("mail a.b+c@x-y.org or d@e.io, ip 10.0.255.4, tel +44-201-55555.") ===
      ((2L, 1L, 1L, "mail [EMAIL] or [EMAIL], ip [IP], tel [PHONE].")))
    // No PII: zeros, text byte-identical.
    assert(run("plain text with @ sign alone and 1.2 version") ===
      ((0L, 0L, 0L, "plain text with @ sign alone and 1.2 version")))
    // DISJOINTNESS: the email pattern requires an ALPHABETIC TLD, so a
    // dotted-quad "domain" is not an email — the classes cannot overlap
    // and the user@ prefix survives while the quad redacts as [IP].
    assert(run("u@1.2.3.4 end") === ((0L, 1L, 0L, "u@[IP] end")))
    // Phone \b: a trailing word char breaks the boundary -> no match.
    assert(run("call +1-555-123456x") === ((0L, 0L, 0L, "call +1-555-123456x")))
  }

  // --- q29 native session_window ------------------------------------------

  test("session_window: exact-gap interval MERGES (inclusive touch); one past it splits") {
    import org.apache.spark.sql.functions.{session_window, unix_micros, timestamp_micros}
    val gapUs = 1800000000L // 30 min in micros
    val df = Seq(
      (1L, 0L), (1L, gapUs),              // EXACTLY gap apart: merged
      (1L, 2 * gapUs + 1L),               // one micro PAST the gap: new
      (2L, 5L))                           // other user isolated
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("t"))
    val got = df.groupBy($"user_id", session_window($"t", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"session_window.start").as("s"),
        unix_micros($"session_window.end").as("e"), $"n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 2 * gapUs, 2L),            // end = last event + gap
      (1L, 2 * gapUs + 1L, 3 * gapUs + 1L, 1L),
      (2L, 5L, 5L + gapUs, 1L)))
  }

  // --- q28 trailing RANGE-frame window ------------------------------------

  test("trailing range frame: inclusive horizon boundary, equal-ts peers counted") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("t").rangeBetween(-10L, 0L)
    val df = Seq(("a", 0L, 1L), ("a", 10L, 2L), ("a", 21L, 4L),
        ("a", 21L, 8L), ("b", 21L, 16L))
      .toDF("k", "t", "v")
      .select($"k", $"t", $"v", sum($"v").over(w).as("s"),
        count(lit(1)).over(w).as("n"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(df(("a", 10L, 2L, 3L, 2L)),  // t=0 is EXACTLY 10 back: included
      s"horizon boundary must be inclusive: $df")
    // Equal-ts rows are frame PEERS: both see both (sum 12 = 4+8), and
    // partitions do not leak (b's row ignores a's).
    assert(df(("a", 21L, 4L, 12L, 2L)) && df(("a", 21L, 8L, 12L, 2L)))
    assert(df(("b", 21L, 16L, 16L, 1L)))
  }

  // --- q27 binned interval join ------------------------------------------

  test("pointInInterval: half-open bounds, one row per pair across bin spans") {
    import org.apache.spark.sql.functions.col
    val iv = Seq((10L, 0L, 30L), (20L, 25L, 26L), (30L, 40L, 40L))
      .toDF("iv_id", "s", "e") // [0,30) spans 4 bins at w=8; [40,40) empty
    val pts = Seq((1L, 0L), (2L, 29L), (3L, 30L), (4L, 25L), (5L, 40L))
      .toDF("p_id", "t")
    val got = IntervalJoin.pointInInterval(pts, iv, "t", "s", "e",
        binWidth = 8L)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq
    // t==start IN, t==end OUT, empty interval matches nothing, and the
    // 4-bin interval yields each pair exactly ONCE (no dedup pass).
    assert(got.sorted === Seq((1L, 10L), (2L, 10L), (4L, 10L), (4L, 20L)))
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(pts, iv, "t", "s", "e", binWidth = 0L)
    }
  }

  test("pointInInterval == brute-force theta join; NULLs drop; plan is equi-join") {
    val rnd = new scala.util.Random(7)
    val iv = (1L to 60L).map(i =>
        (i, rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .map { case (i, a, b) => (i, math.min(a, b), math.max(a, b) + 1) }
      .toDF("iv_id", "s", "e")
    val pts = (1L to 200L).map(i => (i, rnd.nextInt(520).toLong))
      .toDF("p_id", "t")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = IntervalJoin.pointInInterval(pts, iv, "t", "s", "e", w)
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
      val brute = pts.crossJoin(iv)
        .filter($"s" <= $"t" && $"t" < $"e")
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got === brute, s"binWidth=$w diverged from the theta join")
    }
    // NULL bounds/times drop silently.
    val nulls = IntervalJoin.pointInInterval(
      Seq((1L, Some(5L)), (2L, None)).toDF("p_id", "t"),
      Seq((9L, Some(0L), Some(10L)), (8L, None, Some(10L))).toDF("iv_id", "s", "e"),
      "t", "s", "e", 4L)
    assert(nulls.select("p_id", "iv_id").as[(Long, Long)].collect().toSeq
      === Seq((1L, 9L)))
    // The plan must be an equi-join on the bucket — never the
    // nested-loop/cartesian a raw range predicate plans.
    val plan = IntervalJoin.pointInInterval(pts, iv, "t", "s", "e", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to nested loop:\n$plan")
  }

  // --- q26 pivot / unpivot -----------------------------------------------

  test("pivot == conditional aggregation; unpivot(pivot) round-trips to long form") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cents = round($"l_extendedprice" * 100).cast("long")
    val wide = li.groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O")).agg(sum(cents))
    val cond = li.groupBy("l_returnflag").agg(
      sum(when($"l_linestatus" === "F", cents)).as("F"),
      sum(when($"l_linestatus" === "O", cents)).as("O"))
    assert(wide.collect().map(_.toString).sorted.toSeq ===
      cond.collect().map(_.toString).sorted.toSeq)
    // Melt back: equals the plain long-form aggregate (NULL cells drop).
    val long = wide.unpivot(Array(col("l_returnflag")),
        Array(col("F"), col("O")), "l_linestatus", "cents")
      .filter($"cents".isNotNull)
    val direct = li.groupBy("l_returnflag", "l_linestatus").agg(sum(cents).as("cents"))
    assert(long.collect().map(_.toString).sorted.toSeq ===
      direct.collect().map(_.toString).sorted.toSeq)
    // Listed pivot plans as the two-level pivotfirst aggregate (the
    // value list fixes the schema at plan time — no distinct-values
    // collect job, which is the unlisted form's scale hazard).
    val plan = wide.queryExecution.executedPlan.toString
    assert(plan.contains("pivotfirst"), s"expected pivotfirst agg:\n$plan")
  }

  // --- m15 JPEG container metadata ---------------------------------------

  test("jpeg marker walk: synthesized fields recovered; REAL ImageIO output parses") {
    import graft.multimodal.Multimodal
    // id=10: w 74, h 58, 3 components, 1 COM -> 5 segments.
    assert(Multimodal.parseJpegMeta(Multimodal.synthesizeJpeg(10L))
      .contains((74L, 58L, 3L, 8L, 5L)))
    // id=3: w 67, h 51, 1 component, 0 COMs -> 4 segments.
    assert(Multimodal.parseJpegMeta(Multimodal.synthesizeJpeg(3L))
      .contains((67L, 51L, 1L, 8L, 4L)))
    // A REAL encoder's JPEG (javax.imageio, RGB 31x17): the walk must
    // cross true DHT segments and entropy data with byte stuffing and
    // still land on SOF0's dims — the parser is not synth-shaped.
    val bi = new java.awt.image.BufferedImage(31, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 17).foreach(y => (0 until 31).foreach(x =>
      bi.setRGB(x, y, (x * 31 + y * 7) << 8)))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", baos))
    val parsed = Multimodal.parseJpegMeta(baos.toByteArray)
    assert(parsed.isDefined, "real JPEG failed to parse")
    val (w, h, nc, prec, nseg) = parsed.get
    assert((w, h, prec) === ((31L, 17L, 8L)))
    assert(nc === 3L && nseg >= 4L)
  }

  test("jpeg parse: malformed payloads yield None, NULL rows downstream") {
    import graft.multimodal.Multimodal
    val good = Multimodal.synthesizeJpeg(7L)
    assert(Multimodal.parseJpegMeta(null).isEmpty)
    assert(Multimodal.parseJpegMeta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseJpegMeta("not a jpeg".getBytes).isEmpty)
    assert(Multimodal.parseJpegMeta(good.take(20)).isEmpty)    // truncated
    assert(Multimodal.parseJpegMeta(good.dropRight(2)).isEmpty) // no EOI
    assert(Multimodal.parseJpegMeta(good :+ 0x00.toByte).isEmpty,
      "trailing junk after EOI must reject")
    // A PNG is not a JPEG.
    assert(Multimodal.parseJpegMeta(
      Multimodal.synthesizeGrayPng(1L, 8, 8)).isEmpty)
    // ITU T.81 B.1.1.2 fill bytes: a 0xFF padding run before a marker is
    // spec-legal and must not parse as a length-framed segment.
    val soi = good.take(2)
    val rest = good.drop(2)
    val padded = soi ++ Array(0xff.toByte, 0xff.toByte) ++
      Array(0xff.toByte) ++ rest.drop(1) // re-use rest's own leading 0xff
    assert(Multimodal.parseJpegMeta(padded) ===
      Multimodal.parseJpegMeta(good), "fill bytes changed the parse")
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "garbage".getBytes,
          org.apache.spark.sql.Row("image/jpeg", 7L, "x")),
        org.apache.spark.sql.Row(2L, null,
          org.apache.spark.sql.Row("image/jpeg", 0L, null)))),
      Multimodal.mediaSchema)
    val out = Multimodal.extractJpegMeta(junk).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> true, 2L -> true))
  }

  // --- t20/d19 URL canonicalization --------------------------------------

  test("canonicalizeUrl: every rule hand-computed, case kept where RFC says so") {
    import graft.text.TextFunctions
    def canon(u: String): String =
      Seq(u).toDF("u")
        .select(TextFunctions.canonicalizeUrl($"u")).head.getString(0)
    // Fragment dropped; scheme+host lowercased; PATH case kept.
    assert(canon("HTTP://Ex.COM/PaTh#Frag") === "http://ex.com/PaTh")
    // Default ports stripped per scheme; non-default and cross-scheme kept.
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
    // ONE trailing slash; root slash collapses to bare host.
    assert(canon("http://a.com/a/b/") === "http://a.com/a/b")
    assert(canon("http://a.com/") === "http://a.com")
    // Tracking params out, survivor ORDER kept, emptied query drops '?';
    // 'utm' without the underscore is NOT a tracking prefix.
    assert(canon("http://a.com/x?b=2&utm_source=s&a=1") === "http://a.com/x?b=2&a=1")
    assert(canon("http://a.com/x?fbclid=f&gclid=g") === "http://a.com/x")
    assert(canon("http://a.com/x?utmx=1") === "http://a.com/x?utmx=1")
    // Query value case kept.
    assert(canon("http://a.com/x?Q=Vv") === "http://a.com/x?Q=Vv")
    // A trailing slash RUN strips in ONE pass (fixpoint — '/a//' must
    // not need two canonicalization rounds to reach '/a').
    assert(canon("http://a.com/a//") === "http://a.com/a")
    assert(canon("http://a.com///") === "http://a.com")
    // Userinfo stripped — credentials never survive canonicalization,
    // and the '@' must not corrupt the host/port split.
    assert(canon("http://User:Pw@A.com:8080/x") === "http://a.com:8080/x")
    assert(canon("https://u@A.com:443/x") === "https://a.com/x")
    // Not scheme://host shaped: passthrough minus fragment/trailing slash.
    assert(canon("mailto:a@b.c") === "mailto:a@b.c")
    assert(canon("not a url#frag") === "not a url")
  }

  test("canonicalizeUrl is idempotent over the t20 synthesized family") {
    val out = graft.SparkEntry.queries("t20_url_canon")(spark, sf)
    import graft.text.TextFunctions
    val twice = out.withColumn("canon2",
      TextFunctions.canonicalizeUrl($"canon"))
    assert(twice.filter(!($"canon" <=> $"canon2")).count() === 0L,
      "canonical form must be a fixpoint")
    // The dedup gate actually deduplicates: fewer canons than docs.
    val d = graft.SparkEntry.queries("d19_url_dedup")(spark, sf)
    val (groups, docs) = (d.count(), out.count())
    assert(groups < docs, s"no collapsing: $groups groups for $docs docs")
    assert(d.agg(sum("n_dups")).head.getLong(0) === docs)
  }

  // --- s19 binary (sign-bit) quantization --------------------------------

  test("binaryCodes: hand-computed packing, zero is a 0 bit, ragged tail word") {
    val df = Seq(
      (1L, Seq(0.1, -0.2, 0.0, 2.0, -0.5)), // bits 1,0,0,1,0
      (2L, Seq(-1.0, 3.0, 4.0, -1.0, 1.0)), // bits 0,1,1,0,1
      (3L, Seq(0.0, 0.0, 0.0, 0.0, 0.0))    // all zero -> all-zero words
    ).toDF("id", "v")
    val got = Similarity.binaryCodes(df, "id", "v", dim = 5, bitsPerWord = 3)
      .as[(Long, Seq[Long])].collect().toMap
    // Word 0 packs dims 0-2 (bit b = dim 3w+b), word 1 packs dims 3-4.
    assert(got(1L) === Seq(1L, 1L))
    assert(got(2L) === Seq(6L, 2L))
    assert(got(3L) === Seq(0L, 0L))
    intercept[IllegalArgumentException] {
      Similarity.binaryCodes(df, "id", "v", dim = 5, bitsPerWord = 63)
    }
    intercept[IllegalArgumentException] {
      Similarity.binaryCodes(df, "id", "v", dim = 5, bitsPerWord = 0)
    }
  }

  test("binaryHammingTopK matches brute-force sign-bit Hamming; bitsPerWord-invariant") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = e.filter($"vec_id" <= 3)
    val got = Similarity.binaryHammingTopK(e, queries, "vec_id", "embedding",
        dim = 64, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // Brute force: sign bits in Scala, per-query sort (ham, id), top 5.
    val vecs = e.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val bits = vecs.map { case (id, v) => id -> v.map(_ > 0d).toArray }.toMap
    val expected = (for {
      q <- vecs.filter(_._1 <= 3L)
      ranked = vecs.filter(_._1 != q._1)
        .map { case (id, _) =>
          (id, bits(q._1).zip(bits(id)).count { case (a, b) => a != b }.toLong) }
        .sortBy { case (id, h) => (h, id) }.take(5)
      ((id, h), i) <- ranked.zipWithIndex
    } yield (q._1, id, h, i + 1L)).toSet
    assert(got === expected)
    // The word width is an implementation detail of the packing: any
    // legal bitsPerWord yields the same Hamming surface.
    for (bpw <- Seq(7, 62)) {
      val alt = Similarity.binaryHammingTopK(e, queries, "vec_id",
          "embedding", dim = 64, k = 5, bitsPerWord = bpw)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(alt === expected, s"bitsPerWord=$bpw changed the output")
    }
  }

  test("binaryHammingTopKReranked with shortlist = corpus equals exact lattice-L2 top-k") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = e.count().toInt
    val got = Similarity.binaryHammingTopKReranked(e,
        e.filter($"vec_id" <= 1), "vec_id", "embedding",
        dim = 64, k = 5, shortlist = n)
      .as[(Long, Long, Long, Long)].collect().toSet
    // Shortlisting everything leaves pure exact re-rank: micro-lattice
    // integer squared-L2, ties to the smaller id.
    val vq = e.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        id -> v.map(graft.functions.QuantizeMicros.roundMicros) }
    val expected = (for {
      q <- vq.filter(_._1 <= 1L)
      ranked = vq.filter(_._1 != q._1)
        .map { case (id, v) =>
          (id, q._2.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(5)
      ((id, d), i) <- ranked.zipWithIndex
    } yield (q._1, id, d, i + 1L)).toSet
    assert(got === expected)
    intercept[IllegalArgumentException] {
      Similarity.binaryHammingTopKReranked(e, e.filter($"vec_id" <= 1),
        "vec_id", "embedding", dim = 64, k = 5, shortlist = 4)
    }
  }

  test("binaryHammingTopK with a pre-encoded codesOf artifact equals inline encode") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter($"vec_id" <= 3)
    val inline = Similarity.binaryHammingTopK(e, q, "vec_id", "embedding",
      dim = 64, k = 5).collect().map(_.toString).sorted.toSeq
    val codes = Similarity.binaryCodes(e, "vec_id", "embedding", dim = 64)
      .localCheckpoint(true)
    val viaArtifact = Similarity.binaryHammingTopK(e, q, "vec_id",
        "embedding", dim = 64, k = 5, codesOf = Some(codes))
      .collect().map(_.toString).sorted.toSeq
    assert(viaArtifact === inline)
    // A dim/bitsPerWord mismatch against the artifact fails LOUD — a
    // silent NULL-score path would return empty results instead.
    val err = intercept[Exception] {
      Similarity.binaryHammingTopK(e, q, "vec_id", "embedding",
        dim = 64, k = 5, bitsPerWord = 16, codesOf = Some(codes)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(err).exists(_.contains("codesOf artifact")), s"got: $err")
  }

  test("binaryHammingTopK plan: query codes broadcast, corpus never shuffled pre-score") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.binaryHammingTopK(e, e.filter($"vec_id" <= 3),
        "vec_id", "embedding", dim = 64, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"queries must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must not shuffle into a merge join:\n$plan")
  }

  test("ivfPqAppend plan: one scan, no shuffle, no join, stays in codegen") {
    // The incremental path's whole point at 100 TB: encoding a delta
    // against frozen books must not touch the existing index and must
    // not shuffle the delta — a pure projection pipeline.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val (_, coarse, book) = Similarity.ivfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, kCent = 8)
    val plan = Similarity.ivfPqAppend(e, "vec_id", "embedding",
      coarse, book, withDistortion = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"append must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"append must not join:\n$plan")
    assert(plan.contains("*(1)"), s"append fell out of codegen:\n$plan")
  }
}
