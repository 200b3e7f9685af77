package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Ports the reference kernels' algebraic unit tests
  * (`finite_axpb.rs:141-213`, `kcore_merge.rs:205-259`).
  */
class KernelSpec extends AnyFunSuite with SparkTestHarness {
  import FiniteAxpb.axpb

  private def longs(n: Int): Seq[Long] = {
    val rng = new scala.util.Random(42)
    Seq.fill(n)(rng.nextLong()) ++ Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue)
  }

  test("axpb: zero multiplier is the constant map") {
    for (x <- longs(50); b <- Seq(0L, 7L, -3L)) assert(axpb(0L, x, b) === b)
  }

  test("axpb: zero input is the constant map") {
    for (a <- longs(50); b <- Seq(0L, 7L, -3L)) assert(axpb(a, 0L, b) === b)
  }

  test("axpb: identity multiplier is XOR with b") {
    for (x <- longs(50); b <- Seq(0L, 7L, -3L)) assert(axpb(1L, x, b) === (x ^ b))
  }

  test("axpb: carry-less multiplication commutes") {
    val vs = longs(30)
    for (a <- vs; x <- vs.take(10)) assert(axpb(a, x, 0L) === axpb(x, a, 0L))
  }

  test("axpb: bit-63 reduction path") {
    assert(axpb(Long.MinValue, 0x3L, 0L) === (Long.MinValue ^ 0x1bL))
  }

  test("axpb: XOR distributes over the affine term") {
    for (a <- longs(20); x <- longs(5); b <- Seq(13L, -99L))
      assert(axpb(a, x, b) === (axpb(a, x, 0L) ^ b))
  }

  test("axpb: SQL expression matches the host kernel (codegen parity)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (0L, 5L, 7L), (1L, 5L, 7L), (Long.MinValue, 3L, 0L),
      (123456789L, -987654321L, 42L), (-1L, -1L, -1L))
    val got = rows.toDF("a", "x", "b")
      .select(FiniteAxpb.finite_axpb(col("a"), col("x"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === rows.map { case (a, x, b) => axpb(a, x, b) })
  }

  test("axpb: null propagation in SQL") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(1L), None: Option[Long], Some(2L))).toDF("a", "x", "b")
    val got = df.select(FiniteAxpb.finite_axpb(col("a"), col("x"), col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  import KCoreMerge.merge

  test("kcore_merge: rule cases from the reference") {
    assert(merge(Array.empty[Long], 5L) === 0L)
    assert(merge(Array(1L), 1L) === 1L)
    assert(merge(Array(2L, 2L), 2L) === 2L)
    assert(merge(Array(1L, 1L, 1L), 3L) === 1L)
    assert(merge(Array(5L, 5L, 5L), 3L) === 3L)
    assert(merge(Array(2L, 2L, 1L), 4L) === 2L)
    assert(merge(Array(-5L, -1L), 3L) === 0L)
  }

  test("kcore_merge: capped by current core") {
    assert(merge(Array(9L, 9L, 9L, 9L), 2L) === 2L)
  }

  test("kcore_merge: pathological Long.MaxValue inputs do not OOM") {
    assert(merge(Array(Long.MaxValue, Long.MaxValue), Long.MaxValue) === 2L)
    assert(merge(Array(Long.MaxValue), 1L) === 1L)
  }

  test("kcore_merge: SQL expression with NULL semantics") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(Seq(2L, 2L)), 2L),
      (2L, None, 7L),            // NULL list => keep current core
      (3L, Some(Seq.empty[Long]), 3L)
    ).toDF("id", "nbrs", "core")
    val got = df.select(col("id"), KCoreMerge.kcore_merge(col("nbrs"), col("core")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 7L, 3L -> 0L))
  }

  test("first_zero_band: lowest all-zero r-bit group, -1 when none") {
    import FirstZeroBand.kernel
    assert(kernel(0L, 2, 32) === 0)                  // identical sigs: band 0
    assert(kernel(0x3L, 2, 32) === 1)                // band 0 dirty, band 1 clean
    assert(kernel(0xfL, 2, 32) === 2)
    assert(kernel(-1L, 2, 32) === -1)                // every group dirty
    assert(kernel(0xffffL, 16, 4) === 1)             // chunk width 16
    assert(kernel(java.lang.Long.parseLong("10", 2), 1, 64) === 0) // bit 0 clean
    // Matches a brute-force scan on random values.
    val rnd = new scala.util.Random(3)
    (1 to 200).foreach { _ =>
      val x = rnd.nextLong()
      val r = Seq(1, 2, 4, 8, 16)(rnd.nextInt(5))
      val nBands = 64 / r
      val mask = (1L << r) - 1L
      val expected = (0 until nBands).find(b => ((x >>> (b * r)) & mask) == 0L).getOrElse(-1)
      assert(FirstZeroBand.kernel(x, r, nBands) === expected, s"x=$x r=$r")
    }
  }

  test("h_index aggregate == uncapped kcore_merge over collect_list (random multisets)") {
    // The distributed k-core's fused aggregate: h_index computes the
    // H-index from a map-side-combinable histogram; capping by the current
    // core moves outside (least). Pin the identity against the reference
    // rule kernel on random multisets.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 1 to 40
      _ <- 0 until (1 + rnd.nextInt(30))
    } yield (g.toLong, rnd.nextInt(12).toLong)
    val got = rows.toDF("g", "v").groupBy("g")
      .agg(HIndexAgg.h_index(col("v")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> merge(vs.map(_._2).toArray, Long.MaxValue)
    }
    assert(got === expected)
  }

  test("label_mode aggregate == sorted strict-'>' run-length fold (random multisets)") {
    // LPA's fused aggregate: the histogram mode with smallest-label
    // tie-break must equal the fold the driver sweep (and the g12 SQL
    // oracle) computes — ascending sort, replace best only on a strictly
    // longer run, so the smallest among the most frequent wins.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def foldMode(vs: Seq[Long]): Long = {
      val sorted = vs.sorted
      var best = 0L; var bestCnt = 0L; var cur = 0L; var curCnt = 0L
      sorted.foreach { x =>
        curCnt = if (x == cur && curCnt > 0) curCnt + 1 else 1
        if (curCnt > bestCnt) { best = x; bestCnt = curCnt }
        cur = x
      }
      best
    }
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- 1 to 40
      _ <- 0 until (1 + rnd.nextInt(30))
    } yield (g.toLong, (rnd.nextInt(8) - 2).toLong) // include negatives
    val got = rows.toDF("g", "v").repartition(7).groupBy("g")
      .agg(LabelModeAgg.label_mode(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) => g -> foldMode(vs.map(_._2)) }
    assert(got === expected)
    // Explicit tie-break: {5,5,2,2} -> 2; all-distinct -> smallest.
    assert(foldMode(Seq(5L, 2L, 5L, 2L)) === 2L)
    val tie = Seq((1L, 5L), (1L, 2L), (1L, 5L), (1L, 2L), (2L, 9L), (2L, 4L), (2L, 7L))
      .toDF("g", "v").groupBy("g").agg(LabelModeAgg.label_mode(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tie === Map(1L -> 2L, 2L -> 4L))
  }

  test("array_dot: DuckDB list_dot_product edge semantics — mismatch and nulls raise") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def run(a: Seq[java.lang.Double], b: Seq[java.lang.Double]) =
      Seq((a, b)).toDF("a", "b")
        .select(ArrayDot.array_dot(col("a").cast("array<double>"), col("b").cast("array<double>")))
        .collect()
    assert(run(Seq(1.0, 2.0), Seq(3.0, 4.0)).head.getDouble(0) === 11.0)
    val mismatch = intercept[Exception] { run(Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0)) }
    assert(mismatch.getMessage.contains("lengths must be equal")
      || mismatch.getCause.getMessage.contains("lengths must be equal"))
    val withNull = intercept[Exception] { run(Seq(1.0, null), Seq(3.0, 4.0)) }
    assert(withNull.getMessage.contains("null elements")
      || withNull.getCause.getMessage.contains("null elements"))
  }

  test("top_k_by_score: heap semantics — ties, k > group, partial merge") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // Many partitions force map-side partials + a merge at the reduce.
    val rows = (1L to 1000L).map(i => (i % 7, (i % 13).toDouble / 13.0, i))
    val df = s.createDataset(s.sparkContext.parallelize(rows, 16)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKByScore.top_k_by_score(col("score"), col("id"), 5).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    // Reference: plain Scala sort, (score DESC, id ASC), take 5.
    val expect = rows.groupBy(_._1).view.mapValues(_
      .map(t => (t._2, t._3))
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(5)).toMap
    assert(got === expect)
    // k larger than the group: all rows come back, still ordered.
    val small = Seq((0L, 0.5, 1L), (0L, 0.7, 2L), (0L, 0.5, 0L)).toDF("g", "score", "id")
    val all = small.groupBy("g")
      .agg(TopKByScore.top_k_by_score(col("score"), col("id"), 10).as("tk"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(all === Seq((0.7, 2L), (0.5, 0L), (0.5, 1L)))
  }

  test("portable hash60: pinned against the SQL formulation's value") {
    // ('0x' || substr(md5('hello world'), 1, 15))::BIGINT in DuckDB — the
    // cross-engine contract the d04/t03 oracles rely on.
    assert(PortableHashes.portableHash60("hello world") === 426544247714475757L)
    // And the Spark SQL replica agrees with the kernel.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val words = Seq("a", "tiny doc", "the quick brown fox", "", "ümlaut test")
    val viaSql = words.toDF("t")
      .select(conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === words.map(PortableHashes.portableHash60))
  }

  test("portable ngram hashes: ordered/distinct modes match the composable formulas") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      "the quick brown fox jumps over the quick brown fox again",
      "one two", "", "a b c a b c a b c").toDF("t")
    def hashed(g: org.apache.spark.sql.Column) =
      conv(substring(md5(g), 1, 15), 16, 10).cast("long")
    val ordered = docs.select(
      PortableHashes.portableNgramHashes(col("t"), 3, distinct = false).as("k"),
      transform(graft.text.TextFunctions.tokenNgrams(col("t"), 3), g => hashed(g)).as("f"))
      .collect()
    ordered.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    val distinct = docs.select(
      PortableHashes.portableNgramHashes(col("t"), 3, distinct = true).as("k"),
      transform(array_distinct(graft.text.TextFunctions.tokenNgrams(col("t"), 3)), g => hashed(g)).as("f"))
      .collect()
    distinct.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("winnow_min kernel == composable rolling-min formulation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(30)(Seq.fill(rng.nextInt(12))(rng.nextLong())) :+
      Seq.empty[Long] :+ Seq(5L) :+ Seq(3L, 3L, 3L, 3L, 3L)
    val df = rows.toDF("h")
    for (w <- Seq(1, 3, 4, 7)) {
      val cnt = size(col("h")) - lit(w - 1)
      val composable = array_distinct(
        when(cnt >= 1,
          transform(sequence(lit(1), cnt), i => array_min(slice(col("h"), i, lit(w)))))
          .otherwise(array().cast("array<bigint>")))
      val got = df.select(
        PortableHashes.winnowMin(col("h"), w).as("k"), composable.as("f")).collect()
      got.foreach(r => assert(r.getSeq[Long](0).sorted === r.getSeq[Long](1).sorted, s"w=$w"))
    }
  }
}
