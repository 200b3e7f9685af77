package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FiniteAxpb, FirstZeroBand, PortableHashes}

class GraftExtensionsSpec extends AnyFunSuite with SparkTestHarness {

  /** A sibling session (same SparkContext) built WITH the extensions —
    * function registration is per-session state, so the shared harness
    * session stays untouched.
    */
  private lazy val ext: SparkSession = {
    val base = spark // force harness session (and its SparkContext) first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder().master(base.sparkContext.master)
      .withExtensions(new GraftExtensions).getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("scalar kernels resolve and match their host kernels from plain SQL") {
    val combiningAcute = "́"
    val compatForms = "Ａﬁ²" // fullwidth A, fi ligature, ²
    val r = ext.sql(
      s"""SELECT nfc_normalize('cafe$combiningAcute') AS nfc,
        |  nfkc_normalize('$compatForms') AS nfkc,
        |  finite_axpb(3L, 5L, 7L) AS axpb,
        |  array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  kcore_merge(array(3L, 1L, 3L), 2L) AS km,
        |  first_zero_band(12L, 2, 32) AS fzb,
        |  shingle_hashes('a b c d', 3) AS sh,
        |  minhash_signature(shingle_hashes('a b c d', 3), 4) AS mh,
        |  simhash64(portable_ngram_hashes('a b c d e', 2, true)) AS sim,
        |  cosine_lsh_bits(CAST(array(1.0, -2.0, 0.5) AS ARRAY<FLOAT>), 8) AS lsh,
        |  winnow_min(portable_ngram_hashes('a b c d e', 2, false), 3) AS wm,
        |  quantize_micros(array(0.5D, -1.25D, 0.0000025D)) AS qm
        |""".stripMargin).head()
    assert(r.getAs[String]("nfc") == "caf\u00e9")
    assert(r.getAs[String]("nfkc") == "Afi2")
    assert(r.getAs[Long]("axpb") == FiniteAxpb.axpb(3L, 5L, 7L))
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Long]("km") ==
      graft.functions.KCoreMerge.merge(Array(3L, 1L, 3L), 2L))
    assert(r.getAs[Int]("fzb") == FirstZeroBand.kernel(12L, 2, 32))
    assert(r.getSeq[Long](r.fieldIndex("sh")).nonEmpty)
    assert(r.getSeq[Long](r.fieldIndex("mh")).length == 4)
    // parity with the Column-API kernels on identical input
    val viaApi = ext.range(1).select(
      graft.functions.TextHashes.simhash64(
        graft.functions.PortableHashes.portableNgramHashes(
          org.apache.spark.sql.functions.lit("a b c d e"), 2, distinct = true)).as("sim"),
      graft.functions.TextHashes.cosineLshBits(
        org.apache.spark.sql.functions.expr("CAST(array(1.0, -2.0, 0.5) AS ARRAY<FLOAT>)"), 8).as("lsh"))
      .head()
    assert(r.getAs[Long]("sim") == viaApi.getAs[Long]("sim"))
    assert(r.getAs[Long]("lsh") == viaApi.getAs[Long]("lsh"))
    val expectedWm = {
      val hs = Seq("a b", "b c", "c d", "d e").map(PortableHashes.portableHash60)
      hs.sliding(3).map(_.min).toList.distinct
    }
    assert(r.getSeq[Long](r.fieldIndex("wm")).toList == expectedWm)
    assert(r.getSeq[Long](r.fieldIndex("qm")).toList ==
      List(500000L, -1250000L, 3L)) // 2.5 micros rounds away from zero
  }

  test("aggregate kernels resolve from plain SQL with partial aggregation") {
    ext.range(0, 100).selectExpr("id % 5 AS g", "id AS v",
      "CAST(id AS DOUBLE) AS s").createOrReplaceTempView("ext_agg_in")
    val hi = ext.sql(
      "SELECT g, h_index(v) AS h FROM ext_agg_in GROUP BY g ORDER BY g")
    // group g holds {g, g+5, ..., g+95}: 20 values, h-index = the largest h
    // with h members >= h.
    val rows = hi.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.values.forall(h => h >= 15 && h <= 20))
    val tk = ext.sql(
      """SELECT g, top_k_by_score(s, v, 2) AS tk FROM ext_agg_in GROUP BY g""")
      .selectExpr("g", "tk.id AS ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // top-2 scores per group are the two largest ids.
    assert(tk(0L) == List(95L, 90L))
    assert(tk(4L) == List(99L, 94L))
    val plan = hi.queryExecution.executedPlan.toString
    assert(plan.contains("partial_h_index") || plan.contains("h_index"),
      s"aggregate missing from plan:\n$plan")
    val vs = ext.sql(
      "SELECT g, vector_sum(array(v, 2L * v)) AS s FROM ext_agg_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // group g sums ids {g, g+5, ..., g+95}: 20 terms, sum = 20g + 950.
    assert(vs(0L) == List(950L, 1900L))
    assert(vs(3L) == List(1010L, 2020L))
    // label_mode: mode of v % 25 within group g is every value once (tie),
    // so the smallest — g itself — wins the tie-break.
    val lm = ext.sql(
      "SELECT g, label_mode(v % 25) AS m FROM ext_agg_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // gram_matrix: 2 rows [1,2],[3,4] -> [1+9, 2+12, 2+12, 4+16].
    val gm2 = ext.sql(
      "SELECT gram_matrix(g) FROM (SELECT array(1L, 2L) AS g UNION ALL SELECT array(3L, 4L))")
      .head().getSeq[Long](0)
    assert(gm2 == Seq(10L, 14L, 14L, 20L), s"got $gm2")
    // bloom_words: positions {0, 65} set bits in words 0 and 1.
    val bw = ext.sql(
      "SELECT bloom_words(p, 128) FROM (SELECT CAST(0 AS BIGINT) AS p UNION ALL SELECT 65)")
      .head().getSeq[Long](0)
    assert(bw == Seq(1L, 2L), s"got $bw")
  }

  test("non-literal static parameters are rejected with a clear error") {
    val e = intercept[Exception] {
      ext.sql("SELECT shingle_hashes('a b c', CAST(rand() * 3 AS INT))").head()
    }
    assert(e.getMessage.contains("literal integer"))
  }
}
