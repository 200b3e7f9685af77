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
