package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Spectral post-processing on the exact integer Gram matrix: power
  * iteration for the TOP EIGENVECTOR (the leading PCA direction — the
  * quality/diversity axis semantic-curation pipelines project onto).
  *
  * The DISTRIBUTED work is the Gram build
  * ([[graft.functions.GramMatrixAgg]]: corpus → one dim² row, map-side
  * combined); the iteration itself runs on the driver over that bounded
  * dim² array — the same bounded-driver-step discipline as k-means'
  * centroid update. Every step is INTEGER arithmetic:
  *
  *   - `u = G·v` exactly (|u| ≤ dim · max|G| · 1001 < 2^63 for
  *     micro-lattice corpora at dim 64);
  *   - renormalize `v' = u / max(1, max|u| / 1000)` with TRUNCATING
  *     division (Java `/`): DuckDB's BIGINT `//` truncates toward zero
  *     (probed: `(-7)//2 = -3`, NOT floor's `-4`), and the two engines
  *     must agree on negative components.
  *
  * Fixed iteration count, no convergence test — determinism over
  * adaptivity, like every other gated loop here. Output: `[i, eig_micros]`
  * (the ~±1000-scaled direction after `iters` rounds).
  */
object Spectral {

  /** `init`: warm-start the iteration from yesterday's direction (e04 —
    * continual training for the spectral family, the k03 discipline):
    * power iteration is a pure function of (Gram, v), so resuming over
    * the grown corpus's Gram from the prior ~±1000-scale `eig_micros`
    * array is bit-identical to a cold run that reached the same state —
    * the init seam is the ONLY new code, and a near-converged seed
    * aligns in 1–2 rounds where the cold all-ones seed needs the full
    * schedule. The array must be on the renormalized lattice (the
    * overflow bound in the scaladoc above assumes |v| ≲ 1000) — a
    * foreign-scale seed is refused loudly; the caller's array is
    * defensively cloned.
    */
  def topEigenvector(embeddings: DataFrame, idCol: String, vecCol: String,
      iters: Int, init: Option[Array[Long]] = None): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters out of range: $iters")
    val spark = embeddings.sparkSession
    val g = KMeans.quantize(embeddings, idCol, vecCol)
      .agg(graft.functions.GramMatrixAgg.gram_matrix(col("vq")).as("g"))
      .head().getSeq[Long](0).toArray
    val dim = math.sqrt(g.length.toDouble).toInt
    require(dim * dim == g.length, s"gram length ${g.length} is not square")

    var v = init match {
      case None => Array.fill(dim)(1000L)
      case Some(a) =>
        require(a.length == dim,
          s"init direction has ${a.length} components, corpus dim is $dim")
        require(a.exists(_ != 0L), "init direction is all zeros")
        require(a.forall(x => math.abs(x) <= 2000L),
          "init direction is off the ~±1000 renormalized lattice " +
            s"(max |component| ${a.map(math.abs).max}) — pass a prior " +
            "eig_micros output, not a raw vector")
        a.clone()
    }
    for (_ <- 1 to iters) {
      val u = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        var acc = 0L
        var j = 0
        while (j < dim) {
          acc = Math.addExact(acc, Math.multiplyExact(g(i * dim + j), v(j)))
          j += 1
        }
        u(i) = acc
        i += 1
      }
      val m = u.map(math.abs).max
      val scale = math.max(1L, m / 1000L)
      v = u.map(_ / scale)
    }
    val rows = v.zipWithIndex.map { case (x, i) => Row(i.toLong, x) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(StructField("i", LongType, nullable = false),
        StructField("eig_micros", LongType, nullable = false))))
  }

  /** Per-vector projection onto the trained direction — the downstream
    * curation score (`rank by |projection|` = distance along the leading
    * variance axis). One codegen corpus scan: the ~±1000-scale direction
    * folds in as a literal array and the dot runs through the
    * [[graft.functions.ArrayDot]] kernel — every product and partial sum
    * is an exact integer below 2^53, so the double-domain dot is
    * order-independent and engine-exact; `// 1000` (truncating) lands the
    * score back on the micro lattice. Output `[<idCol>, score_micros]`.
    */
  def pcaScores(embeddings: DataFrame, idCol: String, vecCol: String,
      iters: Int): DataFrame = {
    import graft.functions.ArrayDot.array_dot
    val eig = topEigenvector(embeddings, idCol, vecCol, iters)
      .orderBy("i").collect().map(_.getLong(1))
    KMeans.quantize(embeddings, idCol, vecCol)
      .withColumn("__dot", array_dot(col("vq").cast("array<double>"),
        typedLit(eig.map(_.toDouble).toSeq)))
      .select(col("id").as(idCol),
        expr("CAST(__dot AS BIGINT) div 1000").as("score_micros"))
  }
}
