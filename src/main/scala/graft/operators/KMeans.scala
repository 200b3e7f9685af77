package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.ArrayDot.array_dot
import graft.functions.VectorSumAgg.vector_sum

/** Distributed Lloyd's k-means over an embedding column — the trainer that
  * produces the coarse centroids [[Similarity.ivfCosineTopK]] consumes
  * (reference ANN indexes train these offline; here the trainer is part of
  * the engine).
  *
  * DESIGN — quantized ("lattice") k-means, engine-exact by construction:
  *   - Points are quantized once to integer MICROS
  *     (`round(x * 1e6)` per component, 64-bit). Squared-L2 distances of
  *     micro-lattice points are EXACT integers (dim x (2e6)^2 ~ 2.6e14 per
  *     term, far below 2^53), so assignment has zero float drift.
  *   - Centroid update rounds DOWN to the lattice:
  *     `floorDiv(sum_micros, count)` per dimension. Sums are exact 64-bit
  *     integers ([[graft.functions.VectorSumAgg]]); empty cells keep their
  *     previous centroid.
  *   - Ties (equidistant cells) break to the smaller cell id.
  *   Every step is therefore a pure integer function of the input —
  *   bit-reproducible across engines, partitionings and retries, and
  *   replayable in ANSI SQL (the `k01` oracle unrolls the iterations).
  *
  * SCALE — per iteration: one corpus scan with the k centroids FOLDED INTO
  * a single codegen projection (literal vectors — no join, no broadcast
  * table, no shuffle on the big side), then one map-side-combining
  * aggregate whose shuffled state is `k x dim` longs per partition. The
  * driver holds only the k centroids. Iterations are driver-synchronous
  * like every Lloyd's implementation. Int64 headroom: component sums
  * overflow only past ~9e12 points per cell at unit-scale embeddings
  * (checked via `Math.addExact` — overflow raises, never wraps).
  */
object KMeans {

  /** `[id, vq]` with `vq` = integer-micro quantization of the vector
    * (native kernel — the `transform` + `round` lambda formulation is
    * interpreted and dominates the whole fit at scale; see
    * [[graft.functions.QuantizeMicros]]).
    */
  def quantize(points: DataFrame, idCol: String, vecCol: String): DataFrame =
    points.select(col(idCol).as("id"),
      graft.functions.QuantizeMicros.quantize_micros(
        col(vecCol).cast("array<double>")).as("vq"))

  /** `(cellId, centroid_micros)` for the k initial centroids: the k
    * smallest-id points, cell ids in id order (deterministic, replayable —
    * the same discipline as [[Similarity.ivfCosineTopK]]'s default index).
    */
  private def initCentroids(q: DataFrame, k: Int): Array[Array[Long]] =
    q.orderBy(col("id")).limit(k).select(col("vq")).collect()
      .map(_.getSeq[Long](0).toArray)

  /** Exact integer squared-L2 to a literal centroid, via the expansion
    * `|v|^2 - 2 v.c + |c|^2` (all terms < 2^53 so the double arithmetic of
    * [[array_dot]] is exact; `vq2` is computed once per row, so each extra
    * centroid costs one dot product per point).
    */
  private def dist2(vqd: Column, vq2: Column, cv: Array[Long]): Column = {
    val c2 = cv.foldLeft(0L)((acc, x) => Math.addExact(acc, Math.multiplyExact(x, x)))
    vq2 - lit(2.0) * array_dot(vqd, typedLit(cv.map(_.toDouble).toSeq)) + lit(c2.toDouble)
  }

  /** `[id, (vq,) cell, d2]`: nearest centroid (ties to the smaller cell)
    * and the exact integer squared distance, as two stacked codegen
    * projections over `q`: the first materializes the k distances (each
    * dot product evaluated ONCE), the second takes `least` + a linear
    * first-match when-chain — the argmin with smallest-cell tie-break, no
    * per-row struct array or sort. `keepVq` threads the quantized vector
    * through for the centroid update, so the update aggregates straight
    * off the assignment scan with NO join back to the points.
    */
  private def assignTo(q: DataFrame, centroids: Array[Array[Long]],
      keepVq: Boolean = false): DataFrame = {
    val k = centroids.length
    val dNames = centroids.indices.map(i => s"_d$i")
    val carried = if (keepVq) Seq(col("vq")) else Nil
    val distances = q
      .withColumn("vqd", col("vq").cast("array<double>"))
      .withColumn("vq2", array_dot(col("vqd"), col("vqd")))
      .select(col("id") +: carried ++:
        centroids.zipWithIndex.map { case (cv, i) =>
          dist2(col("vqd"), col("vq2"), cv).as(dNames(i))
        }.toIndexedSeq: _*)
    val dmin = ColumnKernels.leastOf(dNames.map(col))
    val cell = ColumnKernels.firstMatchIndex(dNames.map(col), col("_dmin"))
    distances.withColumn("_dmin", dmin)
      .select(col("id") +: carried ++: Seq(
        cell.as("cell"), col("_dmin").cast(LongType).as("d2")): _*)
  }

  /** Train centroids: `nIter` Lloyd iterations from the deterministic init
    * — or, when `initOpt` is given, from CALLER-PROVIDED centroids: the
    * warm-start / continual-training form (k03). Yesterday's fit resumes
    * over today's grown corpus instead of re-running the whole schedule:
    * Lloyd is a pure function of (points, current centroids), so the
    * resumed iterations are bit-identical to what a longer cold run
    * would do had it reached these centroids — no new semantics, just
    * the init seam the daily cadence needs. Returns the final
    * `(cellId -> centroid_micros)` table (size k — driver resident by
    * design, like every coarse-quantizer index).
    */
  def fitCentroids(points: DataFrame, idCol: String, vecCol: String,
      k: Int, nIter: Int,
      initOpt: Option[Array[Array[Long]]] = None): Array[Array[Long]] =
      CacheScope.scopedValue { scope =>
    require(k >= 1 && nIter >= 0, s"need k >= 1, nIter >= 0, got k=$k nIter=$nIter")
    initOpt.foreach(init => require(init.length == k,
      s"warm-start centroids carry k=${init.length}, caller asked k=$k"))
    // Quantized points are scanned nIter+1 times (init + per-iteration
    // assignment-aggregate) — cache the quantization, release on return.
    val q = scope.cache(quantize(points, idCol, vecCol))
    var centroids = initOpt.map(_.map(_.clone())).getOrElse(initCentroids(q, k))
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    var it = 0
    while (it < nIter) {
      val sums = assignTo(q, centroids, keepVq = true)
        .groupBy("cell")
        .agg(vector_sum(col("vq")).as("vsum"), count(lit(1)).as("cnt"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cell = r.getInt(0)
        val vsum = r.getSeq[Long](1)
        val cnt = r.getLong(2)
        require(vsum.length == dim, s"ragged centroid sum in cell $cell")
        next(cell) = vsum.map(Math.floorDiv(_, cnt)).toArray
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Train + assign: `[<idCol>, cell, d2]` for every point after `nIter`
    * iterations — cell is the final cluster, d2 the exact integer squared
    * micro-distance to its centroid.
    */
  def fitAssign(points: DataFrame, idCol: String, vecCol: String,
      k: Int, nIter: Int): DataFrame = {
    val centroids = fitCentroids(points, idCol, vecCol, k, nIter)
    assignTo(quantize(points, idCol, vecCol), centroids)
      .withColumnRenamed("id", idCol)
  }

  /** Assign points to FROZEN centroids (k02) — the clustering twin of
    * the frozen-book IVF-PQ encode (s17): tomorrow's ingest batch lands
    * in today's cells with no retrain, no collect, one codegen
    * projection pass over the delta (works on a 1-row batch). Output
    * `[<idCol>, cell, d2]` with `d2` the exact integer squared distance
    * on the micro lattice — the same argmin/tie-break as training
    * assignment ([[assignTo]], one body), so predict over the training
    * set reproduces the final training assignment bit-for-bit
    * (spec-pinned).
    */
  def predictAssign(points: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]]): DataFrame =
    assignTo(quantize(points, idCol, vecCol), centroids)
      .withColumnRenamed("id", idCol)

  /** Per-cluster size + EXACT integer SSE (inertia) off an assignment
    * frame — the measurement behind the elbow/retrain decision, and the
    * clustering analogue of `ivfPqStaleness`: rising holdout inertia
    * under frozen centroids = the cells no longer fit the data. One
    * map-side-combining aggregate; the BIGINT sum runs as `try_sum`
    * with a loud overflow guard (d2 reaches ~2.6e14 at 64 dims — ~35k
    * points per cell of headroom per 2^63, plenty until it isn't).
    */
  def clusterInertia(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cell").cast(LongType).as("cell"))
      .agg(count(lit(1)).as("n_points"),
        try_sum(col("d2")).as("__ki_sse"))
      .select(col("cell"), col("n_points"),
        when(col("n_points") > 0 && col("__ki_sse").isNull,
          raise_error(lit("clusterInertia: BIGINT overflow in the SSE " +
            "sum — aggregate per sub-cell and re-fold")))
          .otherwise(col("__ki_sse")).as("sse"))

  /** Trained centroids as a DataFrame `[cell, centroid]` (micros rescaled
    * back to doubles) — pluggable into `Similarity.ivfCosineTopK(...,
    * centroidsDF = Some(...))`.
    */
  def centroidsDF(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (cv, cid) => (cid, cv.map(_ / 1e6).toSeq) }.toSeq
      .toDF("cell", "centroid")
  }
}
