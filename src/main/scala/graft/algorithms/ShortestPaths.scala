package graft.algorithms

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.graph.GraphFrame
import graft.pregel.{MessageDirection, Pregel, PregelResult}

/** Multi-source BFS / shortest paths to a set of landmark vertices, as a
  * Pregel client (`/root/reference/src/algorithm/connectivity/shortest_paths.rs:90-190`):
  * one `dist_{lm}` IntegerType column, one named message, and one `min`
  * aggregate per landmark, all propagated in a single pass. `Int.MaxValue`
  * is the ∞ sentinel. `toLandmarks` physically reverses the edges so the
  * engine's `skipDestState` optimization stays valid.
  *
  * Subcritical graphs take a driver BFS (identical output: unweighted BFS
  * layers ARE the Pregel fixpoint, and the iteration cap maps to a depth
  * cap) — per-iteration distributed scheduling dwarfs the actual work below
  * ~1 M edges. `smallGraphThreshold(0)` forces the distributed path.
  */
class ShortestPaths(graph: GraphFrame) {
  private var landmarks: Seq[Long] = Seq.empty
  private var toLandmarksFlag = false
  private var maxIter = Int.MaxValue
  private var ckptInterval = 1
  private var smallThresholdOpt: Option[Long] = None
  // Builder setter wins; otherwise the session default (spark.graft.smallGraphThreshold).
  private def smallThreshold: Long = smallThresholdOpt.getOrElse(
    graft.GraftConf.smallGraphThreshold(graph.vertices.sparkSession))

  def setLandmarks(lms: Seq[Long]): this.type = { landmarks = lms; this }
  def toLandmarks(): this.type = { toLandmarksFlag = true; this }
  def maxIterations(n: Int): this.type = { maxIter = n; this }
  def checkpointInterval(n: Int): this.type = { ckptInterval = n; this }

  /** Edge-count threshold below which distances are computed on the driver
    * with a plain array-based BFS per landmark (exact — BFS depth == Pregel
    * iteration). 0 disables the hybrid path.
    */
  def smallGraphThreshold(n: Long): this.type = { smallThresholdOpt = Some(n); this }

  /** Depth-capped BFS from each landmark over a CSR adjacency; returns one
    * Int distance array per landmark, indexed like `vertexIds`. Edges with
    * an endpoint missing from `vertexIds` are skipped, matching the
    * distributed path's state⋈edges inner join.
    */
  private def bfsOnDriver(
      vertexIds: Array[Long], srcs: Array[Long], dsts: Array[Long]): Array[Array[Int]] = {
    val Inf = Int.MaxValue
    val n = vertexIds.length
    val idx = new scala.collection.mutable.LongMap[Int](n * 2)
    var i = 0
    while (i < n) { idx.update(vertexIds(i), i); i += 1 }
    val m = srcs.length
    val deg = new Array[Int](n)
    i = 0
    while (i < m) {
      val s = idx.getOrElse(srcs(i), -1)
      if (s >= 0 && idx.contains(dsts(i))) deg(s) += 1
      i += 1
    }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val nbr = new Array[Int](off(n))
    val fill = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < m) {
      val s = idx.getOrElse(srcs(i), -1)
      val t = if (s >= 0) idx.getOrElse(dsts(i), -1) else -1
      if (s >= 0 && t >= 0) { nbr(fill(s)) = t; fill(s) += 1 }
      i += 1
    }
    landmarks.toArray.map { lm =>
      val dist = Array.fill(n)(Inf)
      val root = idx.getOrElse(lm, -1)
      if (root >= 0) {
        // Array-backed queue; every vertex enters at most once.
        val queue = new Array[Int](n)
        var head = 0
        var tail = 0
        dist(root) = 0
        queue(tail) = root; tail += 1
        while (head < tail) {
          val v = queue(head); head += 1
          val dv = dist(v)
          if (dv < maxIter) { // depth cap == Pregel iteration cap
            var j = off(v)
            val end = off(v + 1)
            while (j < end) {
              val u = nbr(j)
              if (dist(u) == Inf) {
                dist(u) = dv + 1
                queue(tail) = u; tail += 1
              }
              j += 1
            }
          }
        }
      }
      dist
    }
  }

  def run(): PregelResult = {
    require(landmarks.nonEmpty, "shortest paths requires at least one landmark")
    val Inf = Int.MaxValue
    val ID = GraphFrame.ID

    val edges =
      if (toLandmarksFlag)
        graph.edges.select(
          col(GraphFrame.DST).as(GraphFrame.SRC),
          col(GraphFrame.SRC).as(GraphFrame.DST))
      else graph.edges.select(GraphFrame.SRC, GraphFrame.DST)

    if (smallThreshold > 0) {
      val e = edges.localCheckpoint(true)
      if (e.count() <= smallThreshold) {
        val vids = graph.vertices.select(col(ID)).collect().map(_.getLong(0))
        if (vids.length <= smallThreshold) {
          val rows = e.collect()
          val srcs = new Array[Long](rows.length)
          val dsts = new Array[Long](rows.length)
          var i = 0
          while (i < rows.length) {
            srcs(i) = rows(i).getLong(0); dsts(i) = rows(i).getLong(1); i += 1
          }
          val dists = bfsOnDriver(vids, srcs, dsts)
          val spark = graph.vertices.sparkSession
          e.unpersist()
          // Same column ORDER as the Pregel path (dist columns, then id).
          val schema = StructType(
            landmarks.map(lm => StructField(s"dist_$lm", IntegerType, nullable = false))
              :+ StructField(ID, LongType, nullable = false))
          val out = vids.indices.map(i =>
            Row.fromSeq(landmarks.indices.map(j => dists(j)(i)) :+ vids(i)))
          return PregelResult(
            spark.createDataFrame(
              spark.sparkContext.parallelize(
                out, math.max(1, spark.sparkContext.defaultParallelism)),
              schema),
            iterations = 0)
        }
      }
      e.unpersist()
    }

    // A vertex participates while ANY of its distances could still improve.
    val updateParticipating = landmarks.foldLeft(lit(false)) { (acc, lm) =>
      acc || (col(s"dist_$lm") > Pregel.msg(lm.toString))
    }
    val initParticipating = landmarks.foldLeft(lit(false)) { (acc, lm) =>
      acc || (col(GraphFrame.ID) === lit(lm))
    }

    val prepared = GraphFrame(graph.vertices.select(GraphFrame.ID), edges)

    val builder = prepared.pregel
      .withParticipationColumn("participating", initParticipating, updateParticipating)
      .withVertexVoting("active", updateParticipating)
      .maxIterations(maxIter)
      .checkpointInterval(ckptInterval)
      .skipDestState()

    landmarks.foreach { lm =>
      val distCol = s"dist_$lm"
      val m = Pregel.msg(lm.toString)
      builder
        .addVertexColumn(distCol,
          when(col(GraphFrame.ID) === lit(lm), lit(0)).otherwise(lit(Inf)),
          when(m.isNull, col(distCol))
            .otherwise(when(col(distCol) <= m, col(distCol)).otherwise(m)))
        .addNamedMessage(lm.toString,
          when(Pregel.src(distCol) < lit(Inf), Pregel.src(distCol) + lit(1))
            .otherwise(lit(Inf)),
          MessageDirection.SrcToDst)
        .addNamedAggregateExpr(lm.toString, min(m))
    }

    builder.run()
  }
}
