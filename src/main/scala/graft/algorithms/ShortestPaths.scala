package graft.algorithms

import org.apache.spark.sql.functions._

import graft.graph.GraphFrame
import graft.pregel.{MessageDirection, Pregel, PregelResult}

/** Multi-source BFS / shortest paths to a set of landmark vertices, as a
  * Pregel client (`/root/reference/src/algorithm/connectivity/shortest_paths.rs:90-190`):
  * one `dist_{lm}` IntegerType column, one named message, and one `min`
  * aggregate per landmark, all propagated in a single pass. `Int.MaxValue`
  * is the ∞ sentinel. `toLandmarks` physically reverses the edges so the
  * engine's `skipDestState` optimization stays valid.
  */
class ShortestPaths(graph: GraphFrame) {
  private var landmarks: Seq[Long] = Seq.empty
  private var toLandmarksFlag = false
  private var maxIter = Int.MaxValue
  private var ckptInterval = 1

  def setLandmarks(lms: Seq[Long]): this.type = { landmarks = lms; this }
  def toLandmarks(): this.type = { toLandmarksFlag = true; this }
  def maxIterations(n: Int): this.type = { maxIter = n; this }
  def checkpointInterval(n: Int): this.type = { ckptInterval = n; this }

  def run(): PregelResult = {
    require(landmarks.nonEmpty, "shortest paths requires at least one landmark")
    val Inf = Int.MaxValue

    // A vertex participates while ANY of its distances could still improve.
    val updateParticipating = landmarks.foldLeft(lit(false)) { (acc, lm) =>
      acc || (col(s"dist_$lm") > Pregel.msg(lm.toString))
    }
    val initParticipating = landmarks.foldLeft(lit(false)) { (acc, lm) =>
      acc || (col(GraphFrame.ID) === lit(lm))
    }

    val edges =
      if (toLandmarksFlag)
        graph.edges.select(
          col(GraphFrame.DST).as(GraphFrame.SRC),
          col(GraphFrame.SRC).as(GraphFrame.DST))
      else graph.edges.select(GraphFrame.SRC, GraphFrame.DST)
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
