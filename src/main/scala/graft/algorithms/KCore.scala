package graft.algorithms

import org.apache.spark.sql.functions._

import graft.functions.KCoreMerge.kcore_merge
import graft.graph.GraphFrame
import graft.pregel.{MessageDirection, Pregel, PregelResult}

/** Distributed k-core decomposition (coreness of every vertex) as a Pregel
  * client (`/root/reference/src/algorithm/centrality/k_core.rs:60-150`;
  * Mandal & Al Hasan 2017).
  *
  * The graph is first made simple + undirected (drop self-loops,
  * symmetrize, dedup), which makes SrcToDst-only messaging — and hence
  * `skipDestState` — sufficient. Cores are seeded with the undirected
  * degree and monotonically shrink under `kcore_merge`. Every vertex
  * broadcasts every iteration: the aggregate rebuilds each neighbour list
  * from scratch, so participation pruning would corrupt the lists; early
  * stopping relies on voting ("my core changed") alone.
  */
class KCore(graph: GraphFrame) {
  private var maxIter = 0 // 0 = run to convergence
  private var ckptInterval = 1

  def maxIterations(n: Int): this.type = { maxIter = n; this }
  def checkpointInterval(n: Int): this.type = { ckptInterval = n; this }

  def run(): PregelResult = {
    val ID = GraphFrame.ID
    val preparedEdges = GraphFrame.symmetrizeEdges(
      graph.edges.select(GraphFrame.SRC, GraphFrame.DST), doDistinct = true)

    val degrees = preparedEdges.groupBy(col(GraphFrame.SRC))
      .agg(count(col(GraphFrame.DST)).as("degree"))
    val preparedVertices = graph.vertices.select(col(ID))
      .join(degrees, col(ID) === col(GraphFrame.SRC), "left")
      .select(col(ID), coalesce(col("degree"), lit(0L)).as("degree"))

    val prepared = GraphFrame(preparedVertices, preparedEdges)

    val newCore = kcore_merge(Pregel.defaultMsg, col("kcore"))
    val builder = prepared.pregel
      .addVertexColumn("kcore", col("degree"), newCore)
      .addMessage(Pregel.src("kcore"), MessageDirection.SrcToDst)
      .addAggregateExpr(collect_list(Pregel.defaultMsg))
      .withVertexVoting("active", col("kcore") =!= newCore)
      .skipDestState()
      .checkpointInterval(ckptInterval)
    if (maxIter > 0) builder.maxIterations(maxIter)
    builder.run()
  }
}
