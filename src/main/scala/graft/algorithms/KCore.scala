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
  private var smallThreshold = 1000000L

  def maxIterations(n: Int): this.type = { maxIter = n; this }
  def checkpointInterval(n: Int): this.type = { ckptInterval = n; this }

  /** Edge-count threshold below which coreness is computed on the driver
    * with Matula–Beck peeling (exact coreness — identical to the converged
    * distributed fixpoint). 0 disables the hybrid path. Only taken in
    * run-to-convergence mode: a capped `maxIterations` asks for the
    * intermediate estimate, which is defined by the distributed rounds.
    */
  def smallGraphThreshold(n: Long): this.type = { smallThreshold = n; this }

  /** Exact coreness by peeling in increasing-degree order (Matula–Beck):
    * when a vertex is removed, its coreness is its remaining degree (or the
    * max seen so far), and its neighbours' degrees drop.
    */
  private def peelOnDriver(vertexIds: Array[Long], symEdges: Array[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.LongMap.empty[scala.collection.mutable.ArrayBuffer[Long]]
    symEdges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer.empty) += v
    }
    val deg = scala.collection.mutable.LongMap.empty[Long]
    vertexIds.foreach(v => deg.update(v, adj.get(v).map(_.size.toLong).getOrElse(0L)))
    // Min-heap with lazy deletion: stale (degree, vertex) entries are
    // skipped when popped (degree no longer current).
    val removed = scala.collection.mutable.Set.empty[Long]
    val core = scala.collection.mutable.LongMap.empty[Long]
    var k = 0L
    val queue = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by[(Long, Long), (Long, Long)](t => (-t._1, -t._2)))
    vertexIds.foreach(v => queue.enqueue((deg(v), v)))
    while (queue.nonEmpty) {
      val (d, v) = queue.dequeue()
      if (!removed.contains(v) && d == deg(v)) { // skip stale entries
        removed += v
        k = math.max(k, d)
        core.update(v, k)
        adj.get(v).foreach(_.foreach { u =>
          if (!removed.contains(u)) {
            deg.update(u, deg(u) - 1)
            queue.enqueue((deg(u), u))
          }
        })
      }
    }
    core.toMap
  }

  def run(): PregelResult = {
    val ID = GraphFrame.ID
    val preparedEdges = GraphFrame.symmetrizeEdges(
      graph.edges.select(GraphFrame.SRC, GraphFrame.DST), doDistinct = true)

    if (maxIter == 0 && smallThreshold > 0) {
      val sym = preparedEdges.localCheckpoint(true)
      val eCnt = sym.count()
      if (eCnt <= 2 * smallThreshold) {
        val vids = graph.vertices.select(col(ID)).collect().map(_.getLong(0))
        if (vids.length <= smallThreshold) {
          val pairs = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
          val core = peelOnDriver(vids, pairs)
          val spark = graph.vertices.sparkSession
          import spark.implicits._
          sym.unpersist()
          return PregelResult(
            vids.toIndexedSeq.map(v => (core.getOrElse(v, 0L), v)).toDF("kcore", ID),
            iterations = 0)
        }
      }
      sym.unpersist()
    }

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
