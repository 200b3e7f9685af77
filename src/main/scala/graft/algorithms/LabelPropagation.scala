package graft.algorithms

import org.apache.spark.sql.functions._

import graft.graph.GraphFrame
import graft.pregel.{MessageDirection, Pregel, PregelResult}

/** Synchronous label propagation for community detection (beyond the
  * reference's algorithm set; SURVEY §7.5 names it as the Pregel engine's
  * natural clustering extension).
  *
  * Every vertex starts labeled with its own id and adopts the most frequent
  * label among its neighbours each superstep (ties -> smallest label, which
  * also makes the synchronous update deterministic). Runs on the
  * symmetrized graph for a fixed number of iterations — synchronous LPA on
  * bipartite-ish structures can oscillate, so a cap, not convergence
  * voting, is the standard termination (same choice as Spark GraphFrames).
  *
  * The per-vertex mode is computed with pure Column ops (no UDF): collect
  * neighbour labels, sort, and fold once tracking (current run, best run).
  */
class LabelPropagation(graph: GraphFrame) {
  private var maxIter = 5
  private var ckptInterval = 1

  def maxIterations(n: Int): this.type = { require(n >= 1); maxIter = n; this }
  def checkpointInterval(n: Int): this.type = { ckptInterval = n; this }

  def run(): PregelResult = {
    val ID = GraphFrame.ID
    val sym = GraphFrame.symmetrizeEdges(
      graph.edges.select(GraphFrame.SRC, GraphFrame.DST), doDistinct = true)
    val prepared = GraphFrame(graph.vertices.select(col(ID)), sym)

    // Mode of the collected neighbour labels: sort ascending, then a single
    // pass tracking (current run, best run) — smallest label wins ties
    // because the list is sorted and strict '>' is required to replace.
    val labels = array_sort(Pregel.defaultMsg)
    val best = aggregate(
      labels,
      struct(lit(0L).as("best"), lit(0L).as("bestCnt"), lit(0L).as("cur"), lit(0L).as("curCnt")),
      (acc, x) => {
        val curCnt = when(x === acc.getField("cur"), acc.getField("curCnt") + 1L).otherwise(1L)
        val isBetter = curCnt > acc.getField("bestCnt")
        struct(
          when(isBetter, x).otherwise(acc.getField("best")).as("best"),
          when(isBetter, curCnt).otherwise(acc.getField("bestCnt")).as("bestCnt"),
          x.as("cur"),
          curCnt.as("curCnt"))
      },
      acc => acc.getField("best"))

    prepared.pregel
      .addVertexColumn("label", col(ID),
        when(Pregel.defaultMsg.isNull, col("label")).otherwise(best))
      .addMessage(Pregel.src("label"), MessageDirection.SrcToDst)
      .addAggregateExpr(collect_list(Pregel.defaultMsg))
      .maxIterations(maxIter)
      .checkpointInterval(ckptInterval)
      .skipDestState()
      .run()
  }
}
