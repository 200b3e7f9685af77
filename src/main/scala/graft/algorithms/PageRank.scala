package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphFrame
import graft.pregel.{MessageDirection, Pregel}

case class PageRankResult(ranks: DataFrame, iterations: Int)

/** Delta-incremental (GraphX-style) PageRank as a Pregel client
  * (`/root/reference/src/algorithm/centrality/pagerank.rs:80-210`).
  *
  * Each vertex carries `pagerank` (accumulated, updated PR += α·msgSum) and
  * `pagerank_delta` (per-iteration change). A source sends `delta/out_degree`
  * over its out-edges, and only sources with `delta > tol` keep emitting —
  * converged vertices stop generating messages while voting (convergence
  * mode) decides termination. The result is normalized to sum to 1.
  *
  * Deviation from the reference: sink vertices (no out-edges) stay in the
  * state with `out_degree = 0` instead of being dropped with the
  * `out_degrees()` inner frame — they have no out-triplets, so they never
  * emit, but they do accumulate and appear in the result.
  */
class PageRank(graph: GraphFrame) {
  private var resetProb = 0.15
  private var tol = 0.01
  private var maxIter = 0 // 0 = run to convergence
  private var ckptInterval = 1
  private var pprSource: Option[Long] = None

  def resetProbability(p: Double): this.type = { resetProb = p; this }
  def tolerance(t: Double): this.type = { tol = t; this }
  def maxIterations(n: Int): this.type = { maxIter = n; this }
  def checkpointInterval(n: Int): this.type = { ckptInterval = n; this }

  /** Personalized PageRank (beyond the reference): the teleport mass lands
    * only on `sourceId`, so ranks measure proximity to the source. Same
    * delta-incremental loop — only the init mass changes.
    */
  def personalized(sourceId: Long): this.type = { pprSource = Some(sourceId); this }

  /** Weighted PageRank (beyond the reference — its bench surface gestures
    * at weighted graphs, `run_benchmarks.py:204-208`, but the library
    * ignores the flag): a source's delta distributes proportional to edge
    * weight, `msg = delta * w / W(src)` with `W(src)` the source's total
    * outgoing weight. The weight column must be integral (cents/micros
    * discipline, as [[WeightedShortestPaths]]): per-source totals then sum
    * EXACTLY in 64-bit integers in any engine, so the only float ops are
    * the per-edge fraction and the message sum — the same IEEE discipline
    * the unweighted oracle gates already hold. Non-negative weights
    * assumed; a source whose total weight is 0 sends nothing.
    */
  def weighted(weightCol: String): this.type = { weightColOpt = Some(weightCol); this }
  private var weightColOpt: Option[String] = None

  def run(): PageRankResult = {
    val alpha = 1.0 - resetProb
    val ID = GraphFrame.ID

    // Unweighted: out_degree count. Weighted: exact integer sum of
    // outgoing weights (both are the message denominator).
    // NULL weights raise (shared guard: out_total aggregation AND the edge
    // projection below) — silently a NULL would drop out of the total but
    // also zero the message, i.e. divergent semantics nobody chose.
    def guardedWeight(w: String): org.apache.spark.sql.Column =
      when(col(w).isNull,
        raise_error(lit(s"weighted pagerank: NULL in weight column '$w'")))
        .otherwise(col(w).cast("long"))
    val outTotals = weightColOpt match {
      case None => graph.outDegrees.withColumnRenamed("out_degree", "__ot")
      case Some(w) =>
        val wType = graph.edges.schema.apply(w).dataType
        require(wType == org.apache.spark.sql.types.LongType ||
          wType == org.apache.spark.sql.types.IntegerType,
          s"weight column '$w' must be integral (INT or BIGINT) so per-source " +
            s"totals are exact, got $wType — quantize floats (cents/micros) first")
        graph.edges.groupBy(col(GraphFrame.SRC).as(ID))
          .agg(sum(guardedWeight(w)).as("__ot"))
    }
    val verticesWithDegrees = graph.vertices.select(col(ID))
      .join(outTotals.withColumnRenamed(ID, "__od_id"),
        col(ID) === col("__od_id"), "left")
      .select(col(ID), coalesce(col("__ot"), lit(0L)).as("out_total"))

    val baseEdgeCols = Seq(col(GraphFrame.SRC), col(GraphFrame.DST))
    val preparedEdges = weightColOpt match {
      case None    => graph.edges.select(baseEdgeCols: _*)
      case Some(w) => graph.edges.select(baseEdgeCols :+ guardedWeight(w).as(w): _*)
    }
    val prepared = GraphFrame(verticesWithDegrees, preparedEdges)

    val newDelta = lit(alpha) * coalesce(Pregel.defaultMsg, lit(0.0))
    val initMass = pprSource
      .map(s => when(col(ID) === lit(s), lit(resetProb)).otherwise(lit(0.0)))
      .getOrElse(lit(resetProb))

    val msgExpr = weightColOpt match {
      case None => Pregel.src("pagerank_delta") / Pregel.src("out_total")
      case Some(w) =>
        // (delta * w) / W — left-to-right, mirrored exactly by the oracle;
        // W = 0 (all-zero weights) would be 0/0, so those sources emit 0.
        when(Pregel.src("out_total") > 0L,
          Pregel.src("pagerank_delta") * Pregel.edge(w).cast("double")
            / Pregel.src("out_total").cast("double"))
          .otherwise(lit(0.0))
    }

    var builder = prepared.pregel
      .addVertexColumn("pagerank", initMass, col("pagerank") + newDelta)
      .addVertexColumn("pagerank_delta", initMass, newDelta)
      .addVertexColumn("out_total", col("out_total"), col("out_total"))
      .addMessage(msgExpr, MessageDirection.SrcToDst)
      .addAggregateExpr(sum(Pregel.defaultMsg))
      .withParticipationColumn("participates", lit(true), newDelta > lit(tol))
      .skipDestState()
      .checkpointInterval(ckptInterval)
    weightColOpt.foreach(w => builder = builder.addEdgeColumn(w))

    val result =
      if (maxIter > 0) builder.maxIterations(maxIter).run()
      else builder.withVertexVoting("active", newDelta > lit(tol)).run()

    // Normalize to sum 1. The 1-row aggregate is broadcast by the planner.
    val total = result.vertices.agg(sum(col("pagerank")).as("pagerank_sum"))
    val ranks = result.vertices.crossJoin(total)
      .select(col(ID), (col("pagerank") / col("pagerank_sum")).as("pagerank"))
    PageRankResult(ranks, result.iterations)
  }
}
