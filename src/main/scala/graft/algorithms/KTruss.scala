package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphFrame

/** k-truss: the maximal subgraph in which every edge closes at least k-2
  * triangles — the EDGE-centric cohesion ladder next to k-core's
  * vertex-centric one (beyond the reference's algorithm set; standard for
  * mining tightly-knit communities out of noisy corpus graphs, where
  * k-core is fooled by hub-and-spoke noise but a truss demands actual
  * triangle density).
  *
  * Peeling loop: each round (1) re-enumerates triangles on the SURVIVING
  * graph with the same degree-oriented Schank-Wagner wedge join as
  * [[TriangleCount]] (wedge volume O(m^1.5) regardless of skew), (2)
  * credits each triangle to its three canonical edges with a
  * map-side-combinable count, (3) drops edges whose support is below k-2.
  * Removal cascades — dropping an edge can starve a neighbor edge's last
  * triangle — so the loop runs to fixpoint or `maxRounds`, whichever
  * first; a capped run is DETERMINISTIC (early stop only fires when a
  * round changes nothing, in which case further rounds are identity).
  *
  * Returns the canonical surviving edges `[src, dst, support]` (src < dst;
  * support measured in the final round's input graph). Per-round cost is
  * the triangle enumeration; state is the edge list itself — checkpointed
  * per round and released, the Pregel discipline.
  */
class KTruss(graph: GraphFrame) {
  private var k = 4
  private var maxRoundsV = 10

  def k(value: Int): KTruss = { k = value; this }
  def maxRounds(value: Int): KTruss = { maxRoundsV = value; this }

  def run(): DataFrame = KTruss.run(graph.edges, k, maxRoundsV)
}

object KTruss {
  def run(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val checkpointing = org.apache.spark.sql.graft.checkpointing
    var cur = edges
      .select(least(col(GraphFrame.SRC), col(GraphFrame.DST)).as("a"),
        greatest(col(GraphFrame.SRC), col(GraphFrame.DST)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var supported: DataFrame = null
    var round = 0
    var stable = false
    var curCount = cur.count()
    while (round < maxRounds && !stable) {
      val sym = cur.select(col("a").as("u"), col("b").as("v"))
        .unionAll(cur.select(col("b").as("u"), col("a").as("v")))
      val deg = sym.groupBy(col("u").as("__kt_v")).agg(count(lit(1)).as("__kt_d"))
      val oriented = sym
        .join(deg, col("u") === col("__kt_v"))
        .select(col("u"), col("v"), struct(col("__kt_d"), col("u")).as("ru"))
        .join(deg, col("v") === col("__kt_v"))
        .select(col("u"), col("v"), col("ru"), struct(col("__kt_d"), col("v")).as("rv"))
        .filter(col("ru") < col("rv"))
        .select(col("u"), col("v"), col("rv"))
        .localCheckpoint(true)
      val tris = oriented.as("e1")
        .join(oriented.as("e2"),
          col("e1.u") === col("e2.u") && col("e1.rv") < col("e2.rv"))
        .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
        .join(oriented.as("e3"), col("y") === col("e3.u") && col("z") === col("e3.v"))
        .select("x", "y", "z")
      // Credit each triangle to its three CANONICAL edges.
      val credits = tris.select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .unionAll(tris.select(least(col("x"), col("z")).as("a"), greatest(col("x"), col("z")).as("b")))
        .unionAll(tris.select(least(col("y"), col("z")).as("a"), greatest(col("y"), col("z")).as("b")))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
      supported = cur.join(credits, Seq("a", "b"), "left")
        .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))
        .localCheckpoint(true)
      val nxt = supported.filter(col("support") >= k - 2)
        .select("a", "b").localCheckpoint(true)
      val nxtCount = nxt.count()
      stable = nxtCount == curCount
      checkpointing.release(oriented)
      checkpointing.release(cur)
      cur = nxt
      curCount = nxtCount
      round += 1
    }
    val out = supported.filter(col("support") >= k - 2)
      .select(col("a").as(GraphFrame.SRC), col("b").as(GraphFrame.DST), col("support"))
      .localCheckpoint(true)
    checkpointing.release(cur)
    checkpointing.release(supported)
    out
  }
}
