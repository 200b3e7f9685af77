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
  * Two peeling strategies, identical results:
  *
  *   - [[KTruss.run]] (default, INCREMENTAL): one full degree-oriented
  *     Schank-Wagner triangle enumeration seeds per-edge supports, then
  *     each round only enumerates the triangles INCIDENT TO THE REMOVED
  *     EDGES (expanding from each removed edge's lower-degree endpoint)
  *     and decrements the surviving edges they touched. Per-round cost is
  *     proportional to the removal frontier's wedge volume, not the whole
  *     graph's O(m^1.5) — the difference between a shallow cap and a deep
  *     fixpoint peel being affordable at scale.
  *   - [[KTruss.runReenumerate]]: re-enumerates all triangles on the
  *     survivors every round (the round-9 formulation, kept as the
  *     reference implementation and ScaleBench comparison arm).
  *
  * A triangle with two or three removed edges is enumerated once per
  * removed edge it contains, so the lost-triangle set is DEDUPLICATED on
  * the canonical vertex triple before decrementing — each surviving edge
  * loses exactly one support per distinct dead triangle, which keeps the
  * decremented counts equal to a from-scratch recount (the Round10 spec
  * pins the two strategies equal to fixpoint).
  *
  * Removal cascades — dropping an edge can starve a neighbor edge's last
  * triangle — so the loop runs to fixpoint or `maxRounds`, whichever
  * first; a capped run is DETERMINISTIC (early stop only fires when a
  * round removes nothing, in which case further rounds are identity).
  *
  * Returns the canonical surviving edges `[src, dst, support]` (src < dst;
  * support measured in the final round's input graph). State is the edge
  * support table itself — checkpointed per round and released, the Pregel
  * discipline.
  */
class KTruss(graph: GraphFrame) {
  private var k = 4
  private var maxRoundsV = 10

  def k(value: Int): KTruss = { k = value; this }
  def maxRounds(value: Int): KTruss = { maxRoundsV = value; this }

  def run(): DataFrame = KTruss.run(graph.edges, k, maxRoundsV)
}

object KTruss {
  private val checkpointing = org.apache.spark.sql.graft.checkpointing

  /** Per-round lineage truncation. NoStats is load-bearing: a plain
    * `localCheckpoint` inherits the optimizer's estimated sizeInBytes,
    * whose bit-length compounds geometrically across peel rounds until
    * stats estimation (BigInteger products) dwarfs the actual work — a
    * deep fixpoint peel then hangs in PLANNING, not execution (see
    * checkpointing.localCheckpointNoStats).
    */
  private def ckpt(df: DataFrame): DataFrame =
    checkpointing.localCheckpointNoStats(df)

  /** Canonical undirected simple edges `[a, b]`, a < b. */
  private def canonical(edges: DataFrame): DataFrame =
    edges
      .select(least(col(GraphFrame.SRC), col(GraphFrame.DST)).as("a"),
        greatest(col(GraphFrame.SRC), col(GraphFrame.DST)).as("b"))
      .filter(col("a") =!= col("b")).distinct()

  /** Per-edge triangle support of the canonical graph `cur` — one full
    * degree-oriented Schank-Wagner enumeration (wedges expand only from
    * the (degree, id)-smaller endpoint, so wedge volume is O(m^1.5)
    * regardless of skew). Returns `[a, b, support]` covering EVERY edge of
    * `cur` (zero-support edges included).
    */
  private def triangleSupport(cur: DataFrame): DataFrame = {
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
      .transform(ckpt)
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
    val out = cur.join(credits, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))
      .transform(ckpt)
    checkpointing.release(oriented)
    out
  }

  /** Incremental-support peel (default). */
  def run(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val cur0 = canonical(edges).transform(ckpt)
    // Loop invariant: `sup` holds the support of every edge of the current
    // graph, measured IN the current graph.
    var sup = triangleSupport(cur0)
    checkpointing.release(cur0)
    var round = 1
    var out: DataFrame = null
    while (out == null) {
      val removed = sup.filter(col("support") < k - 2)
        .select("a", "b").transform(ckpt)
      val survivors = sup.filter(col("support") >= k - 2).transform(ckpt)
      val removedCount = removed.count()
      if (removedCount == 0 || round == maxRounds) {
        out = survivors
          .select(col("a").as(GraphFrame.SRC), col("b").as(GraphFrame.DST),
            col("support"))
          .transform(ckpt)
        checkpointing.release(survivors)
        checkpointing.release(removed)
      } else if (removedCount > survivors.count()) {
        // MASS peel (most of the graph died this round — e.g. a sparse
        // graph's first round): the removal frontier's wedge volume
        // exceeds a fresh enumeration on the (smaller) survivor set, so
        // incremental decrementing LOSES here — ScaleBench
        // ktruss-inc-deep-skew measured 104 s frontier vs 44 s recount
        // at 8.4 M edges peeling to 1512. Recount from scratch and let
        // later (gradual) rounds take the incremental path.
        val surEdges = survivors.select("a", "b").transform(ckpt)
        val next = triangleSupport(surEdges)
        checkpointing.release(surEdges)
        checkpointing.release(survivors)
        checkpointing.release(sup)
        checkpointing.release(removed)
        sup = next
        round += 1
      } else {
        // Triangles of the PRE-removal graph touching >= 1 removed edge:
        // expand each removed edge from its (degree, id)-smaller endpoint
        // over the pre-removal adjacency, close against the pre-removal
        // edge set, then dedupe on the canonical vertex triple.
        val curEdges = sup.select("a", "b")
        val sym = curEdges.select(col("a").as("u"), col("b").as("v"))
          .unionAll(curEdges.select(col("b").as("u"), col("a").as("v")))
        val deg = sym.groupBy(col("u").as("__kt_v"))
          .agg(count(lit(1)).as("__kt_d"))
        val flip = removed
          .join(deg, col("a") === col("__kt_v"))
          .select(col("a"), col("b"), struct(col("__kt_d"), col("a")).as("ra"))
          .join(deg, col("b") === col("__kt_v"))
          .select(col("a"), col("b"), col("ra"),
            struct(col("__kt_d"), col("b")).as("rb"))
          .select(when(col("ra") <= col("rb"), col("a")).otherwise(col("b")).as("p"),
            when(col("ra") <= col("rb"), col("b")).otherwise(col("a")).as("q"))
        val cands = flip.join(sym, col("p") === col("u"))
          .select(col("p"), col("q"), col("v").as("c"))
          .filter(col("c") =!= col("q"))
        val closed = cands.join(
          curEdges.select(col("a").as("ca"), col("b").as("cb")),
          least(col("q"), col("c")) === col("ca") &&
            greatest(col("q"), col("c")) === col("cb"))
          .select(col("p"), col("q"), col("c"))
        val tri = closed.select(
          least(col("p"), col("q"), col("c")).as("x"),
          (col("p") + col("q") + col("c")
            - least(col("p"), col("q"), col("c"))
            - greatest(col("p"), col("q"), col("c"))).as("y"),
          greatest(col("p"), col("q"), col("c")).as("z"))
          .distinct()
        val losses = tri.select(col("x").as("a"), col("y").as("b"))
          .unionAll(tri.select(col("x").as("a"), col("z").as("b")))
          .unionAll(tri.select(col("y").as("a"), col("z").as("b")))
          .groupBy("a", "b").agg(count(lit(1)).as("loss"))
        val next = survivors.join(losses, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("support") - coalesce(col("loss"), lit(0L))).as("support"))
          .transform(ckpt)
        checkpointing.release(survivors)
        checkpointing.release(sup)
        checkpointing.release(removed)
        sup = next
        round += 1
      }
    }
    checkpointing.release(sup)
    out
  }

  /** Full re-enumeration peel: recomputes every edge's support from
    * scratch each round. Same results as [[run]]; per-round cost is the
    * whole graph's triangle enumeration — the comparison arm for the
    * ScaleBench deep-fixpoint row.
    */
  def runReenumerate(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var cur = canonical(edges).transform(ckpt)
    var supported: DataFrame = null
    var round = 0
    var stable = false
    var curCount = cur.count()
    while (round < maxRounds && !stable) {
      if (supported != null) checkpointing.release(supported)
      supported = triangleSupport(cur)
      val nxt = supported.filter(col("support") >= k - 2)
        .select("a", "b").transform(ckpt)
      val nxtCount = nxt.count()
      stable = nxtCount == curCount
      checkpointing.release(cur)
      cur = nxt
      curCount = nxtCount
      round += 1
    }
    val out = supported.filter(col("support") >= k - 2)
      .select(col("a").as(GraphFrame.SRC), col("b").as(GraphFrame.DST), col("support"))
      .transform(ckpt)
    checkpointing.release(cur)
    checkpointing.release(supported)
    out
  }
}
