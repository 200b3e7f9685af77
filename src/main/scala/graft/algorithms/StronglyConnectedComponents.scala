package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.graft.checkpointing

/** Distributed strongly connected components — the Orzan/FW-BW COLORING
  * scheme, the standard data-parallel SCC (Tarjan's stack is inherently
  * sequential):
  *
  * repeat on the unassigned subgraph:
  *   1. FORWARD: propagate `color = max reachable-ancestor id` along edge
  *      direction to a fixpoint (monotone max — converges in DAG-depth
  *      rounds, each one src-keyed join + map-side max like a Pregel
  *      superstep).
  *   2. BACKWARD: from each color ROOT (vertex whose color is its own id),
  *      walk REVERSE edges restricted to the root's color class, to a
  *      fixpoint. The root's color class ∩ backward-reachable set is
  *      EXACTLY the root's SCC (classic FW-BW invariant: same color ⇒
  *      forward-reachable from the root).
  *   3. Assign those vertices their root as `scc_id`, peel them (and
  *      their edges) off, recolor the rest next round.
  *
  * Every round peels at least every root's SCC, so the outer loop
  * terminates; color classes split the remaining graph so later rounds
  * shrink fast (O(log) expected rounds on random structure). All loop
  * frames cut lineage with stats-free local checkpoints; both inner
  * fixpoints are count-guarded with a loud cap — a truncated propagation
  * would silently merge SCCs, so running past the cap throws instead.
  *
  * Output: `[id, scc_id]` with `scc_id = max vertex id of the SCC` (the
  * root's id — a canonical, engine-replayable representative).
  */
object StronglyConnectedComponents {

  /** Hybrid entry point, matching every other iterative algorithm here:
    * at or below `smallGraphThreshold` edges the graph is collected and
    * decomposed with an ITERATIVE driver Tarjan (exact, one pass, no
    * per-round scheduling latency — the FW-BW loop's many small jobs cost
    * ~40x more than the work below ~10^5 edges); above it, the
    * distributed FW-BW peel. Identical results by construction
    * (equivalence spec on random digraphs); same canonical
    * `scc_id = max member`.
    */
  def run(edges: DataFrame, maxFixpointIter: Int = 200,
      smallGraphThreshold: Long = 100000L): DataFrame = {
    val e0 = edges.select(col("src").cast(LongType), col("dst").cast(LongType))
      .filter(col("src") =!= col("dst")).distinct()
    if (e0.count() <= smallGraphThreshold) runOnDriver(e0)
    else runDistributed(e0, maxFixpointIter)
  }

  /** Iterative (explicit-stack) Tarjan on collected edges. */
  private def runOnDriver(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    val edgeArr = e0.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edgeArr.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val verts = (edgeArr.map(_._1) ++ edgeArr.map(_._2)).distinct
    val index = scala.collection.mutable.HashMap.empty[Long, Int]
    val low = scala.collection.mutable.HashMap.empty[Long, Int]
    val onStack = scala.collection.mutable.HashSet.empty[Long]
    val stack = scala.collection.mutable.ArrayDeque.empty[Long]
    val sccOf = scala.collection.mutable.HashMap.empty[Long, Long]
    var counter = 0
    for (root <- verts if !index.contains(root)) {
      // frames: (vertex, iterator over its out-neighbours)
      val work = scala.collection.mutable.ArrayDeque(
        (root, adj.getOrElse(root, Array.empty[Long]).iterator))
      index(root) = counter; low(root) = counter; counter += 1
      stack.prepend(root); onStack += root
      while (work.nonEmpty) {
        val (v, it) = work.head
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack.prepend(w); onStack += w
            work.prepend((w, adj.getOrElse(w, Array.empty[Long]).iterator))
          } else if (onStack(w)) {
            low(v) = math.min(low(v), index(w))
          }
        } else {
          work.removeHead()
          work.headOption.foreach { case (p, _) =>
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val members = scala.collection.mutable.Buffer.empty[Long]
            var done = false
            while (!done) {
              val w = stack.removeHead(); onStack -= w
              members += w
              done = w == v
            }
            val rep = members.max
            members.foreach(m => sccOf(m) = rep)
          }
        }
      }
    }
    import spark.implicits._
    sccOf.toSeq.toDF("id", "scc_id")
  }

  /** Expects edges ALREADY canonicalized (cast, self-loop-free,
    * distinct) — [[run]] does that once; re-deduping here would pay a
    * second full-graph shuffle per invocation.
    */
  private[algorithms] def runDistributed(e0: DataFrame,
      maxFixpointIter: Int = 200): DataFrame = {
    val spark = e0.sparkSession
    // All loop checkpoints are LAZY: every one is materialized by the
    // count that follows it (loop guards / changed-counts), so eager
    // checkpoints only added one extra scheduled job per frame per
    // round (r19 optimization round).
    var remEdges = checkpointing.localCheckpointNoStats(e0, eager = false)
    // Endpoints derive from the CHECKPOINTED edges with one generate —
    // the union form re-ran e0's (arbitrarily expensive) lineage once
    // per endpoint side.
    var remaining = checkpointing.localCheckpointNoStats(
      remEdges.select(explode(array(col("src"), col("dst"))).as("id"))
        .distinct(), eager = false)
    var assigned: DataFrame = null

    var guard = 0
    while (remaining.count() > 0) {
      guard += 1
      require(guard <= 10000, "scc: outer peel failed to converge")

      // 1. Forward max-color fixpoint.
      var colors = checkpointing.localCheckpointNoStats(
        remaining.select(col("id"), col("id").as("color")), eager = false)
      var changed = 1L
      var it = 0
      while (changed > 0) {
        it += 1
        require(it <= maxFixpointIter,
          s"scc: forward fixpoint exceeded $maxFixpointIter rounds")
        val pushed = remEdges.join(colors, remEdges("src") === colors("id"))
          .groupBy(col("dst").as("id")).agg(max("color").as("in_color"))
        // The changed flag is computed IN the round's projection and read
        // back off the checkpoint: the old shape re-joined next against
        // colors to diff them — a full vertex-set join per round that the
        // one-column flag replaces with a count over already-materialized
        // rows (colors only ever grow, so "changed" = in_color won).
        // LAZY: the changed-count below materializes the checkpoint in
        // the SAME job — an eager checkpoint scheduled a separate job
        // per round first (2 jobs/round -> 1, r19 optimization round).
        val next = checkpointing.localCheckpointNoStats(
          colors.join(pushed, Seq("id"), "left")
            .select(col("id"),
              greatest(col("color"), coalesce(col("in_color"), lit(Long.MinValue)))
                .as("color"),
              (coalesce(col("in_color"), lit(Long.MinValue)) > col("color"))
                .as("chg")),
          eager = false)
        changed = next.filter(col("chg")).count()
        colors = next.select("id", "color")
      }

      // 2. Backward walk from roots inside each color class.
      var reached = checkpointing.localCheckpointNoStats(
        colors.filter(col("id") === col("color")).select("id", "color"),
        eager = false)
      // Reverse edges restricted to same-color endpoints — CHECKPOINTED
      // once per outer round: the backward fixpoint scans it every
      // iteration, and re-deriving the double color join per step would
      // multiply the round's most expensive plan by the walk depth.
      val sameColor = checkpointing.localCheckpointNoStats(remEdges
        .join(colors.withColumnRenamed("id", "src"), Seq("src"))
        .withColumnRenamed("color", "src_color")
        .join(colors.withColumnRenamed("id", "dst")
          .withColumnRenamed("color", "dst_color"), Seq("dst"))
        .filter(col("src_color") === col("dst_color"))
        .select(col("src"), col("dst"), col("src_color").as("ecolor")),
        eager = false)
      changed = 1L
      it = 0
      while (changed > 0) {
        it += 1
        require(it <= maxFixpointIter,
          s"scc: backward fixpoint exceeded $maxFixpointIter rounds")
        val step = sameColor
          .join(reached, sameColor("dst") === reached("id")
            && sameColor("ecolor") === reached("color"))
          .select(col("src").as("id"), col("ecolor").as("color")).distinct()
        val next = checkpointing.localCheckpointNoStats(
          reached.unionAll(step).distinct(), eager = false)
        changed = next.count() - reached.count()
        reached = next
      }

      // 3. Peel: reached(id, color) is the union of the roots' SCCs.
      val sccs = reached.select(col("id"), col("color").as("scc_id"))
      assigned = if (assigned == null) sccs
        else checkpointing.localCheckpointNoStats(assigned.unionAll(sccs),
          eager = false)
      remaining = checkpointing.localCheckpointNoStats(
        remaining.join(sccs, Seq("id"), "left_anti"), eager = false)
      remEdges = checkpointing.localCheckpointNoStats(
        remEdges
          .join(sccs.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(sccs.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst"), eager = false)
    }
    assigned
  }
}
