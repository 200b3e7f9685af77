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

  def run(edges: DataFrame, maxFixpointIter: Int = 200): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("src").cast(LongType), col("dst").cast(LongType))
      .filter(col("src") =!= col("dst")).distinct()
    var remEdges = checkpointing.localCheckpointNoStats(e0)
    var remaining = checkpointing.localCheckpointNoStats(
      e0.select(col("src").as("id")).unionAll(e0.select(col("dst").as("id")))
        .distinct())
    var assigned: DataFrame = null

    var guard = 0
    while (remaining.count() > 0) {
      guard += 1
      require(guard <= 10000, "scc: outer peel failed to converge")

      // 1. Forward max-color fixpoint.
      var colors = checkpointing.localCheckpointNoStats(
        remaining.select(col("id"), col("id").as("color")))
      var changed = 1L
      var it = 0
      while (changed > 0) {
        it += 1
        require(it <= maxFixpointIter,
          s"scc: forward fixpoint exceeded $maxFixpointIter rounds")
        val pushed = remEdges.join(colors, remEdges("src") === colors("id"))
          .groupBy(col("dst").as("id")).agg(max("color").as("in_color"))
        val next = checkpointing.localCheckpointNoStats(
          colors.join(pushed, Seq("id"), "left")
            .select(col("id"),
              greatest(col("color"), coalesce(col("in_color"), lit(Long.MinValue)))
                .as("color")))
        changed = next.as("n").join(colors.as("c"), "id")
          .filter(col("n.color") =!= col("c.color")).count()
        colors = next
      }

      // 2. Backward walk from roots inside each color class.
      var reached = checkpointing.localCheckpointNoStats(
        colors.filter(col("id") === col("color")).select("id", "color"))
      // reverse edges restricted to same-color endpoints
      val sameColor = remEdges
        .join(colors.withColumnRenamed("id", "src"), Seq("src"))
        .withColumnRenamed("color", "src_color")
        .join(colors.withColumnRenamed("id", "dst")
          .withColumnRenamed("color", "dst_color"), Seq("dst"))
        .filter(col("src_color") === col("dst_color"))
        .select(col("src"), col("dst"), col("src_color").as("ecolor"))
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
          reached.unionAll(step).distinct())
        changed = next.count() - reached.count()
        reached = next
      }

      // 3. Peel: reached(id, color) is the union of the roots' SCCs.
      val sccs = reached.select(col("id"), col("color").as("scc_id"))
      assigned = if (assigned == null) sccs
        else checkpointing.localCheckpointNoStats(assigned.unionAll(sccs))
      remaining = checkpointing.localCheckpointNoStats(
        remaining.join(sccs, Seq("id"), "left_anti"))
      remEdges = checkpointing.localCheckpointNoStats(
        remEdges
          .join(sccs.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(sccs.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst"))
    }
    assigned
  }
}
