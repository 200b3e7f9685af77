package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphFrame

case class MISResult(vertices: DataFrame, iterations: Int)

/** Maximal independent set via Ghaffari's probability-based nomination
  * (Ghaffari 2016), ported from the reference's bespoke loop
  * (`/root/reference/src/algorithm/subgraph/maximal_independent_set.rs:74-399`).
  *
  * Per round, over the symmetrized simple graph: each active vertex draws a
  * nomination with its current probability `p`; the effective degree
  * `d(v) = Σ p(u)` over neighbours decides whether `p` halves or doubles;
  * a nominated vertex with no nominated neighbour joins the set, and it and
  * its neighbours leave the active graph (two anti-joins contract the edge
  * set). Vertices isolated in the active graph join immediately; when no
  * edges remain, the pairwise non-adjacent survivors join in one sweep.
  *
  * Improvements over the reference:
  *   - Nomination draws are HASH-based — `xxhash64(id, seed, iteration)`
  *     mapped to [0,1) — instead of the reference's unseedable `random()`
  *     (`maximal_independent_set.rs:102-104`). A draw is a pure function of
  *     (id, seed, iteration): reproducible across runs, partitionings and
  *     cluster layouts, and safe under task retry/recompute — which is what
  *     lets every per-round frame be LAZILY checkpointed (no eager "freeze
  *     the randomness" materializations).
  *   - One driver action per round: the three loop-carried frames are
  *     materialized by a single combined count (the same discipline as
  *     [[ConnectedComponents]]), not ~9 eager checkpoints+counts — at
  *     ~1.5 s of fixed driver latency per action, this is the difference
  *     between O(rounds) and O(9·rounds) of scheduling overhead.
  */
class MaximalIndependentSet(graph: GraphFrame) {
  private var seed = 42L
  private var smallThresholdOpt: Option[Long] = None
  // Builder setter wins; otherwise the session default (spark.graft.smallGraphThreshold).
  private def smallThreshold: Long = smallThresholdOpt.getOrElse(
    graft.GraftConf.smallGraphThreshold(graph.vertices.sparkSession))

  def setSeed(s: Long): this.type = { seed = s; this }

  /** Edge-count threshold below which the set is computed on the driver
    * with a seeded greedy sweep (independence + maximality hold by
    * construction; the distributed rounds only pay off once the graph
    * outgrows a single collect). 0 disables the hybrid path.
    */
  def smallGraphThreshold(n: Long): this.type = { smallThresholdOpt = Some(n); this }

  private val SRC = GraphFrame.SRC
  private val DST = GraphFrame.DST
  private val ID = GraphFrame.ID

  /** OR the freshly-selected `members` (`[id]`) into `current` (`[id, mis]`);
    * the joined flag coalesces to false so a non-match can't NULL the OR.
    */
  private def orIntoMis(current: DataFrame, members: DataFrame): DataFrame = {
    val m = members.select(col(ID).as("__mis_new_v"), lit(true).as("__mis_new_flag"))
    current.join(m, col(ID) === col("__mis_new_v"), "left")
      .select(col(ID),
        (col("mis") || coalesce(col("__mis_new_flag"), lit(false))).as("mis"))
  }

  def run(): MISResult = {
    val release = org.apache.spark.sql.graft.checkpointing.release _
    // Dedup matters here: duplicate edges would inflate effective degrees.
    // Lazy: the threshold count (or the first round's combined count)
    // materializes it.
    var edges = GraphFrame.symmetrizeEdges(
      graph.edges.select(SRC, DST), doDistinct = true).localCheckpoint(false)

    // Subcritical graphs: greedy on the driver in seeded-random order.
    if (smallThreshold > 0 && edges.count() <= 2 * smallThreshold &&
        graph.vertices.count() <= smallThreshold) {
      val adj = scala.collection.mutable.LongMap.empty[scala.collection.mutable.Set[Long]]
      edges.collect().foreach { r =>
        val u = r.getLong(0); val v = r.getLong(1)
        adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      }
      val vids = graph.vertices.select(col(ID)).collect().map(_.getLong(0))
      val order = new scala.util.Random(seed).shuffle(vids.sorted.toIndexedSeq)
      val inSet = scala.collection.mutable.Set.empty[Long]
      order.foreach { v =>
        if (!adj.get(v).exists(_.exists(inSet.contains))) inSet += v
      }
      val spark = graph.vertices.sparkSession
      import spark.implicits._
      release(edges)
      return MISResult(inSet.toSeq.sorted.toDF(ID), iterations = 0)
    }

    var currentMis = graph.vertices
      .select(col(ID), lit(false).as("mis")).localCheckpoint(false)
    // Active vertices with their selection probability (Ghaffari seeds 1/2).
    var verticesLeft = graph.vertices
      .select(col(ID), lit(0.5).as("p")).localCheckpoint(false)

    var iteration = 0
    var converged = false

    while (!converged) {
      // ---- effective degree: d(v) = Σ p over v's neighbours ----
      // All per-round frames are LAZY checkpoints (plan truncation now,
      // materialization in the round's single combined count below); the
      // hash-based draws make that safe — see class doc.
      val effectiveDegrees = edges
        .join(verticesLeft.select(col(ID).as("__mis_nbr"), col("p")),
          col(DST) === col("__mis_nbr"), "inner")
        .groupBy(col(SRC)).agg(sum(col("p")).as("__mis_deg"))
        .localCheckpoint(false)

      // ---- nominate with p_t, then advance p -> p_{t+1} ----
      // Draw u(id) = portableHash60("id:seed:iter") / 2^60 ∈ [0,1):
      // deterministic per (id, iteration) — recomputes can never redraw —
      // AND engine-portable (md5-based, see PortableHashes), so the whole
      // loop is replicable in plain SQL: the g10b driver gate unrolls these
      // exact rounds in DuckDB. p stays a power of two and degree sums stay
      // dyadic-exact, so every comparison is bit-identical across engines.
      val draw = conv(substring(md5(concat_ws(":", col(ID), lit(seed), lit(iteration))), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(1.152921504606846976e18)
      val probs = verticesLeft
        .join(effectiveDegrees, col(ID) === col(SRC), "inner")
        .withColumn("nom", draw <= col("p"))
        .withColumn("p",
          when(col("__mis_deg") >= 2.0, col("p") / 2.0)
            .when(col("p") * 2.0 <= 0.5, col("p") * 2.0)
            .otherwise(0.5))
        .select(col(ID), col("p"), col("nom"))
        .localCheckpoint(false)

      // ---- isolated actives: no edges, absent from effectiveDegrees ----
      val isolated = verticesLeft
        .join(effectiveDegrees, col(ID) === col(SRC), "left_anti")
        .select(col(ID))

      // ---- does any neighbour nominate itself? ----
      val hasNomNbr = edges
        .join(probs.select(col(ID).as("__mis_nbr"), col("nom")),
          col(DST) === col("__mis_nbr"), "inner")
        .groupBy(col(SRC)).agg(bool_or(col("nom")).as("__mis_has_nbr_nom"))

      // ---- nominated with no nominated neighbour => joins the MIS ----
      val joinedMis = probs
        .join(hasNomNbr, col(ID) === col(SRC), "inner")
        .filter(!col("__mis_has_nbr_nom") && col("nom"))
        .select(col(ID))
        .localCheckpoint(false)

      // The symmetrized edge set makes one direction sufficient: every
      // neighbour u of a joined v is the source of edge (u, v).
      val neighborsOfMis = edges
        .join(joinedMis.select(col(ID).as("__mis_j")), col(DST) === col("__mis_j"), "inner")
        .select(col(SRC).as(ID))

      val removed = neighborsOfMis.union(joinedMis).distinct().localCheckpoint(false)
      val newMembers = isolated.union(joinedMis).distinct()

      val oldMis = currentMis
      currentMis = orIntoMis(currentMis, newMembers).localCheckpoint(false)

      val removedKeys = removed.select(col(ID).as("__mis_rem_v"))
      val oldVerticesLeft = verticesLeft
      verticesLeft = probs
        .join(removedKeys, col(ID) === col("__mis_rem_v"), "left_anti")
        .select(col(ID), col("p"))
        .localCheckpoint(false)

      val oldEdges = edges
      edges = edges
        .join(removedKeys, col(SRC) === col("__mis_rem_v"), "left_anti")
        .join(removedKeys, col(DST) === col("__mis_rem_v"), "left_anti")
        .localCheckpoint(false)

      // ---- the round's ONE materializing action: all three loop-carried
      // checkpoints (and, transitively, every intermediate above) execute
      // in this single job.
      val counts = edges.select(count(lit(1)).as("e"))
        .crossJoin(verticesLeft.select(count(lit(1)).as("v")))
        .crossJoin(currentMis.select(count(lit(1)).as("m")))
        .collect()(0)
      val eLeft = counts.getLong(0)
      val vLeft = counts.getLong(1)

      // Everything superseded or intermediate is materialized by now and
      // nothing downstream references it: free the blocks for real.
      Seq(oldMis, oldVerticesLeft, oldEdges,
        effectiveDegrees, probs, joinedMis, removed).foreach(release)

      if (eLeft == 0) {
        if (vLeft > 0) {
          // Survivors are pairwise non-adjacent: sweep them all in.
          val oldMis2 = currentMis
          currentMis = orIntoMis(currentMis, verticesLeft.select(col(ID)))
            .localCheckpoint(true)
          release(oldMis2)
        }
        converged = true
      }
      iteration += 1
    }

    release(verticesLeft)
    release(edges)
    MISResult(currentMis.filter(col("mis")).select(col(ID)), iteration)
  }
}
