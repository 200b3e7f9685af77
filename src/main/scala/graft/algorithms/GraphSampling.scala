package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphFrame

/** Layered neighbor sampling — the GNN mini-batch loader's shape
  * (GraphSAGE, Hamilton et al. 2017): from a seed vertex set, sample at
  * most `fanouts(0)` out-neighbors per seed, then `fanouts(1)` per
  * layer-1 vertex, and so on — the bounded computation graph a
  * node-embedding training step consumes, materialized as edge rows.
  *
  * Beyond the reference's algorithm set (no sampling member in
  * `/root/reference/src/algorithm`); the DRAW is the MIS discipline
  * rather than `rand()`: each candidate edge ranks by the engine-portable
  * 60-bit md5 hash of `"src:dst:seed:layer"` (ties broken by dst), so the
  * sample is a pure function of (graph, seed, fanouts) — rerun-identical,
  * replayable in ANY engine with md5, and therefore exactly hash-gated
  * (g43) where a `rand()` sampler could only be gated on counts.
  * Different layers draw different hashes (the layer rides the preimage),
  * so a vertex reached in two layers re-samples independently, per the
  * GraphSAGE contract; revisited vertices are NOT pruned (the standard
  * semantics — the computation graph may share subtrees).
  *
  * SHAPE at 100 TB: per layer, ONE semi-join of the edge table against
  * the (shrinking or fanout-bounded) frontier plus a per-src top-k —
  * partitioned by src, no global sort; the frontier after layer ℓ is at
  * most `|seeds| · Π fanouts` rows, so deep fanouts bound work
  * geometrically regardless of corpus degree (hubs contribute k rows,
  * not degree rows). The edge scan repeats per layer — bucket the edge
  * table by src to make every layer's semi-join co-located.
  */
object GraphSampling {
  private val SRC = GraphFrame.SRC
  private val DST = GraphFrame.DST

  /** Sampled computation-graph edges `[layer, src, dst]` (layer 1-based).
    * `seeds` must carry an `id` column; `fanouts` one bound per layer.
    */
  def neighborSample(edges: DataFrame, seeds: DataFrame,
      fanouts: Seq[Int], seed: Long): DataFrame = {
    require(fanouts.nonEmpty && fanouts.forall(_ >= 1),
      s"fanouts must be non-empty positive, got ${fanouts.mkString(",")}")
    require(seeds.columns.contains(GraphFrame.ID),
      s"seeds needs an '${GraphFrame.ID}' column, got " +
        seeds.columns.mkString(", "))
    // Distinct edges: the sample is without replacement from the
    // DISTINCT out-neighbor set — a multigraph duplicate must not
    // occupy two of the k slots.
    val e = edges.select(col(SRC), col(DST)).distinct()
    var frontier = seeds.select(col(GraphFrame.ID)).distinct()
    val layers = fanouts.zipWithIndex.map { case (k, i) =>
      val layer = i + 1
      // The engine-portable draw: first 15 hex digits of
      // md5("src:dst:seed:layer") as BIGINT — `conv` here,
      // ('0x' || substr(md5(...), 1, 15))::BIGINT in DuckDB.
      val h = conv(substring(md5(concat_ws(":",
        col(SRC), col(DST), lit(seed), lit(layer))), 1, 15), 16, 10)
        .cast("long")
      val ranked = e.join(frontier,
          col(SRC) === col(GraphFrame.ID), "left_semi")
        .withColumn("__ns_h", h)
        .withColumn("__ns_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(SRC)).orderBy(col("__ns_h"), col(DST))))
        .filter(col("__ns_rn") <= k)
        .select(lit(layer.toLong).as("layer"), col(SRC), col(DST))
      frontier = ranked.select(col(DST).as(GraphFrame.ID)).distinct()
      ranked
    }
    layers.reduce(_ unionByName _)
  }

  /** K-hop EGO SUBGRAPH — [[neighborSample]]'s unsampled twin (the
    * debugging / subgraph-training-data extraction): every edge lying
    * on a directed path of length ≤ `depth` out of the seed set, i.e.
    * `(u, v)` with `dist(seeds → u) ≤ depth − 1`, tagged with the hop
    * at which its source is first reached (`hop` = that dist + 1,
    * 1-based — each edge reported ONCE even when reachable along many
    * paths, which is what keeps the output edge-set-sized instead of
    * path-count-sized). Same per-level shape as the sampler minus the
    * top-k: one semi-join per hop over a frontier of NEWLY reached
    * vertices only (visited vertices never re-expand), so cost is the
    * reached subgraph's edges, never the corpus.
    */
  def egoSubgraph(edges: DataFrame, seeds: DataFrame,
      depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(seeds.columns.contains(GraphFrame.ID),
      s"seeds needs an '${GraphFrame.ID}' column, got " +
        seeds.columns.mkString(", "))
    val e = edges.select(col(SRC), col(DST)).distinct()
    var visited = seeds.select(col(GraphFrame.ID)).distinct()
      .localCheckpoint(true)
    var frontier = visited
    val hops = (1 to depth).flatMap { hop =>
      if (frontier.isEmpty) None
      else {
        val out = e.join(frontier, col(SRC) === col(GraphFrame.ID),
            "left_semi")
          .select(lit(hop.toLong).as("hop"), col(SRC), col(DST))
          .localCheckpoint(true)
        frontier = out.select(col(DST).as(GraphFrame.ID)).distinct()
          .join(visited, Seq(GraphFrame.ID), "left_anti")
          .localCheckpoint(true)
        visited = visited.unionByName(frontier).localCheckpoint(true)
        Some(out)
      }
    }
    if (hops.isEmpty)
      e.select(lit(0L).as("hop"), col(SRC), col(DST)).limit(0)
    else hops.reduce(_ unionByName _)
  }
}
