package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphFrame

/** HITS hubs-and-authorities (Kleinberg), beyond the reference's algorithm
  * set — fixed-iteration UNNORMALIZED form: with all-ones init, iteration k
  * yields pure INTEGER alternating-path counts
  * (`auth_k(v) = Σ_{u→v} hub_{k-1}(u)`, `hub_k(u) = Σ_{u→v} auth_k(v)`),
  * so results are 64-bit-exact — no float summation order, no
  * normalization drift — and the oracle gate is strict equality. Rank
  * ORDER equals normalized HITS at the same iteration count; callers
  * wanting scores in [0,1] divide by the max/L2 norm at the end.
  *
  * SHAPE per iteration: two edge⋈state joins with map-side-combining sums
  * — the aggregateMessages plan, twice. Fixed small iteration counts
  * (2-4 in practice) keep the un-checkpointed plan shallow; for larger
  * `iters` the state is lineage-truncated every 3 rounds.
  *
  * Overflow: counts grow like (avg-degree)^(2k); `Σ` uses Spark's LongType
  * sum (wraps on overflow like the SQL oracle would differ) — callers at
  * extreme degree x iteration combinations should L2-normalize offline.
  */
class Hits(graph: GraphFrame) {
  private var iters = 2

  def iterations(n: Int): this.type = {
    require(n >= 1, s"need iters >= 1, got $n"); iters = n; this
  }

  /** `[id, auth, hub]` (BIGINT path counts) for every vertex. */
  def run(): DataFrame = {
    val ID = GraphFrame.ID
    val edges = graph.edges.select(GraphFrame.SRC, GraphFrame.DST)
    var state = graph.vertices.select(col(ID),
      lit(1L).as("auth"), lit(1L).as("hub"))
    var i = 0
    while (i < iters) {
      val auth = edges.join(
          state.select(col(ID).as("__s_id"), col("hub").as("__s_hub")),
          col(GraphFrame.SRC) === col("__s_id"))
        .groupBy(col(GraphFrame.DST).as(ID))
        .agg(sum("__s_hub").as("__new_auth"))
      val withAuth = state.select(col(ID), col("hub"))
        .join(auth.withColumnRenamed(ID, "__a_id"), col(ID) === col("__a_id"), "left")
        .select(col(ID), coalesce(col("__new_auth"), lit(0L)).as("auth"), col("hub"))
      val hub = edges.join(
          withAuth.select(col(ID).as("__d_id"), col("auth").as("__d_auth")),
          col(GraphFrame.DST) === col("__d_id"))
        .groupBy(col(GraphFrame.SRC).as(ID))
        .agg(sum("__d_auth").as("__new_hub"))
      state = withAuth.select(col(ID), col("auth"))
        .join(hub.withColumnRenamed(ID, "__h_id"), col(ID) === col("__h_id"), "left")
        .select(col(ID), col("auth"), coalesce(col("__new_hub"), lit(0L)).as("hub"))
      i += 1
      if (i % 3 == 0 && i < iters) state = state.localCheckpoint(false)
    }
    state
  }
}
