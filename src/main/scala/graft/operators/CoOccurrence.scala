package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite co-occurrence projection — the graph CONSTRUCTION step for
  * item2vec / co-purchase / co-citation pipelines: from (group, item)
  * membership, build the weighted item-item graph where `weight(a, b) =
  * |groups containing both|`.
  *
  * The quadratic hazard is group-size skew: one group with 10^5 items
  * explodes into 5·10^9 pairs and a single straggler task. `maxGroupSize`
  * is the standard cap (Tomkins-style): groups above it are DROPPED from
  * the projection — at corpus scale an over-full group is near-useless
  * co-occurrence signal anyway (every pair in it co-occurs), and the cap
  * bounds the per-group pair volume to `maxGroupSize²/2`, making the
  * self-join's task sizes uniform. The cap and the count of dropped
  * groups are the honest knobs — no silent truncation: use
  * [[droppedGroups]] to audit.
  *
  * Output `[item_a, item_b, weight]` with `item_a < item_b` canonical and
  * `weight >= minWeight`.
  */
object CoOccurrence {

  private def dedupedWithSize(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int) = {
    val membership = df.select(col(groupCol).as("__co_g"),
      col(itemCol).as("__co_i")).distinct()
    val sizes = membership.groupBy("__co_g").agg(count(lit(1)).as("__co_n"))
    (membership, sizes, sizes.filter(col("__co_n") <= maxGroupSize))
  }

  def projectPairs(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int, minWeight: Long = 1L): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize must be >= 2, got $maxGroupSize")
    require(minWeight >= 1, s"minWeight must be >= 1, got $minWeight")
    val (membership, _, kept) = dedupedWithSize(df, groupCol, itemCol, maxGroupSize)
    val m = membership.join(kept.select("__co_g"), Seq("__co_g"))
    m.as("a").join(m.as("b"),
        col("a.__co_g") === col("b.__co_g") && col("a.__co_i") < col("b.__co_i"))
      .groupBy(col("a.__co_i").as("item_a"), col("b.__co_i").as("item_b"))
      .agg(count(lit(1)).as("weight"))
      .filter(col("weight") >= minWeight)
  }

  /** The groups the cap excluded: `[<groupCol>, n_items]` — the audit
    * surface for the no-silent-caps rule.
    */
  def droppedGroups(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int): DataFrame = {
    val (_, sizes, _) = dedupedWithSize(df, groupCol, itemCol, maxGroupSize)
    sizes.filter(col("__co_n") > maxGroupSize)
      .select(col("__co_g").as(groupCol), col("__co_n").as("n_items"))
  }
}
