package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE application — the lakehouse `MERGE INTO` resolved as one
  * relational pass: a base snapshot plus a change set (`op` ∈ `upsert` |
  * `delete`, one row per key) produce the next snapshot:
  *
  *   - `delete`: the key leaves the snapshot (including delete-of-absent,
  *     a no-op);
  *   - `upsert`: the change row's payload replaces the base row's (or
  *     inserts a new key);
  *   - keys without a change pass through unchanged.
  *
  * SHAPE: ONE full-outer shuffle join on the key, resolution is a pure
  * projection — no window, no second pass. On a 100 TB lake both sides
  * bucket/cluster by the key, so the join co-locates and the merge is a
  * map-side zip of sorted runs; the change set is typically compacted
  * first ([[graft.streaming.Streams.streamingLatestVersion]] /
  * q23 `max_by` are exactly that compactor).
  *
  * CONTRACT: at most one change per key — a multi-row change set is
  * ambiguous (which upsert wins?), so it is rejected loudly here rather
  * than resolved silently; compact first. Payload columns must mirror the
  * base's non-key columns by name.
  */
object MergeApply {

  def mergeApply(base: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val payload = base.columns.filter(_ != keyCol).toSeq
    require(changes.columns.toSet == (payload.toSet + keyCol + "op"),
      s"changes must carry [$keyCol, op, ${payload.mkString(", ")}], " +
        s"got [${changes.columns.mkString(", ")}]")
    // One aggregate over the (small, compacted) change set guards the
    // at-most-one-change-per-key contract; the job fails loudly on
    // ambiguity instead of picking a winner.
    val guarded = changes.withColumn("__mrg_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))))
      .withColumn("op",
        when(col("__mrg_n") > 1,
          raise_error(concat(lit("mergeApply: multiple changes for key "),
            col(keyCol).cast("string"))))
          // A NULL op would slip through BOTH downstream guards (the
          // delete filter keeps NULLs, the unknown-op check requires
          // isNotNull) and silently apply — fail it here instead.
          .when(col("op").isNull,
            raise_error(concat(lit("mergeApply: NULL op for key "),
              col(keyCol).cast("string"))))
          .otherwise(col("op")))
      .drop("__mrg_n")
    val b = base.select(col(keyCol).as("__mrg_key"),
      struct(payload.map(col): _*).as("__mrg_base"))
    val c = guarded.select(col(keyCol).as("__mrg_key"), col("op"),
      struct(payload.map(col): _*).as("__mrg_change"))
    b.join(c, Seq("__mrg_key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      // An op that is neither upsert nor delete is a corrupt change feed.
      .withColumn("op",
        when(col("op").isNotNull && col("op") =!= "upsert",
          raise_error(concat(lit("mergeApply: unknown op "), col("op"))))
          .otherwise(col("op")))
      .select(Seq(col("__mrg_key").as(keyCol)) ++ payload.map(p =>
        when(col("op") === "upsert", col(s"__mrg_change.$p"))
          .otherwise(col(s"__mrg_base.$p")).as(p)): _*)
  }
}
