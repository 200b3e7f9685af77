package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpointing that DECLARES the physical partitioning.
  *
  * `Dataset.localCheckpoint` under AQE produces a `LogicalRDD` whose output
  * partitioning is unknown (AQE's final partitioning isn't visible at plan
  * capture time), so iterative algorithms that carefully co-partition their
  * loop state still pay a full exchange on every post-checkpoint
  * groupBy/join. This helper truncates lineage the same way but constructs
  * the `LogicalRDD` with an explicit `HashPartitioning` over the given key
  * columns — downstream operators clustered on those keys then plan with NO
  * exchange.
  *
  * CONTRACT: the input frame must actually BE hash-partitioned by `keys`
  * into `numParts` partitions (e.g. via `repartition(numParts, keys*)`
  * directly upstream); declaring a partitioning the data doesn't have
  * yields wrong results. Spark preserves user-specified repartitions under
  * AQE, so `repartition(...)` immediately upstream satisfies the contract.
  *
  * Lives in the `org.apache.spark.sql` tree for `private[sql]` access to
  * `LogicalRDD` construction and `Dataset.ofRows` (same pattern as
  * [[compat]]).
  */
object checkpointing {

  def localCheckpointHashPartitioned(
      df: DataFrame, keys: Seq[String], numParts: Int, eager: Boolean): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // Same materialization shape as Dataset.checkpoint: execute + row copy.
    var rdd = qe.toRdd.map(_.copy())
    rdd = rdd.localCheckpoint()
    if (eager) rdd.count()
    val output: Seq[Attribute] = qe.analyzed.output
    val keyAttrs = keys.map(k =>
      output.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(s"key column '$k' not in ${output.map(_.name)}")))
    val logical = LogicalRDD(
      output, rdd, HashPartitioning(keyAttrs, numParts), Nil, isStreaming = false)(spark)
    ClassicDataset.ofRows(spark, logical)
  }
}
