package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col

/** Checkpointing that DECLARES the physical partitioning AND sort order.
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
  * Additionally (mirroring the reference's hash-partitioned AND pre-sorted
  * spill files, `/root/reference/src/memory/hash_partitioned.rs:146-361`,
  * whose provider declares both so sort-merge joins skip shuffle and sort),
  * the frame is sorted WITHIN partitions by the keys before materialization
  * and the resulting `LogicalRDD` declares the matching `outputOrdering` —
  * downstream sort-merge joins and sort-based aggregates on those keys then
  * plan with NO SortExec on this side either. The sort is applied inside
  * this helper, so the ordering declaration is true by construction.
  *
  * CONTRACT: the input frame must actually BE hash-partitioned by `keys`
  * into `numParts` partitions (e.g. via `repartition(numParts, keys*)`
  * directly upstream); declaring a partitioning the data doesn't have
  * yields wrong results. Spark preserves user-specified repartitions under
  * AQE, so `repartition(...)` immediately upstream satisfies the contract.
  * The partition COUNT half of the contract is asserted here (a mismatch
  * would silently mis-route rows in exchange-elided joins); the hash
  * function half is not mechanically checkable without a full scan and
  * remains the caller's obligation.
  *
  * Lives in the `org.apache.spark.sql` tree for `private[sql]` access to
  * `LogicalRDD` construction and `Dataset.ofRows` (same pattern as
  * [[compat]]).
  */
object checkpointing {

  def localCheckpointHashPartitioned(
      df: DataFrame, keys: Seq[String], numParts: Int, eager: Boolean,
      sortWithinPartitions: Boolean = true): DataFrame = {
    val sorted =
      if (sortWithinPartitions) df.sortWithinPartitions(keys.map(col): _*) else df
    val ds = sorted.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // Same materialization shape as Dataset.checkpoint: execute + row copy.
    var rdd = qe.toRdd.map(_.copy())
    if (rdd.getNumPartitions == 0) {
      // AQE propagates provably-empty relations to a zero-partition scan.
      // An empty frame is trivially hash-partitioned, but the declared
      // partition COUNT must still be physically true for exchange-elided
      // co-partitioned joins — so rebuild it as numParts empty partitions.
      rdd = spark.sparkContext.parallelize(
        Seq.empty[org.apache.spark.sql.catalyst.InternalRow], numParts)
    } else {
      // Partitioning-contract guard: a declared partitioning over the wrong
      // partition count elides exchanges the plan actually needs and
      // silently mis-routes rows. toRdd has already finalized AQE's plan,
      // so the count observed here is physical.
      require(rdd.getNumPartitions == numParts,
        s"declared-partitioning contract violated: input has ${rdd.getNumPartitions} " +
          s"partitions but HashPartitioning($keys, $numParts) was declared — " +
          "repartition(numParts, keys*) immediately upstream")
      rdd = rdd.localCheckpoint()
      if (eager) rdd.count()
    }
    val output: Seq[Attribute] = qe.analyzed.output
    val keyAttrs = keys.map(k =>
      output.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(s"key column '$k' not in ${output.map(_.name)}")))
    val ordering: Seq[SortOrder] =
      if (sortWithinPartitions) keyAttrs.map(a => SortOrder(a, Ascending)) else Nil
    val logical = LogicalRDD(
      output, rdd, HashPartitioning(keyAttrs, numParts), ordering, isStreaming = false)(spark)
    ClassicDataset.ofRows(spark, logical)
  }

  /** Lineage-truncating local checkpoint that RESETS the leaf's estimated
    * statistics instead of propagating them.
    *
    * `Dataset.localCheckpoint` copies the optimizer's ESTIMATED
    * `sizeInBytes` onto the new `LogicalRDD` leaf. In an iterative
    * algorithm each round's estimate is a product over the previous
    * round's leaf sizes (every join MULTIPLIES the sides' estimates), so
    * the estimate's bit-length compounds geometrically round over round —
    * one self-join per round doubles it (measured: 20 -> 38,880 bits in 12
    * rounds, graft.tools.StatsProbe), and a 30-round peel leaves Catalyst
    * multiplying million-bit BigIntegers inside stats estimation: planning
    * hangs while the cluster idles. Capped loops mask it; deep fixpoint
    * loops die of it.
    *
    * This helper materializes the frame exactly like `localCheckpoint`
    * (execute + row copy + localCheckpoint + eager count) but constructs
    * the `LogicalRDD` WITHOUT the inherited stats, so every round restarts
    * from `defaultSizeInBytes` — constant-size planning forever. Use it
    * for EVERY per-round checkpoint in an unbounded or deep loop. The cost
    * is that Catalyst can no longer auto-broadcast off these leaves'
    * (garbage anyway) estimates — loops that want a broadcast say so
    * explicitly with `broadcast()`.
    */
  def localCheckpointNoStats(df: DataFrame, eager: Boolean = true): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    val rdd = qe.toRdd.map(_.copy()).localCheckpoint()
    if (eager) rdd.count()
    val logical = LogicalRDD(qe.analyzed.output, rdd,
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0),
      Nil, isStreaming = false)(spark)
    ClassicDataset.ofRows(spark, logical)
  }

  /** [[localCheckpointNoStats]]'s eager form, RETURNING the row count the
    * materialization already paid for. Every eager local checkpoint runs
    * `rdd.count()` to force the blocks; callers that need the frame's
    * cardinality anyway (e.g. to decide whether a delta frame is small
    * enough to broadcast) capture it here instead of scheduling a second
    * count job over the materialized RDD.
    */
  def localCheckpointCounted(df: DataFrame): (DataFrame, Long) = {
    val ds = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    val rdd = qe.toRdd.map(_.copy()).localCheckpoint()
    val n = rdd.count()
    val logical = LogicalRDD(qe.analyzed.output, rdd,
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0),
      Nil, isStreaming = false)(spark)
    (ClassicDataset.ofRows(spark, logical), n)
  }

  /** Rebuild an already-checkpointed frame's `LogicalRDD` WITHOUT its
    * inherited estimated stats, preserving the rdd, declared partitioning,
    * and ordering. For checkpoint flavors this module doesn't construct
    * itself — `Dataset.checkpoint(reliable)` in Pregel's reliable-dir mode
    * — which propagate estimates exactly like `localCheckpoint` (see
    * [[localCheckpointNoStats]]). No-op on non-LogicalRDD plans.
    */
  def dropLeafStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        ClassicDataset.ofRows(ds.sparkSession,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming)(ds.sparkSession))
      case _ => df
    }
  }

  /** Release the executor storage behind a checkpointed frame NOW.
    *
    * `Dataset.unpersist` only touches CacheManager entries; the blocks
    * behind a `localCheckpoint` (or [[localCheckpointHashPartitioned]])
    * frame belong to the checkpointed RDD and are otherwise reclaimed only
    * when the ContextCleaner garbage-collects the RDD — on a long-lived
    * session that means storage grows until GC pressure, not when the
    * algorithm is done with the frame. This digs the RDD out of the
    * `LogicalRDD` and unpersists it explicitly (non-blocking).
    *
    * Only call this when the frame (and anything still lazily derived from
    * it) is no longer needed: a local checkpoint's lineage is truncated, so
    * a released block cannot be recomputed.
    */
  def release(df: DataFrame): Unit = {
    val ds = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    // A checkpointed frame wrapped in join-strategy hints (the compose
    // loops' `broadcast(...localCheckpoint(true))` shape) analyzes to
    // ResolvedHint(LogicalRDD), not a bare LogicalRDD — matching only the
    // top level made release a silent no-op and leaked one checkpoint
    // block set per micro-batch in the CDC maintenance loops (r19
    // advisor finding). Strip hint wrappers before matching.
    def stripHints(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
        stripHints(h.child)
      case other => other
    }
    stripHints(ds.queryExecution.analyzed) match {
      case lr: LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        // RELIABLE checkpoints additionally own a directory of files; evict
        // it (the analogue of the reference's per-iteration spill cleanup,
        // parquet_checkpointer.rs:133-165). Local checkpoints return None.
        lr.rdd.getCheckpointFile.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(ds.sparkSession.sparkContext.hadoopConfiguration)
          try fs.delete(path, true)
          catch { case _: java.io.IOException => () } // eviction is best-effort
        }
      case _ => ()
    }
    df.unpersist(blocking = false)
  }
}
