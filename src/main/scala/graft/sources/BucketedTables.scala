package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.graph.GraphFrame

/** Bucketed parquet tables — the CROSS-JOB analogue of the in-job
  * declared-layout checkpoints (`org.apache.spark.sql.graft.checkpointing`).
  *
  * A checkpoint's declared hash-partitioning dies with the session; a 100 TB
  * pipeline runs as MANY jobs (ingest today, dedup tonight, train tomorrow),
  * and re-shuffling 100 TB of edges at the start of every job is the single
  * largest avoidable cost in that pipeline. Writing the table bucketed by
  * its join key persists the layout INTO the storage: every later job's
  * scan reports the bucket hash-partitioning, so joins and aggregations on
  * the bucket key plan with zero exchanges — the durable equivalent of the
  * reference's hash-partitioned spill files
  * (`/root/reference/src/memory/hash_partitioned.rs:77-361`), which live
  * only for one process.
  *
  * Discipline: the frame is repartitioned to one shuffle-partition per
  * bucket before the write so each bucket lands in ONE file with rows
  * sorted by the keys (`sortBy` guarantees order only per file) — that is
  * what lets sort-merge joins skip the sort as well as the shuffle.
  */
object BucketedTables {

  /** Drop `table` from the catalog AND clear any dangling directory a
    * previous session's in-memory catalog left behind: `mode(overwrite)`
    * only replaces tables the CURRENT catalog knows, so a stale location
    * would block the CTAS with LOCATION_ALREADY_EXISTS.
    */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Save `df` as parquet table `table`, bucketed AND per-file-sorted by
    * `keys`. Overwrites any existing table of the same name.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "at least one bucket key")
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    dropWithLocation(spark, table)
    df.repartition(numBuckets, keys.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Replace `table` with a small UNBUCKETED parquet table — the sidecar
    * shape (an ANN codebook, a manifest): one file, no layout contract,
    * same stale-location discipline as [[writeBucketed]].
    */
  def replaceSidecar(df: DataFrame, table: String): Unit = {
    dropWithLocation(df.sparkSession, table)
    df.coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(table)
  }

  /** The bucketed table as a DataFrame; its scan reports the bucket
    * partitioning (with `spark.sql.sources.bucketing.enabled`, on by
    * default), so key-aligned joins/aggregations skip the shuffle.
    *
    * Sort elision additionally needs the scan to report the per-file sort
    * order, which Spark only does behind
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` AND when every
    * bucket is a single file — the planner verifies the file count per
    * table at planning time, so the flag can never claim an ordering that
    * does not hold; [[writeBucketed]]'s pre-repartition is what makes the
    * condition hold for tables written here. NOTE the flag is SESSION-wide
    * and stays set after this call: for bucketed tables written elsewhere
    * with multiple files per bucket it costs an extra file-count check at
    * planning, never correctness.
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.table(table)
  }

  /** Persist a graph as `<name>_vertices` (bucketed by id) and
    * `<name>_edges` (bucketed by src): the layout every iterative
    * algorithm in this library wants on its first iteration.
    */
  def saveGraph(g: GraphFrame, name: String, numBuckets: Int): Unit = {
    writeBucketed(g.vertices, s"${name}_vertices", numBuckets, Seq(GraphFrame.ID))
    writeBucketed(g.edges, s"${name}_edges", numBuckets, Seq(GraphFrame.SRC))
  }

  /** Load a graph persisted by [[saveGraph]]. */
  def loadGraph(spark: SparkSession, name: String): GraphFrame =
    GraphFrame(readBucketed(spark, s"${name}_vertices"),
      readBucketed(spark, s"${name}_edges"))
}
