package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet layout — the OTHER durable layout tool
  * next to [[BucketedTables]]: bucketing persists a HASH layout (equi-join
  * / groupBy keys), directory partitioning persists a VALUE layout
  * (low-cardinality filter columns). At 100 TB the difference is whether a
  * `WHERE event_type = 'click'` query reads 100 TB or one directory: the
  * partition values live in the file PATHS, so pruning happens at planning
  * time (`PartitionFilters` in the scan, zero data files touched for
  * excluded values) — no footer, page, or row ever read.
  *
  * Discipline: partition columns must be low-cardinality (each value is a
  * directory; a high-cardinality partition column is a small-files DDoS on
  * the filesystem), and the written frame should be repartitioned by the
  * partition columns first so each directory receives one file per
  * shuffle partition that actually holds its value, not one file per
  * upstream task.
  */
object PartitionedTables {

  /** Write `df` under `<warehouse>/<name>` partitioned by `partCols`;
    * returns the path. Overwrites a previous table of the same name.
    */
  def writePartitioned(df: DataFrame, name: String,
      partCols: Seq[String]): String = {
    require(partCols.nonEmpty, "at least one partition column")
    import org.apache.spark.sql.functions.col
    val base = df.sparkSession.conf.get("spark.sql.warehouse.dir")
    val path = s"$base/$name"
    df.repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    path
  }

  /** The partitioned table back as a DataFrame; filters on the partition
    * columns prune directories at planning time.
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** DYNAMIC partition overwrite (b09): replace ONLY the partitions
    * present in `df`, leaving every other partition's files physically
    * untouched — the daily-reprocess primitive ("yesterday's `click`
    * partition was wrong; rewrite it") that static overwrite cannot
    * express: Spark's default `partitionOverwriteMode=static` TRUNCATES
    * THE WHOLE TABLE on overwrite, the classic
    * lost-my-other-362-partitions incident. The mode flips to `dynamic`
    * for exactly this one write (conf saved/restored), under which the
    * committer deletes and rewrites only the directories the incoming
    * frame actually contains rows for.
    *
    * At 100 TB the point is the asymmetry: the write costs
    * O(touched partitions), planning-time pruning on the readers is
    * unaffected, and untouched directories are never listed, read, or
    * rewritten (byte-identical files — spec-pinned, along with the
    * static-mode contrast).
    */
  def overwritePartitions(df: DataFrame, path: String,
      partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "at least one partition column")
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try df.repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    finally spark.conf.set(key, saved)
  }
}
