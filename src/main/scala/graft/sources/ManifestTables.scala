package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max manifest — the data-skipping catalog plain parquet
  * lacks: Delta/Iceberg prune FILES at planning time from column stats;
  * bare `spark.read.parquet` can only row-group-skip INSIDE each opened
  * file, after listing and scheduling all of them. This module persists a
  * sibling `<table>__manifest` parquet (one row per data file: min/max per
  * tracked column) at write time and, on read, turns a range predicate
  * into an explicit pruned file list — planning-time skipping with zero
  * table-format dependency.
  *
  * Composes with [[ZOrderedTables]]: z-clustering is WHAT makes per-file
  * spans narrow; the manifest is what turns narrow spans into files never
  * opened. The manifest is file-count-sized (a 100 TB table at 1 GB files
  * is a 10^5-row manifest — driver-trivial), rebuilt with each overwrite
  * (staged to a temp dir, then renamed into place — single-writer
  * assumed, as with any non-transactional table layout), and consulted
  * with one small scan before the main plan.
  *
  * The predicate re-applies on the scan (`readPruned` returns the filter
  * too), so manifest pruning can only SKIP work, never change results —
  * which is exactly what the b06 gate checks against the unpruned oracle.
  */
object ManifestTables {

  private def manifestPath(path: String) = s"${path}__manifest"

  /** Write `df` as parquet plus its per-file min/max manifest over
    * `statsCols`. Returns the data path.
    */
  def writeWithManifest(df: DataFrame, name: String,
      statsCols: Seq[String]): String = {
    require(statsCols.nonEmpty, "at least one stats column")
    val spark = df.sparkSession
    val base = spark.conf.get("spark.sql.warehouse.dir")
    val path = s"$base/$name"
    df.write.mode("overwrite").parquet(path)
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    // Stage the manifest beside its final path, then swap via renames: a
    // crash DURING the staging build leaves the old manifest intact, and
    // a crash inside the swap window leaves a recoverable __old copy
    // rather than a manifest pointing at deleted files. Every rename is
    // CHECKED — Hadoop FileSystems report most failures by returning
    // false, not throwing, and a silent false here would surface later as
    // a missing-manifest read error with no trace of the cause. Renames
    // are the strongest swap a plain filesystem offers; concurrent
    // writers still need external coordination (single-writer assumed).
    val mPath = manifestPath(path)
    val tmp = s"${mPath}__staging"
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    def mv(from: String, to: String): Unit =
      require(fs.rename(new org.apache.hadoop.fs.Path(from),
        new org.apache.hadoop.fs.Path(to)),
        s"manifest swap failed: rename $from -> $to returned false")
    val old = s"${mPath}__old"
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
    val hadPrev = fs.exists(new org.apache.hadoop.fs.Path(mPath))
    if (hadPrev) mv(mPath, old)
    mv(tmp, mPath)
    if (hadPrev) fs.delete(new org.apache.hadoop.fs.Path(old), true)
    path
  }

  /** Read back only the files whose `[min_col, max_col]` span intersects
    * `[lo, hi]`; the residual predicate is re-applied on the scan, so the
    * result equals the unpruned read + filter regardless of manifest
    * contents. Empty file list short-circuits to an empty frame with the
    * table's schema.
    *
    * RECOVERY: the writer's swap has a window between `mv(mPath, old)`
    * and `mv(tmp, mPath)` where no manifest sits at the final path — a
    * crash there, or a reader racing the swap, would otherwise die with a
    * missing-manifest error. The reader falls back to the UNPRUNED scan
    * with the predicate: exact by the re-apply invariant, merely without
    * skipping. (The `__old` copy is NOT a valid fallback — it describes
    * the pre-overwrite data files, which the data overwrite already
    * deleted; its file list points at nothing.)
    */
  def readPruned(spark: SparkSession, path: String, statsCol: String,
      lo: Long, hi: Long): DataFrame = {
    val mPath = manifestPath(path)
    val predicateOnly: Column = col(statsCol) >= lo && col(statsCol) <= hi
    // try/catch, not exists-then-read: a writer can swap the manifest
    // away between the check and the read (the exists probe alone would
    // leave exactly the race the fallback is for). Any failure to read
    // the manifest — absent, mid-swap, torn — degrades to the unpruned
    // exact scan. NonFatal, not just AnalysisException: a manifest absent
    // at RESOLUTION time raises AnalysisException, but a reader racing the
    // swap can pass analysis (files listed) and then lose the files during
    // the collect() job — that surfaces as a FileNotFoundException wrapped
    // in SparkException, which must take the same fallback.
    val keepOpt = try {
      Some(spark.read.parquet(mPath)
        .filter(col(s"max_$statsCol") >= lo && col(s"min_$statsCol") <= hi)
        .select("file").collect().map(_.getString(0)))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
    val keep = keepOpt match {
      case None => return spark.read.parquet(path).filter(predicateOnly)
      case Some(k) => k
    }
    val predicate: Column = col(statsCol) >= lo && col(statsCol) <= hi
    if (keep.isEmpty)
      spark.read.parquet(path).filter(predicate).limit(0)
    else
      spark.read.parquet(keep.toIndexedSeq: _*).filter(predicate)
  }
}
