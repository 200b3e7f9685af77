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
    * `statsCols`; columns also named in `bloomCols` additionally get a
    * per-file BLOOM sidecar (`bloom_<col>`: packed `array<bigint>` bitset,
    * plus its `bloomk_<col>` hash count) — the b14 extension. Min/max
    * skipping is useless for id-keyed POINT lookups over high-cardinality
    * keys (hash-placed ids make every file's [min, max] span the whole
    * domain, so a range check keeps everything); a bloom answers "might
    * this file contain THIS key" directly, within fpp.
    * The bitsets build with the house [[graft.functions.BloomKernels]]
    * packed aggregate (the q21 runtime-filter machinery) — one array of
    * probe positions per row (`xxhash64(key, 42+salt) mod mBits`, the
    * formula [[graft.functions.BloomKernels.position]] pins), no explode,
    * so the blooms ride the SAME per-file aggregation scan as the min/max.
    * (Spark's own `BloomFilterMightContain` requires a CONSTANT filter —
    * it cannot probe a per-row bloom column, which is exactly the manifest
    * shape.) Sized by `expectedItemsPerFile`/`bloomFpp` (optimal-bits
    * formula): the default ~4 M items at 1% is ~5 MB per file — manifest
    * rows stay file-count-bounded, and the probe never collects bitsets to
    * the driver (the might-contain predicate evaluates inside the manifest
    * scan; only surviving file NAMES come back). Keys hash as LONGS
    * (`cast("long")` before xxhash64) so any integral column width probes
    * consistently. Returns the data path.
    */
  def writeWithManifest(df: DataFrame, name: String,
      statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      expectedItemsPerFile: Long = 1L << 22,
      bloomFpp: Double = 0.01): String = {
    require(statsCols.nonEmpty, "at least one stats column")
    require(bloomCols.forall(statsCols.contains),
      s"bloomCols (${bloomCols.mkString(", ")}) must be a subset of " +
        s"statsCols (${statsCols.mkString(", ")}) — the point probe " +
        "composes the bloom with the min/max check")
    // Integral keys only: cast("long") on a string column yields NULL
    // silently, which would build a bloom of one constant hash — never
    // wrong (the predicate re-applies) but never pruning either, the
    // kind of quiet degradation this library refuses loudly. Hash or
    // dictionary-encode string keys to BIGINT first (the dedup-key
    // discipline).
    bloomCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
          dt == org.apache.spark.sql.types.IntegerType ||
          dt == org.apache.spark.sql.types.ShortType,
        s"bloom column '$c' must be integral (got $dt) — the probe " +
          "hashes LONG keys; xxhash64 string keys to BIGINT first")
    }
    val spark = df.sparkSession
    val base = spark.conf.get("spark.sql.warehouse.dir")
    val path = s"$base/$name"
    df.write.mode("overwrite").parquet(path)
    // Optimal sizing: bits = -n ln(p) / ln(2)^2 rounded up to whole words,
    // hashes = bits/n * ln(2) — clamped to the packed aggregate's bounds.
    val rawBits = math.ceil(-expectedItemsPerFile * math.log(bloomFpp) /
      (math.log(2) * math.log(2))).toLong
    val mBits = math.min(1L << 28, math.max(64L, ((rawBits + 63) / 64) * 64)).toInt
    val kHashes = math.max(1L, math.min(16L,
      math.round(mBits.toDouble / expectedItemsPerFile * math.log(2)))).toInt
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } ++ bloomCols.flatMap { c =>
      // cast-to-long before hashing: xxhash64 is physical-type sensitive,
      // and the probe side hashes a Long literal — an int32 column would
      // otherwise silently never match.
      val key = org.apache.spark.sql.graft.compat.expression(
        col(c).cast("long"))
      val positions = array((0 until kHashes).map { salt =>
        pmod(org.apache.spark.sql.graft.compat.column(
          org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(key), 42L + salt)), lit(mBits.toLong))
      }: _*)
      Seq(graft.functions.BloomKernels.bloom_words(positions, mBits)
          .as(s"bloom_$c"),
        max(lit(kHashes)).as(s"bloomk_$c"))
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

  /** The file list a point lookup `col == key` must open, per the
    * manifest: min/max intersection AND — when the manifest carries a
    * `bloom_<col>` sidecar — the per-file bloom's might-contain verdict,
    * evaluated INSIDE the manifest scan
    * ([[graft.functions.BloomKernels.bloom_words_contain]] replaying the
    * writer's `xxhash64(key, 42+salt) mod mBits` probes against each row's
    * packed bitset; file-count rows, bitsets never collected to the
    * driver). `None` = the manifest is absent/mid-swap/torn — callers fall
    * back to the unpruned scan. Zero false negatives by construction:
    * blooms only ever say "maybe" for inserted keys, so a file actually
    * holding `key` always survives; the equality predicate re-applies on
    * the scan regardless. `private[graft]` so specs and probes can pin the
    * files-opened count — the metric the bloom exists to shrink.
    */
  private[graft] def pointLookupFiles(spark: SparkSession, path: String,
      statsCol: String, key: Long): Option[Seq[String]] = {
    val mPath = manifestPath(path)
    try {
      val m = spark.read.parquet(mPath)
      val ranged = m.filter(
        col(s"max_$statsCol") >= key && col(s"min_$statsCol") <= key)
      val fields = m.schema.fieldNames
      val probed =
        if (!fields.contains(s"bloom_$statsCol") ||
            !fields.contains(s"bloomk_$statsCol")) ranged
        else ranged.filter(graft.functions.BloomKernels.bloom_words_contain(
          col(s"bloom_$statsCol"), lit(key), col(s"bloomk_$statsCol")))
      Some(probed.select("file").collect().map(_.getString(0)).toIndexedSeq)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Point lookup `col == key` opening only the files the manifest (and
    * its bloom sidecar, when present) cannot rule out — the b14 read.
    * Same exactness contract as [[readPruned]]: the equality predicate
    * re-applies on the scan, a missing/torn manifest degrades to the
    * unpruned exact scan, an empty survivor list short-circuits with
    * the table's schema.
    */
  def readPrunedPoint(spark: SparkSession, path: String,
      statsCol: String, key: Long): DataFrame = {
    val predicate: Column = col(statsCol) === key
    pointLookupFiles(spark, path, statsCol, key) match {
      case None => spark.read.parquet(path).filter(predicate)
      case Some(keep) if keep.isEmpty =>
        spark.read.parquet(path).filter(predicate).limit(0)
      case Some(keep) =>
        spark.read.parquet(keep: _*).filter(predicate)
    }
  }

  /** Batch limit for [[readPrunedPoints]]. Beyond this the right plan is
    * a different shape entirely (semi-join the key frame against the
    * table), not a longer literal list — loud, like every driver-bounded
    * guard in this library.
    */
  val maxPointLookupKeys: Int = 1 << 16

  /** The file union a BATCH of point lookups `col IN keys` must open —
    * the form that actually scales: a single point probe pays one full
    * manifest scan (bloom bytes = files x mBits — at 10^5 files the
    * bitsets ARE the manifest), so per-key manifest cost only amortizes
    * when many keys share one pass. This is also the real workload shape:
    * tombstone checks and dedup-key probes arrive in batches, not one id
    * at a time (the st23b driver-known-batch discipline).
    *
    * One row per file throughout: each file's verdict is an `exists` over
    * the key-array literal — range check + bloom probe per key — so the
    * bitset is read IN PLACE per file (an explode would copy the mBits/8
    * bytes once per (file, key) pair). File pruning bites when
    * |keys| ≲ |files| (a 1k-key takedown batch against a 10^5-file table
    * opens ≤ 1% of it); past that the win is the single manifest pass.
    */
  private[graft] def pointLookupFilesMulti(spark: SparkSession, path: String,
      statsCol: String, keys: Seq[Long]): Option[Seq[String]] = {
    val distinctKeys = keys.distinct
    require(distinctKeys.size <= maxPointLookupKeys,
      s"point-lookup batch of ${distinctKeys.size} keys exceeds " +
        s"$maxPointLookupKeys — at that size semi-join the key frame " +
        "against the table instead of literal-probing the manifest")
    if (distinctKeys.isEmpty) return Some(Nil)
    val mPath = manifestPath(path)
    try {
      val m = spark.read.parquet(mPath)
      val fields = m.schema.fieldNames
      val hasBloom = fields.contains(s"bloom_$statsCol") &&
        fields.contains(s"bloomk_$statsCol")
      val ks = array(distinctKeys.map(lit): _*)
      val anyKeyMaybe = exists(ks, k => {
        val ranged = col(s"max_$statsCol") >= k && col(s"min_$statsCol") <= k
        if (hasBloom)
          ranged && graft.functions.BloomKernels.bloom_words_contain(
            col(s"bloom_$statsCol"), k, col(s"bloomk_$statsCol"))
        else ranged
      })
      Some(m.filter(anyKeyMaybe)
        .select("file").collect().map(_.getString(0)).toIndexedSeq)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Batched point lookup `col IN keys` opening only the files the
    * manifest (and bloom sidecars) cannot rule out for ANY key — the b14b
    * read. Same exactness contract as [[readPrunedPoint]]: the IN
    * predicate re-applies on the scan, a missing/torn manifest degrades
    * to the unpruned exact scan, an empty survivor list (or empty key
    * batch) short-circuits with the table's schema.
    */
  def readPrunedPoints(spark: SparkSession, path: String,
      statsCol: String, keys: Seq[Long]): DataFrame = {
    val predicate: Column = col(statsCol).isin(keys.distinct: _*)
    pointLookupFilesMulti(spark, path, statsCol, keys) match {
      case None => spark.read.parquet(path).filter(predicate)
      case Some(keep) if keep.isEmpty =>
        spark.read.parquet(path).filter(predicate).limit(0)
      case Some(keep) =>
        spark.read.parquet(keep: _*).filter(predicate)
    }
  }
}
