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
  private[graft] def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Save `df` as parquet table `table`, bucketed AND per-file-sorted by
    * `keys`. Overwrites any existing table of the same name; live
    * snapshots of the replaced table SURVIVE the rewrite — their pinned
    * files move to the retained directory first (the [[compactTable]]
    * retention discipline, extended to the full-rewrite path: until
    * round 18 a rewrite silently orphaned every pin, the one maintenance
    * op that killed a training job's frozen read — the b13 gate).
    * `table` must not contain the `__snap` marker (see [[snapshotTags]]).
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "at least one bucket key")
    require(!table.contains("__snap"),
      s"table name '$table' contains the reserved snapshot marker " +
        "'__snap' — it would collide with manifest sidecar names")
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    if (spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
      retainPinnedFiles(spark, table)
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

  /** COMPACT a bucketed table back to one file per bucket. Every
    * `mode(append)` write (e.g. [[graft.operators.Similarity.ivfPqAddToTable]])
    * lands its batch as NEW files inside each bucket — correct, and the
    * only way to avoid rewriting a 10^11-row artifact per delta — but a
    * nightly-ingest cadence accretes files: N appends = N+1 files per
    * bucket, and at scale the small-files problem taxes every scan (file
    * listing, per-file open/footer cost, one task per tiny file) AND
    * forfeits per-bucket sort elision (the planner only reports the
    * per-file sort order when each bucket is ONE file — see
    * [[readBucketed]]). Compaction is the periodic repair: rewrite the
    * table through a STAGING table with the same bucket spec (never
    * read-and-overwrite the same location — the read must finish before
    * the source can be dropped), then swap via catalog rename — the same
    * write-new-version-then-flip-the-pointer discipline every table
    * format (Hive, Iceberg, Delta) uses for rewrites. One shuffle of the
    * full table, amortized over the appends it absorbs; semantics
    * unchanged (the s23 oracle's claim).
    *
    * CRASH WINDOW: the swap is drop-then-rename, two catalog calls — a
    * failure between them leaves `table` absent and the complete
    * rewrite at `<table>__compacting`; recovery is the rename by hand.
    * Real table formats make the flip one atomic pointer write; with a
    * plain file catalog this two-call window is the honest
    * approximation, and the staging write (the long part) is entirely
    * inside the safe region — both tables intact until the drop.
    */
  def compactTable(spark: SparkSession, table: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    import org.apache.spark.sql.functions.col
    // `transform` runs inside the staged rewrite (row filtering — e.g.
    // applying a tombstone log — rides the compaction shuffle for free);
    // it must preserve the bucket/sort columns or the saveAsTable below
    // fails loudly on the missing column.
    val bs = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"table $table has no bucket spec — nothing to compact"))
    val staged = s"${table}__compacting"
    dropWithLocation(spark, staged)
    // Read the fragmented table UNBUCKETED for the rewrite: when the
    // scan advertises the bucket hash-partitioning, the planner elides
    // the repartition exchange and the write degenerates to
    // one-task-per-INPUT-FILE — each output file a byte-copy of an input
    // file, i.e. a compaction that compacts nothing (observed on Spark
    // 4.1: N input files -> N output files with matching sizes). With
    // bucketing disabled for this one plan the exchange always runs and
    // every bucket's rows land in exactly one task = one file.
    val bucketingConf = "spark.sql.sources.bucketing.enabled"
    val saved = spark.conf.get(bucketingConf)
    spark.conf.set(bucketingConf, "false")
    try {
      val w = transform(spark.table(table))
        .repartition(bs.numBuckets, bs.bucketColumnNames.map(col): _*)
        .write.mode("overwrite").format("parquet")
        .bucketBy(bs.numBuckets, bs.bucketColumnNames.head,
          bs.bucketColumnNames.tail: _*)
      (if (bs.sortColumnNames.nonEmpty)
         w.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
       else w).saveAsTable(staged)
    } finally spark.conf.set(bucketingConf, saved)
    // SNAPSHOT RETENTION (b11): the swap below deletes the old files,
    // which until round 17 killed every live snapshot (readSnapshot then
    // failed loud — honest, but it made snapshot + compaction cadences
    // mutually exclusive). Real table formats retain files until
    // snapshot expiry; here the PINNED subset moves to the sibling
    // `<table>__retained` directory (a same-FS rename — metadata-only,
    // no byte copy) and every live manifest rewrites to the new paths
    // BEFORE the drop. Unpinned files die with the drop as before;
    // retained files die at [[expireSnapshot]].
    //
    // CRASH WINDOW (widened from the pre-retention two-call one): a
    // failure between these renames and the swap leaves the catalog
    // pointing `table` at a location MISSING its pinned files — a scan
    // would silently return partial rows. The complete rewrite is
    // intact at `<table>__compacting` the whole time; recovery is the
    // drop + rename by hand (the same recovery the pre-existing swap
    // window documents below). A plain file catalog cannot make the
    // retention + swap one atomic pointer write; this is the honest
    // approximation, with the long work (the staging write) still
    // entirely inside the safe region.
    retainPinnedFiles(spark, table)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$table`")
  }

  /** Tags of the live snapshots of `table` (catalog pattern scan over
    * the `<table>__snap_<tag>` sidecars). Ownership is sound because
    * `__snap` is a RESERVED marker: [[writeBucketed]] and [[snapshot]]
    * reject base names containing it, so any catalog table starting
    * with `<table>__snap_` can only be a manifest this module wrote for
    * `table` — a base name like `a__snap` (whose own snapshots,
    * `a__snap__snap_x`, would prefix-match table `a`'s scan and leak a
    * foreign manifest into `a`'s retention/GC) cannot be created.
    */
  def snapshotTags(spark: SparkSession, table: String): Seq[String] = {
    val prefix = s"${table}__snap_"
    // The CURRENT database, not a hardcoded "default": snapshot()'s
    // saveAsTable lands in the session database, so a hardcoded name
    // would silently no-op retention/GC (and let compaction delete
    // pinned files) whenever the session switched databases.
    spark.sessionState.catalog.listTables(
        spark.sessionState.catalog.getCurrentDatabase, s"$prefix*")
      .map(_.table).filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
  }

  /** The sibling directory retained snapshot files live in — OUTSIDE
    * the table location, so table drops/rewrites can never touch it.
    */
  private def retainedDir(loc: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(loc.getParent, s"${loc.getName}__retained")

  /** Move every file pinned by a live snapshot of `table` out of the
    * table location into the retained directory and rewrite the
    * manifests to match. No-op without live snapshots; a manifest path
    * already outside the location (retained by an earlier compaction)
    * passes through untouched; a pinned path that no longer exists
    * fails LOUD (a pre-retention stale snapshot — expire it instead).
    *
    * The whole move is PRE-FLIGHTED before any rename (the r17-ADVICE
    * medium finding): every in-location pinned path must exist and
    * every destination must be free, checked up front, so a stale
    * manifest aborts while the table is still INTACT — a mid-loop abort
    * would leave the live location missing already-moved files, and
    * subsequent scans would silently return partial rows, the exact
    * failure the rest of the snapshot design exists to prevent.
    */
  private def retainPinnedFiles(spark: SparkSession, table: String): Unit = {
    val tags = snapshotTags(spark, table)
    if (tags.isEmpty) return
    import spark.implicits._
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = tags.map(t => t ->
      spark.table(s"${table}__snap_$t").select("path")
        .collect().map(_.getString(0)).toSeq)
    val inLoc = manifests.flatMap(_._2).distinct
      .map(p => p -> new org.apache.hadoop.fs.Path(p))
      .filter(_._2.getParent.toUri.getPath == loc.toUri.getPath)
    if (inLoc.isEmpty) return
    val dir = retainedDir(loc)
    fs.mkdirs(dir)
    val moves = inLoc.map { case (p, hp) =>
      (p, hp, new org.apache.hadoop.fs.Path(dir, hp.getName))
    }
    // Pre-flight: no rename happens until EVERY move is known performable.
    moves.foreach { case (p, hp, dest) =>
      require(fs.exists(hp),
        s"snapshot retention: pinned file $p does not exist — a " +
          "pre-retention rewrite may have deleted it; expire the stale " +
          "snapshot first (the table has not been touched)")
      require(!fs.exists(dest),
        s"snapshot retention: destination $dest already exists — the " +
          "retained directory holds a same-named file from an earlier " +
          "cadence; expire stale snapshots first (the table has not " +
          "been touched)")
    }
    val moved = moves.map { case (p, hp, dest) =>
      require(fs.rename(hp, dest),
        s"snapshot retention: pinned file $p could not move to $dest")
      p -> dest.toString
    }.toMap
    manifests.foreach { case (t, paths) =>
      if (paths.exists(moved.contains))
        replaceSidecar(paths.map(p => moved.getOrElse(p, p)).toDF("path"),
          s"${table}__snap_$t")
    }
  }

  /** EXPIRE a snapshot — the retention/GC half of the b11 lifecycle:
    * drop the manifest and delete any retained files no OTHER live
    * snapshot of the table still pins. Files under the live table
    * location are never touched (they belong to the table); the
    * retained directory itself is removed once empty.
    */
  def expireSnapshot(spark: SparkSession, table: String,
      tag: String): Unit = {
    val t = s"${table}__snap_$tag"
    require(spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(t)),
      s"table $table has no snapshot tagged '$tag'")
    val mine = spark.table(t).select("path")
      .collect().map(_.getString(0)).toSet
    dropWithLocation(spark, t)
    val still = snapshotTags(spark, table).flatMap(g =>
      spark.table(s"${table}__snap_$g").select("path")
        .collect().map(_.getString(0))).toSet
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = retainedDir(loc)
    (mine -- still).map(new org.apache.hadoop.fs.Path(_))
      .filter(_.getParent.toUri.getPath == dir.toUri.getPath)
      .foreach(p => fs.delete(p, false))
    if (fs.exists(dir) && fs.listStatus(dir).isEmpty)
      fs.delete(dir, false)
  }

  /** Generic bucketed APPEND: land `df` as NEW files under `table`'s own
    * bucket/sort spec — layout contract preserved (pruning and
    * key-aligned planning keep working), nothing existing rewritten.
    * The write tail of
    * [[graft.operators.Similarity.ivfPqAddToTable]], factored out for
    * any bucketed table. Fails loud on a spec-less target: appending
    * into a non-bucketed table would silently forfeit the layout.
    */
  def appendBucketed(df: DataFrame, table: String): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val bs = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"table $table has no bucket spec — not a writeBucketed table"))
    val w = df.repartition(bs.numBuckets, bs.bucketColumnNames.map(col): _*)
      .write.mode("append").format("parquet")
      .bucketBy(bs.numBuckets, bs.bucketColumnNames.head,
        bs.bucketColumnNames.tail: _*)
    (if (bs.sortColumnNames.nonEmpty)
       w.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
     else w).saveAsTable(table)
  }

  /** SNAPSHOT (b10): pin the table's CURRENT data-file set under a tag —
    * time travel for training-run reproducibility: the ingest job keeps
    * appending, but the training job launched at tag time reads exactly
    * the rows that existed then, forever re-runnable. Parquet files are
    * immutable and appends only ADD files, so a snapshot is nothing but
    * a manifest of paths (a tiny sidecar table — the
    * write-new-version-then-pin-the-pointer idea every table format
    * implements, reduced to its essence).
    *
    * LIFETIME: snapshots survive any number of appends, [[compactTable]]
    * rewrites AND [[writeBucketed]] FULL rewrites (every rewrite path
    * moves pinned files to the sibling retained directory and re-points
    * the manifests — the retain-until-expiry discipline real table
    * formats implement; [[expireSnapshot]] is the GC).
    *
    * RE-PINNING an existing tag expires the old pin first: a plain
    * manifest overwrite would permanently orphan any files an earlier
    * compaction had moved to the retained directory for that tag (no
    * live manifest would reference them, so GC could never reclaim
    * them — an unbounded leak under a nightly re-pin cadence).
    */
  def snapshot(spark: SparkSession, table: String, tag: String): Unit = {
    import spark.implicits._
    require(!table.contains("__snap"),
      s"table name '$table' contains the reserved snapshot marker '__snap'")
    require(tag.nonEmpty && !tag.contains("__snap") && !tag.contains("/"),
      s"snapshot tag '$tag' must be non-empty and free of '__snap' and '/'")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(loc)
    // A manifest built from a non-recursive listing of a NON-flat layout
    // (partition subdirectories, committer staging remnants) would pin a
    // partial file set and readSnapshot would return wrong rows QUIETLY
    // — fail loud at snapshot time instead. Bucketed tables write flat
    // by construction; anything else is not a snapshot target.
    val subdirs = entries.filter(s => s.isDirectory &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    require(subdirs.isEmpty,
      s"table $table has subdirectories under its location " +
        s"(${subdirs.map(_.getPath.getName).mkString(", ")}) — " +
        "snapshot pins only a flat file layout")
    val files = entries.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).toSeq
    require(files.nonEmpty, s"table $table has no data files to snapshot")
    // Expire the old same-tag pin only AFTER the new file set validated
    // (flat layout, non-empty): a failing re-pin — the table gained a
    // subdirectory, or has no data files — must leave the previous
    // snapshot and its retained files intact, or a nightly re-pin
    // cadence loses its last good snapshot on the first bad run.
    if (spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${table}__snap_$tag")))
      expireSnapshot(spark, table, tag)
    replaceSidecar(files.toDF("path"), s"${table}__snap_$tag")
  }

  /** Read the rows pinned by [[snapshot]] — a plain parquet scan of the
    * manifest's file list (driver-bounded: file count, not row count;
    * the same cardinality [[dataFileCount]] lists). Bucket-layout
    * planning metadata does NOT travel with a snapshot read — time
    * travel is for reproducing CONTENT; jobs that want the layout read
    * the live table.
    */
  def readSnapshot(spark: SparkSession, table: String,
      tag: String): DataFrame = {
    val paths = spark.table(s"${table}__snap_$tag")
      .select("path").collect().map(_.getString(0))
    spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** Read the rows ADDED between two snapshots (b12 — the incremental-
    * training read): parquet files are immutable and appends only add
    * files, so between two pins of an append-only cadence the ROW delta
    * is exactly the FILE delta — `toTag`'s manifest minus `fromTag`'s,
    * scanned directly. No diff join, no re-read of the base: the cost
    * is the delta's bytes, which is what makes daily incremental
    * training reads affordable against a 100 TB table. The law needs
    * append-only ordering between the pins: a compaction (or any
    * rewrite) between them re-homes rows across files, so
    * `fromTag ⊄ toTag` fails LOUD rather than returning a wrong row
    * delta. Same-tag delta is legally empty.
    */
  def readSnapshotDelta(spark: SparkSession, table: String,
      fromTag: String, toTag: String): DataFrame = {
    def paths(tag: String): Seq[String] =
      spark.table(s"${table}__snap_$tag")
        .select("path").collect().map(_.getString(0)).toIndexedSeq
    val from = paths(fromTag).toSet
    val to = paths(toTag)
    require(from.subsetOf(to.toSet),
      s"snapshots '$fromTag' -> '$toTag' of $table are not append-" +
        "ordered (a compaction or rewrite re-homed rows between the " +
        "pins) — the file-level delta law does not hold; re-baseline " +
        "from the newer snapshot")
    val delta = to.filterNot(from)
    // `to.head` is total: snapshot() refuses to pin an empty file set,
    // so every manifest carries >= 1 path to source the schema from.
    if (delta.isEmpty) spark.read.parquet(to.head).limit(0)
    else spark.read.parquet(delta: _*)
  }

  /** Number of data files under `table`'s location — the quantity
    * compaction exists to bound (underscore-prefixed commit markers
    * excluded). Driver-side listing of ONE directory; diagnostic use
    * (specs, probes), not a per-query operation.
    */
  def dataFileCount(spark: SparkSession, table: String): Int = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).count(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
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
