package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-18 operator specs: the snapshot lifecycle hardened against the
  * r17-ADVICE findings — full rewrites retain pins (b13), retention is
  * pre-flighted so a stale manifest aborts with the table intact,
  * same-tag re-pins expire the old pin (no retained-file leak), and the
  * `__snap` marker is reserved so manifest ownership is exact.
  */
class Round18OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._
  import graft.sources.BucketedTables

  private def gen(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("id").as[Long].collect().sorted.toSeq

  private def locOf(table: String) = new org.apache.hadoop.fs.Path(
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location)

  private def fs = locOf("r18_rw").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("writeBucketed full rewrite retains pinned files: the snapshot " +
      "survives a complete content replacement; expireSnapshot GCs it") {
    BucketedTables.writeBucketed(gen(1, 8), "r18_rw", 2, Seq("id"))
    BucketedTables.snapshot(spark, "r18_rw", "frozen")
    // Full rewrite with DISJOINT content — the op that used to orphan
    // the pin.
    BucketedTables.writeBucketed(gen(100, 105), "r18_rw", 2, Seq("id"))
    assert(ids(spark.table("r18_rw")) == (100L to 105L))
    assert(ids(BucketedTables.readSnapshot(spark, "r18_rw", "frozen")) ==
      (1L to 8L), "pinned read must see the pre-rewrite rows")
    val retained = new org.apache.hadoop.fs.Path(
      locOf("r18_rw").getParent, "r18_rw__retained")
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty)
    BucketedTables.expireSnapshot(spark, "r18_rw", "frozen")
    assert(!fs.exists(retained), "GC must reclaim the rewrite's retained files")
    assert(ids(spark.table("r18_rw")) == (100L to 105L))
  }

  test("re-pinning an existing tag expires the old pin first: retained " +
      "files from the old pin are GCed, not orphaned") {
    BucketedTables.writeBucketed(gen(1, 8), "r18_repin", 2, Seq("id"))
    BucketedTables.snapshot(spark, "r18_repin", "nightly")
    BucketedTables.appendBucketed(gen(9, 12), "r18_repin")
    // Compaction moves the old pin's files to the retained dir.
    BucketedTables.compactTable(spark, "r18_repin")
    val retained = new org.apache.hadoop.fs.Path(
      locOf("r18_repin").getParent, "r18_repin__retained")
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty)
    // The nightly cadence re-pins the SAME tag: the old manifest's
    // retained-only files must be reclaimed (a plain overwrite would
    // orphan them forever — the r17-ADVICE leak).
    BucketedTables.snapshot(spark, "r18_repin", "nightly")
    assert(!fs.exists(retained),
      "old pin's retained files must be GCed on re-pin")
    assert(ids(BucketedTables.readSnapshot(spark, "r18_repin", "nightly")) ==
      (1L to 12L), "the re-pin freezes the CURRENT content")
    BucketedTables.expireSnapshot(spark, "r18_repin", "nightly")
  }

  test("retention pre-flight: a stale manifest aborts compaction BEFORE " +
      "any file moves — the live table stays complete") {
    BucketedTables.writeBucketed(gen(1, 8), "r18_stale", 2, Seq("id"))
    // Craft a stale manifest: one real in-location path plus one that
    // does not exist (the pre-retention-era shape the ADVICE medium
    // finding arms).
    val loc = locOf("r18_stale")
    val real = fs.listStatus(loc).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString).head
    BucketedTables.replaceSidecar(
      Seq(real, s"$loc/part-00000-gone.parquet").toDF("path"),
      "r18_stale__snap_old")
    val e = intercept[IllegalArgumentException] {
      BucketedTables.compactTable(spark, "r18_stale")
    }
    assert(e.getMessage.contains("does not exist"))
    // NOTHING moved: every pre-compaction row still scans, including the
    // one the stale manifest also pinned.
    assert(ids(spark.table("r18_stale")) == (1L to 8L),
      "abort must leave the table untouched")
    assert(fs.exists(new org.apache.hadoop.fs.Path(real)))
    // Expiring the stale tag unblocks the compaction.
    BucketedTables.expireSnapshot(spark, "r18_stale", "old")
    BucketedTables.compactTable(spark, "r18_stale")
    assert(ids(spark.table("r18_stale")) == (1L to 8L))
  }

  test("incremental triangle counts == full recompute on random graphs " +
      "across delta fractions; base-duplicate/loop/multi delta edges are no-ops") {
    import graft.graph.GraphFrame
    val rnd = new scala.util.Random(18)
    for (trial <- 1 to 6) {
      val n = 20 + rnd.nextInt(20)
      val m = 60 + rnd.nextInt(120)
      val all = (1 to m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.toDF("src", "dst")
      val frac = 2 + rnd.nextInt(5)
      val isDelta = pmod(col("src") + col("dst") * 7, lit(frac)) === 0
      val base = all.filter(!isDelta)
      val delta = all.filter(isDelta)
        // Adversarial additions: a base-duplicate (reversed), a
        // self-loop, and a within-delta duplicate — all must be no-ops.
        .unionByName(base.limit(1).select(col("dst").as("src"),
          col("src").as("dst")))
        .unionByName(Seq((5L, 5L)).toDF("src", "dst"))
        .unionByName(delta0Dup(all, isDelta))
      val vertices = all.select(col("src").as("id"))
        .unionByName(all.select(col("dst").as("id"))).distinct()
      val full = GraphFrame(vertices, all).triangleCount.run()
      val prev = GraphFrame(vertices, base).triangleCount.run()
      // Alternate cold (self-built adjacency) and warm (caller-provided
      // materialized adjacency — the persisted-graph cadence) paths.
      val inc =
        if (trial % 2 == 0) graft.algorithms.TriangleCount.incremental(
          prev, base, delta)
        else graft.algorithms.TriangleCount.incremental(prev, base, delta,
          Some(graft.graph.GraphFrame.symmetrizeEdges(base,
            doDistinct = true)))
      val d1 = inc.exceptAll(full).count()
      val d2 = full.exceptAll(inc).count()
      assert(d1 == 0 && d2 == 0,
        s"trial $trial (n=$n m=$m frac=$frac): inc vs full diverge " +
          s"($d1/$d2 rows)")
    }
  }

  private def delta0Dup(all: org.apache.spark.sql.DataFrame,
      isDelta: org.apache.spark.sql.Column) =
    all.filter(isDelta).limit(1)

  test("the __snap marker is reserved: base names and tags that would " +
      "break manifest ownership fail loud") {
    val df = gen(1, 4)
    val e1 = intercept[IllegalArgumentException] {
      BucketedTables.writeBucketed(df, "r18__snap_evil", 2, Seq("id"))
    }
    assert(e1.getMessage.contains("__snap"))
    BucketedTables.writeBucketed(df, "r18_guard", 2, Seq("id"))
    val e2 = intercept[IllegalArgumentException] {
      BucketedTables.snapshot(spark, "r18_guard", "a__snap_b")
    }
    assert(e2.getMessage.contains("__snap"))
    val e3 = intercept[IllegalArgumentException] {
      BucketedTables.snapshot(spark, "r18_guard", "")
    }
    assert(e3.getMessage.contains("non-empty"))
  }
}
