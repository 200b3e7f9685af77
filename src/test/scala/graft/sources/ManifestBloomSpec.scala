package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** b14: per-file bloom sidecars prune id-keyed POINT lookups that min/max
  * skipping cannot touch. The adversarial layout is hash placement on the
  * lookup key: every file's [min, max] then spans ~the whole key domain,
  * so the range check keeps ALL files — exactly the tombstone-check /
  * dedup-key-probe shape. The bloom must (a) actually shrink the opened
  * file set there, and (b) never lose a row — blooms have no false
  * negatives, and the equality predicate re-applies on the scan.
  */
class ManifestBloomSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // 1000 distinct keys hash-placed into 16 files: each key lives in
  // EXACTLY one file, while each file's min/max spans ~the whole domain.
  private def writeHashPlaced(name: String): String = {
    val df = spark.range(1000L).select(col("id").as("k"),
      (col("id") * 7L).as("payload")).repartition(16, col("k"))
    ManifestTables.writeWithManifest(df, name, Seq("k"),
      bloomCols = Seq("k"), expectedItemsPerFile = 1L << 12)
  }

  test("point lookup: bloom prunes where min/max keeps every file") {
    val path = writeHashPlaced("bloom_spec_hash")
    val key = 417L
    // Range-only verdict from the same manifest: hash placement makes the
    // min/max check useless — it must keep (nearly) all 16 files. This is
    // the gap the bloom exists to close.
    val m = spark.read.parquet(s"${path}__manifest")
    val total = m.count()
    assert(total == 16, s"expected 16 manifest rows, got $total")
    val rangeKept = m.filter(col("max_k") >= key && col("min_k") <= key).count()
    assert(rangeKept >= 14,
      s"layout not adversarial: min/max already pruned to $rangeKept of 16")
    // Bloom verdict: the key lives in exactly one file; fpp 1% over 16
    // files adds < 1 expected straggler. Pin a strict-subset bound.
    val kept = ManifestTables.pointLookupFiles(spark, path, "k", key).get
    assert(kept.nonEmpty && kept.size <= 3,
      s"bloom kept ${kept.size} of 16 files (want 1..3)")
    val pruned = ManifestTables.readPrunedPoint(spark, path, "k", key)
    assert(pruned.inputFiles.length == kept.size, "scan opened extra files")
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((417L, 2919L)))
  }

  test("zero false negatives: every key's pruned read equals plain filter") {
    val path = writeHashPlaced("bloom_spec_sweep")
    val all = spark.read.parquet(path).cache()
    try {
      // Sweep a stride of present keys plus absent ones beyond the domain:
      // the pruned read must match the plain equality filter row-for-row.
      ((0L until 1000L by 37L) ++ Seq(-5L, 1000L, 99999L)).foreach { key =>
        val want = all.filter(col("k") === key)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = ManifestTables.readPrunedPoint(spark, path, "k", key)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"key $key: pruned $got != plain $want")
      }
    } finally all.unpersist()
  }

  test("absent key short-circuits empty with schema; absent manifest and " +
      "bloom-less manifest both degrade to the exact unpruned scan") {
    val path = writeHashPlaced("bloom_spec_fallback")
    // Key outside the domain: min/max rules out every file -> empty frame,
    // schema intact.
    val none = ManifestTables.readPrunedPoint(spark, path, "k", 5000L)
    assert(none.columns.toSeq == Seq("k", "payload") && none.count() == 0)
    // A manifest WITHOUT the bloom sidecar still answers point lookups
    // (range check only — correct, just unpruned under hash placement).
    val plainPath = ManifestTables.writeWithManifest(
      spark.range(100L).select(col("id").as("k"), col("id").as("payload"))
        .repartition(4, col("k")),
      "bloom_spec_nobloom", Seq("k"))
    val viaRange = ManifestTables.readPrunedPoint(spark, plainPath, "k", 42L)
    assert(viaRange.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // Manifest gone entirely: pointLookupFiles reports None and the read
    // falls back to the unpruned exact scan.
    val conf = spark.sparkContext.hadoopConfiguration
    val mp = new org.apache.hadoop.fs.Path(s"${path}__manifest")
    mp.getFileSystem(conf).delete(mp, true)
    assert(ManifestTables.pointLookupFiles(spark, path, "k", 417L).isEmpty)
    val fallback = ManifestTables.readPrunedPoint(spark, path, "k", 417L)
    assert(fallback.collect().map(_.getLong(0)).toSeq == Seq(417L))
  }

  test("batched lookup: one manifest pass, file union pruned, rows equal " +
      "the plain IN filter; duplicates collapse; empty batch short-circuits") {
    val path = writeHashPlaced("bloom_spec_batch")
    // 4 keys (one duplicated) living in <= 4 of 16 files: the batched
    // probe's file union must stay a strict subset, and the read must
    // equal the plain IN filter exactly.
    val keys = Seq(11L, 222L, 333L, 222L, 944L)
    val kept = ManifestTables.pointLookupFilesMulti(spark, path, "k", keys).get
    assert(kept.nonEmpty && kept.size <= 7,
      s"batched bloom kept ${kept.size} of 16 files (want <= 7)")
    val got = ManifestTables.readPrunedPoints(spark, path, "k", keys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.read.parquet(path)
      .filter(col("k").isin(keys.distinct: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.size == 4, s"batched read $got != plain $want")
    // Empty batch: empty frame, schema intact, no manifest dependency.
    val none = ManifestTables.readPrunedPoints(spark, path, "k", Nil)
    assert(none.columns.toSeq == Seq("k", "payload") && none.count() == 0)
    // All-absent batch: min/max rules everything out.
    val absent = ManifestTables.readPrunedPoints(spark, path, "k",
      Seq(5000L, 6000L))
    assert(absent.count() == 0)
  }

  test("batched lookup beyond the key guard is rejected loudly") {
    val path = writeHashPlaced("bloom_spec_guard")
    val e = intercept[IllegalArgumentException] {
      ManifestTables.pointLookupFilesMulti(spark, path, "k",
        0L.to(ManifestTables.maxPointLookupKeys.toLong))
    }
    assert(e.getMessage.contains("semi-join"))
  }

  test("bloomCols outside statsCols is rejected loudly") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      ManifestTables.writeWithManifest(df, "bloom_spec_reject", Seq("a"),
        bloomCols = Seq("b"))
    }
    assert(e.getMessage.contains("subset"))
  }

  test("a non-integral bloom column is rejected loudly (a string key " +
      "would cast to NULL and build a never-pruning bloom silently)") {
    val df = Seq((1L, "x")).toDF("a", "s")
    val e = intercept[IllegalArgumentException] {
      ManifestTables.writeWithManifest(df, "bloom_spec_strkey",
        Seq("a", "s"), bloomCols = Seq("s"))
    }
    assert(e.getMessage.contains("integral"))
  }
}
