package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class ZOrderedTablesSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  test("scale is monotone, bounded, and matches integer division exactly") {
    val mn = 17L
    val mx = 4096L * 3 + 17
    val got = spark.range(mn, mx + 1).toDF("v")
      .select(col("v"), ZOrderedTables.scale(col("v"), mn, mx, 10).as("s"))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (v, s) =>
      val exact = ((v - mn) << 10) / (mx - mn + 1)
      assert(s == exact, s"scale($v) = $s, want $exact")
      assert(s >= 0 && s < 1024)
    }
    assert(got.map(_._2).sliding(2).forall(p => p(0) <= p(1)), "not monotone")
  }

  test("zValue interleaves bits: bit i of column ci lands at i*d + ci") {
    // (x=0b101, y=0b011, bits=3) -> z bits: x at even, y at odd positions
    // z = x0 + y0*2 + x1*4 + y1*8 + x2*16 + y2*32 = 1 + 2 + 0 + 8 + 16 + 0
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrderedTables.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .head().getLong(0)
    assert(z == 27L, s"interleave(5, 3) = $z, want 27")
  }

  test("z-clustered files have tight per-file spans on BOTH natural columns") {
    // 64x64 uniform grid, 16 files: perfect z-clustering gives each file a
    // contiguous z-range = a small set of quadtree cells, so each natural
    // column spans ~1/4 of its domain per file (vs ~1 for a random layout).
    val df = spark.range(64L * 64L)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y", "id AS payload")
    val path = ZOrderedTables.writeZOrdered(df, "zorder_spec_grid",
      Seq(("x", 0L, 63L), ("y", 0L, 63L)), bits = 6, numFiles = 16)
    val spans = ZOrderedTables.readZOrdered(spark, path)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length == 16, s"expected 16 files, got ${spans.length}")
    val avgSx = spans.map(_.getLong(1)).sum.toDouble / spans.length
    val avgSy = spans.map(_.getLong(2)).sum.toDouble / spans.length
    // An unclustered layout averages ~63 span per file on both axes; the
    // z-layout must cut both to at most half the domain on average.
    assert(avgSx <= 32 && avgSy <= 32,
      s"weak clustering: avg x-span $avgSx, avg y-span $avgSy (domain 63)")
  }

  test("manifest pruning: narrow range opens a strict file subset, same rows") {
    val df = spark.range(64L * 64L)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y", "id AS payload")
    val clustered = df.repartitionByRange(16,
        ZOrderedTables.zValue(Seq(col("x"), col("y")), 6))
      .sortWithinPartitions(ZOrderedTables.zValue(Seq(col("x"), col("y")), 6))
    val path = ManifestTables.writeWithManifest(clustered, "manifest_spec_grid",
      Seq("x", "y"))
    val pruned = ManifestTables.readPruned(spark, path, "x", 0L, 7L)
    val all = spark.read.parquet(path)
    assert(pruned.inputFiles.length < all.inputFiles.length,
      s"no files pruned: ${pruned.inputFiles.length} of ${all.inputFiles.length}")
    val want = all.filter(col("x") <= 7).collect().map(_.getLong(2)).toSet
    val got = pruned.collect().map(_.getLong(2)).toSet
    assert(got == want, "pruned read lost or gained rows")
    // Empty-range short circuit keeps the schema and returns nothing.
    val empty = ManifestTables.readPruned(spark, path, "x", 1000L, 2000L)
    assert(empty.columns.toSeq == all.columns.toSeq && empty.count() == 0)
  }

  test("zValue equals a pure-Scala Morton reference on a value sweep") {
    // (The SQL replay itself is exercised end-to-end by the b04 gate,
    // where DuckDB executes zValueSql against this plan's output.)
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val got = spark.range(0, 1024).selectExpr("id % 32 AS x", "id DIV 32 AS y")
      .select(col("x"), col("y"),
        ZOrderedTables.zValue(Seq(col("x"), col("y")), 5).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 5))
    }
  }
}
