package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-19 operator specs: the snapshot re-pin hardened against the
  * r18-ADVICE finding — a FAILING re-pin (the new file set does not
  * validate) must leave the previous snapshot and its retained files
  * intact, so a nightly re-pin cadence never loses its last good
  * snapshot to one bad run.
  */
class Round19OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._
  import graft.sources.BucketedTables

  private def gen(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("id").as[Long].collect().sorted.toSeq

  private def locOf(table: String) = new org.apache.hadoop.fs.Path(
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location)

  test("a FAILING re-pin leaves the old snapshot intact: validation " +
      "(flat layout) runs BEFORE the old same-tag pin is expired") {
    BucketedTables.writeBucketed(gen(1, 8), "r19_repin", 2, Seq("id"))
    BucketedTables.snapshot(spark, "r19_repin", "nightly")
    BucketedTables.appendBucketed(gen(9, 12), "r19_repin")
    // Compaction moves the old pin's files to the retained dir — the
    // state in which expiring the pin is destructive.
    BucketedTables.compactTable(spark, "r19_repin")
    val loc = locOf("r19_repin")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retained = new org.apache.hadoop.fs.Path(
      loc.getParent, "r19_repin__retained")
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty)
    // Break the NEW pin's validation: a subdirectory under the table
    // location fails the flat-layout check.
    val subdir = new org.apache.hadoop.fs.Path(loc, "stray_partition")
    fs.mkdirs(subdir)
    try {
      val e = intercept[IllegalArgumentException] {
        BucketedTables.snapshot(spark, "r19_repin", "nightly")
      }
      assert(e.getMessage.contains("subdirectories"))
    } finally fs.delete(subdir, true)
    // The old pin survived the failed re-pin: manifest still present,
    // retained files not GCed, pinned read still returns the frozen rows.
    assert(fs.exists(retained) && fs.listStatus(retained).nonEmpty,
      "failed re-pin must not GC the old pin's retained files")
    assert(ids(BucketedTables.readSnapshot(spark, "r19_repin", "nightly")) ==
      (1L to 8L), "the last good snapshot must still read after a bad re-pin")
    // And the cadence recovers: the next (valid) re-pin works as before.
    BucketedTables.snapshot(spark, "r19_repin", "nightly")
    assert(!fs.exists(retained))
    assert(ids(BucketedTables.readSnapshot(spark, "r19_repin", "nightly")) ==
      (1L to 12L))
    BucketedTables.expireSnapshot(spark, "r19_repin", "nightly")
  }
}
