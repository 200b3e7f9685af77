package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.graph.GraphFrame

/** Loads the LDBC Graphalytics golden datasets shipped in
  * `src/test/resources/ldbc/` (space-delimited headerless CSV, per the
  * reference's `testing_utils.rs:45-85`).
  */
object LdbcLoader {
  private def resourceDir(ds: String): String =
    getClass.getResource(s"/ldbc/$ds").getPath

  def graph(spark: SparkSession, ds: String): GraphFrame = {
    val dir = resourceDir(ds)
    val vertices = spark.read
      .option("delimiter", " ")
      .schema(StructType(Seq(StructField("id", LongType, false))))
      .csv(s"$dir/$ds.v.csv")
    val edges = spark.read
      .option("delimiter", " ")
      .schema(StructType(Seq(
        StructField("src", LongType, false), StructField("dst", LongType, false))))
      .csv(s"$dir/$ds.e.csv")
    GraphFrame(vertices, edges)
  }

  /** `<ds>-<SUFFIX>.csv` golden file: `[id, expected]` (expected as string,
    * cast by the caller).
    */
  def golden(spark: SparkSession, ds: String, suffix: String): DataFrame = {
    val dir = resourceDir(ds)
    spark.read
      .option("delimiter", " ")
      .schema(StructType(Seq(
        StructField("id", LongType, false), StructField("expected", StringType, false))))
      .csv(s"$dir/$ds-$suffix.csv")
  }
}
