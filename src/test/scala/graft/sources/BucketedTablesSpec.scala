package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame

class BucketedTablesSpec extends AnyFunSuite with SparkTestHarness {

  private def edges = {
    import spark.implicits._
    (1L to 2000L).map(i => (i % 97, i % 89)).toDF("src", "dst")
  }

  test("saveGraph/loadGraph round-trips vertices and edges exactly") {
    val g = GraphFrame.fromEdges(edges)
    BucketedTables.saveGraph(g, "rt_graph", 4)
    val loaded = BucketedTables.loadGraph(spark, "rt_graph")
    assert(loaded.edges.exceptAll(g.edges).isEmpty &&
      g.edges.exceptAll(loaded.edges).isEmpty)
    assert(loaded.vertices.exceptAll(g.vertices).isEmpty &&
      g.vertices.exceptAll(loaded.vertices).isEmpty)
  }

  test("bucketed scan feeds groupBy on the bucket key with zero exchanges") {
    BucketedTables.writeBucketed(edges, "bk_edges", 4, Seq("src"))
    val agg = BucketedTables.readBucketed(spark, "bk_edges")
      .groupBy("src").agg(count(lit(1)).as("deg"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
    assert(agg.count() == edges.select("src").distinct().count())
  }

  test("two same-bucketed tables sort-merge join with no exchange and no sort") {
    BucketedTables.writeBucketed(edges, "bk_a", 4, Seq("src"))
    BucketedTables.writeBucketed(
      edges.select(col("src"), (col("dst") + 1).as("dst")), "bk_b", 4, Seq("src"))
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = BucketedTables.readBucketed(spark, "bk_a")
      val b = BucketedTables.readBucketed(spark, "bk_b").withColumnRenamed("dst", "dst2")
      val j = a.join(b, "src")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
      // One file per bucket (the writeBucketed repartition) + sortBy =>
      // the per-file order satisfies the SMJ requirement on both sides.
      val sorts = plan.linesIterator.count(_.contains("Sort ["))
      assert(sorts == 0, s"expected 0 SortExec, got $sorts in:\n$plan")
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
