package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Ports the reference GraphFrame tests (`src/lib.rs:381-595`): 10-vertex hub
  * graph degrees, triplets struct schema, symmetrize, id type validation.
  */
class GraphFrameSpec extends AnyFunSuite with SparkTestHarness {

  def hubGraph: GraphFrame = {
    val s = spark
    import s.implicits._
    val vertices = Seq(
      (1L, "Hub"), (2L, "Alice"), (3L, "Bob"), (4L, "Carol"), (5L, "David"),
      (6L, "Eve"), (7L, "Frank"), (8L, "Grace"), (9L, "Henry"), (10L, "Ivy")
    ).toDF("id", "name")
    val src = Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5,
      5, 5, 6, 6, 7, 7, 8, 8, 9, 10).map(_.toLong)
    val dst = Seq(2, 3, 4, 5, 6, 7, 8, 9, 10, 3, 4, 5, 6, 4, 5, 6, 5, 6, 7, 6,
      7, 8, 7, 8, 8, 9, 9, 10, 10, 1).map(_.toLong)
    val edges = src.zip(dst).toDF("src", "dst")
    GraphFrame(vertices, edges)
  }

  private def toMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("num nodes / edges") {
    assert(hubGraph.numNodes === 10L)
    assert(hubGraph.numEdges === 30L)
  }

  test("in degrees match the reference expectations") {
    assert(toMap(hubGraph.inDegrees) === Map(
      1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L,
      7L -> 4L, 8L -> 4L, 9L -> 3L, 10L -> 3L))
  }

  test("out degrees match the reference expectations") {
    assert(toMap(hubGraph.outDegrees) === Map(
      1L -> 9L, 2L -> 4L, 3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 2L,
      7L -> 2L, 8L -> 2L, 9L -> 1L, 10L -> 1L))
  }

  test("symmetrize doubles the edge count and preserves attributes") {
    val s = spark
    import s.implicits._
    val g = GraphFrame(
      Seq(Tuple1(1L), Tuple1(2L)).toDF("id"),
      Seq((1L, 2L, 0.5, "x")).toDF("src", "dst", "weight", "label"))
    val sym = g.symmetrize
    assert(sym.edges.columns.toSeq === Seq("src", "dst", "weight", "label"))
    val rows = sym.edges.orderBy("src").collect()
    assert(rows.length === 2)
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSeq ===
      Seq((1L, 2L, 0.5, "x"), (2L, 1L, 0.5, "x")))
  }

  test("triplets pack full rows into structs (3-triangle with attrs)") {
    val s = spark
    import s.implicits._
    val g = GraphFrame(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"),
      Seq((1L, 3L, "d"), (2L, 1L, "j"), (3L, 2L, "h")).toDF("src", "dst", "attr"))
    val t = g.triplets
    assert(t.columns.toSeq === Seq("src_vertex", "edge", "dst_vertex"))
    val vSchema = StructType(Seq(
      StructField("id", LongType, false), StructField("attr", StringType, true)))
    assert(t.schema("src_vertex").dataType.asInstanceOf[StructType].fieldNames.toSeq ===
      vSchema.fieldNames.toSeq)
    val row = t.filter(col("edge.src") === 1L).collect().head
    assert(row.getStruct(0).getLong(0) === 1L)
    assert(row.getStruct(0).getString(1) === "a")
    assert(row.getStruct(1).getString(2) === "d")
    assert(row.getStruct(2).getLong(0) === 3L)
    assert(row.getStruct(2).getString(1) === "c")
    assert(t.count() === 3L)
  }

  test("degrees on the symmetrized simple graph") {
    val s = spark
    import s.implicits._
    // 1-2, 2-3 plus a self-loop 3-3 (dropped) and a duplicate 1->2
    val g = GraphFrame(
      Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("id"),
      Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 3L)).toDF("src", "dst"))
    assert(toMap(g.degrees) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("id type validation rejects non-Long ids") {
    val s = spark
    import s.implicits._
    val badVertices = Seq(Tuple1(1)).toDF("id") // IntegerType
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      GraphFrame(badVertices, edges)
    }
    assert(e.getMessage.contains("Int64"))
    intercept[IllegalArgumentException] {
      GraphFrame(Seq(Tuple1(1L)).toDF("id"), Seq(("a", "b")).toDF("src", "dst"))
    }
  }

  test("missing mandatory columns are rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      GraphFrame(Seq(Tuple1(1L)).toDF("vertex"), Seq((1L, 2L)).toDF("src", "dst"))
    }
  }

  test("filterVertices keeps only edges with both endpoints surviving") {
    val g = hubGraph.filterVertices(col("id") =!= 1L)
    assert(g.vertices.count() === 9L)
    // 10 edges touch vertex 1 (9 out + 1 in)
    assert(g.edges.count() === 20L)
  }

  test("aggregateMessages: both directions, null messages dropped") {
    val s = spark
    import s.implicits._
    // path 1 -> 2 -> 3
    val g = GraphFrame.fromEdges(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val r = g.aggregateMessages(
      sendToDst = Some(col("src_vertex.id")),
      sendToSrc = Some(col("dst_vertex.id")),
      sum(col("msg")).as("m"), count(lit(1)).as("c"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // vertex 1 gets dst-id 2; vertex 2 gets src-id 1 + dst-id 3; vertex 3 gets src-id 2
    assert(r == Map(1L -> ((2L, 1L)), 2L -> ((4L, 2L)), 3L -> ((2L, 1L))))
    // one-directional + NULL messages dropped: only dst 2 of edge (1,2) receives
    val oneWay = g.aggregateMessages(
      sendToDst = Some(when(col("src_vertex.id") === 1L, col("src_vertex.id"))),
      sendToSrc = None,
      count(lit(1)).as("c"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(oneWay == Map(2L -> 1L))
  }
}
