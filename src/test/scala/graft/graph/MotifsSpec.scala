package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class MotifsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  // 1->2->3->1 triangle, 3->4 tail, 5 isolated-ish (5->6).
  private def g: GraphFrame = GraphFrame(
    Seq((1L, "a1"), (2L, "b2"), (3L, "c3"), (4L, "d4"), (5L, "e5"), (6L, "f6"))
      .toDF("id", "name"),
    Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 1L, 30L), (3L, 4L, 40L), (5L, 6L, 50L))
      .toDF("src", "dst", "w"))

  test("single-edge motif returns vertex structs with attributes") {
    val rows = g.find("(a)-[e]->(b)")
      .select(col("a.id"), col("a.name"), col("e.w"), col("b.id"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(rows == Set((1L, "a1", 10L, 2L), (2L, "b2", 20L, 3L),
      (3L, "c3", 30L, 1L), (3L, "c3", 40L, 4L), (5L, "e5", 50L, 6L)))
  }

  test("2-hop chain joins on the shared vertex variable") {
    val rows = g.find("(a)-[]->(b); (b)-[]->(c)")
      .select(col("a.id"), col("b.id"), col("c.id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 2L, 3L), (2L, 3L, 1L), (2L, 3L, 4L),
      (3L, 1L, 2L)))
  }

  test("triangle motif finds all three rotations") {
    val rows = g.find("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
      .select(col("a.id"), col("b.id"), col("c.id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L)))
  }

  test("negated term excludes closed wedges") {
    // Wedges a->b->c with no closing c... the negation here: no a->c edge.
    // 2->3->4: 2->4 absent -> kept. 1->2->3: 1->3 absent -> kept.
    // 2->3->1: 2->1 absent -> kept. 3->1->2: 3->2 absent -> kept.
    // Add edge 1->3 and the 1->2->3 wedge must disappear.
    val g2 = GraphFrame(g.vertices,
      g.edges.unionByName(Seq((1L, 3L, 99L)).toDF("src", "dst", "w")))
    val rows = g2.find("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
      .select(col("a.id"), col("b.id"), col("c.id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(!rows.contains((1L, 2L, 3L)))
    assert(rows.contains((2L, 3L, 4L)) && rows.contains((3L, 1L, 2L)))
    // 1->3->4 now exists as a wedge (1->4 absent): kept.
    assert(rows.contains((1L, 3L, 4L)))
  }

  test("anonymous vertices and edges are matched but not returned") {
    val df = g.find("(a)-[]->()")
    assert(df.columns.toSeq == Seq("a"))
    // out-degree expansion: one row per out-edge.
    assert(df.select(col("a.id")).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 3L, 5L))
  }

  test("anonymous middle vertex still joins the hops") {
    // 2-hop with unnamed middle: impossible in this grammar without a name,
    // so use a named-but-unreturned check instead: only a and c requested.
    val rows = g.find("(a)-[]->(m); (m)-[]->(c)")
      .select(col("a.id"), col("c.id")).as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 3L), (2L, 1L), (2L, 4L), (3L, 2L)))
  }

  test("morphism duplicates and the a.id < b.id idiom") {
    val sym = GraphFrame(g.vertices,
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
    val both = sym.find("(a)-[]->(b); (b)-[]->(a)")
    assert(both.count() == 2)
    assert(both.filter(col("a.id") < col("b.id")).count() == 1)
  }

  test("malformed patterns and unbound negations are rejected") {
    intercept[IllegalArgumentException](g.find("(a)->[e]->(b)"))
    intercept[IllegalArgumentException](g.find(""))
    intercept[IllegalArgumentException](g.find("!(a)-[]->(b)"))
    intercept[IllegalArgumentException](
      g.find("(a)-[]->(b); !(a)-[]->(zz)"))
    intercept[IllegalArgumentException](
      g.find("(a)-[e]->(b); (b)-[e]->(c)")) // edge var reuse
  }

  test("negated self-loop term filters vertices carrying a self-loop") {
    val gl = GraphFrame(g.vertices,
      g.edges.unionByName(Seq((2L, 2L, 0L)).toDF("src", "dst", "w")))
    // a->b where a has NO self-loop: drops the rows with a=2.
    val rows = gl.find("(a)-[]->(b); !(a)-[]->(a)")
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(!rows.exists(_._1 == 2L))
    assert(rows.contains((1L, 2L)) && rows.contains((3L, 4L)))
  }

  test("reserved __anon_ variable names are rejected") {
    intercept[IllegalArgumentException](g.find("(__anon_1)-[]->(b)"))
  }

  test("disconnected pattern components cross-join") {
    val rows = g.find("(a)-[]->(b); (c)-[]->(d)")
    assert(rows.count() == 25) // 5 edges x 5 edges
  }
}
