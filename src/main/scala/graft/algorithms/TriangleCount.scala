package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphFrame

/** Per-vertex triangle counts (beyond the reference's algorithm set; the
  * standard companion of k-core for corpus-graph quality metrics).
  *
  * Plan: canonicalize the symmetrized simple graph to src < dst once, then
  * count wedge-closing edges with two joins — the join-based formulation
  * shuffles on vertex keys and scales with |wedges|, never materializing
  * neighbor sets in memory. Each triangle {a<b<c} is found exactly once as
  * the wedge (a-b, a-c) closed by edge (b-c), then credited to all three
  * corners.
  */
class TriangleCount(graph: GraphFrame) {
  private val SRC = GraphFrame.SRC
  private val DST = GraphFrame.DST
  private val ID = GraphFrame.ID

  /** `[id, triangles]` for every vertex (0 for triangle-free vertices). */
  def run(): DataFrame = {
    // Undirected simple graph as canonical src < dst edges.
    val canon = GraphFrame.symmetrizeEdges(graph.edges.select(SRC, DST), doDistinct = true)
      .filter(col(SRC) < col(DST))
      .localCheckpoint(true)

    // Wedges at the minimum corner a: (a,b) x (a,c) with b < c,
    // closed by the canonical edge (b, c).
    val triangles = canon.as("e1")
      .join(canon.as("e2"), col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      .join(canon.as("e3"), col("b") === col("e3.src") && col("c") === col("e3.dst"))
      .select("a", "b", "c")

    val perCorner = triangles.select(col("a").as(ID))
      .unionAll(triangles.select(col("b").as(ID)))
      .unionAll(triangles.select(col("c").as(ID)))
      .groupBy(ID).agg(count(lit(1)).as("triangles"))

    graph.vertices.select(col(ID))
      .join(perCorner, Seq(ID), "left")
      .select(col(ID), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
