package graft.algorithms

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Layered neighbor sampling (g43): deterministic md5-ranked fanouts.
  * The value-exactness is the g43 oracle's job; these pin the laws.
  */
class GraphSamplingSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val hub = (1L to 10L).map(i => (0L, i)) ++
    Seq((1L, 100L), (1L, 101L), (2L, 200L)) ++
    (100L to 101L).map(i => (i, i + 900L))

  test("fanout bounds hold per (layer, src); low-degree keeps everything; " +
      "two runs are identical; layer-2 sources come from layer-1 targets") {
    val edges = hub.toDF("src", "dst")
    val seeds = Seq(0L, 2L).toDF("id")
    val out = GraphSampling.neighborSample(edges, seeds, Seq(4, 2), 7L)
    val rows = out.as[(Long, Long, Long)].collect()
    // Hub 0 (degree 10) is cut to 4; vertex 2 (degree 1) keeps its one.
    val perSrc = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.length)
    assert(perSrc((1L, 0L)) == 4 && perSrc((1L, 2L)) == 1)
    perSrc.foreach { case ((layer, _), n) =>
      assert(n <= (if (layer == 1L) 4 else 2), s"fanout exceeded: $perSrc")
    }
    // Frontier law.
    val l1Dsts = rows.filter(_._1 == 1L).map(_._3).toSet
    val l2Srcs = rows.filter(_._1 == 2L).map(_._2).toSet
    assert(l2Srcs.subsetOf(l1Dsts))
    // Purity: a re-run is row-identical.
    val again = GraphSampling.neighborSample(edges, seeds, Seq(4, 2), 7L)
      .as[(Long, Long, Long)].collect()
    assert(rows.sorted.sameElements(again.sorted))
    // A different seed draws a different hub sample (10 choose 4 over
    // independent md5 draws — equality would mean the seed is ignored).
    val other = GraphSampling.neighborSample(edges, seeds, Seq(4, 2), 8L)
      .as[(Long, Long, Long)].collect()
    assert(!rows.sorted.sameElements(other.sorted),
      "changing the seed must change the sample")
  }

  test("egoSubgraph: edges tag with the FIRST-reach hop, each edge once; " +
      "a diamond expands its join vertex once; early stop on exhaustion") {
    // 0 → {1, 2} → 3 → 4 → 5 (diamond into 3), plus a seed-adjacent
    // back-edge 3 → 0: vertex 3 is reachable along two paths but
    // expands once; 0 is a seed (dist 0) so 3 → 0 never re-expands 0.
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (3L, 0L), (4L, 5L)).toDF("src", "dst")
    val out = GraphSampling.egoSubgraph(edges, Seq(0L).toDF("id"), 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 1L), (1L, 0L, 2L), (2L, 1L, 3L),
      (2L, 2L, 3L), (3L, 3L, 4L), (3L, 3L, 0L)),
      s"got $out")
    // Depth past exhaustion adds nothing (frontier empties — 4's edge
    // appears at hop 4, nothing at 5+).
    val deep = GraphSampling.egoSubgraph(edges, Seq(0L).toDF("id"), 16)
      .as[(Long, Long, Long)].collect()
    assert(deep.length == 7 && deep.count(_._1 == 4L) == 1)
    val eD = intercept[IllegalArgumentException] {
      GraphSampling.egoSubgraph(edges, Seq(0L).toDF("id"), 0)
    }
    assert(eD.getMessage.contains("depth"))
  }

  test("multigraph duplicates do not occupy two slots; guards are loud") {
    val edges = Seq((0L, 1L), (0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val out = GraphSampling.neighborSample(edges, Seq(0L).toDF("id"),
      Seq(3), 7L).as[(Long, Long, Long)].collect()
    assert(out.map(_._3).toSet == Set(1L, 2L, 3L),
      "the duplicated edge must count once, leaving room for all three")
    val eF = intercept[IllegalArgumentException] {
      GraphSampling.neighborSample(edges, Seq(0L).toDF("id"), Nil, 7L)
    }
    assert(eF.getMessage.contains("fanouts"))
    val eS = intercept[IllegalArgumentException] {
      GraphSampling.neighborSample(edges, Seq(0L).toDF("wrong"), Seq(2), 7L)
    }
    assert(eS.getMessage.contains("id"))
  }
}
