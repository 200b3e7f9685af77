package graft.algorithms

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.functions.PortableHashes

class RandomWalksSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  test("walks follow the portable-hash argmin and stop at sinks") {
    // 1 -> {2, 3}; 2 -> {4}; 3 -> {5}; 4, 5 sinks. Walk from 1: the step-1
    // draw picks argmin over hash("1:1:2") vs hash("1:1:3"); step 2 is
    // forced; step 3 hits a sink and the walk ends at length 2.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 5L)).toDF("src", "dst")
    val starts = Seq(1L).toDF("v")
    val got = RandomWalks.run(edges, starts, "v", len = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val step1 = Seq(2L, 3L)
      .minBy(u => (PortableHashes.portableHash60(s"1:1:$u"), u))
    val step2 = if (step1 == 2L) 4L else 5L
    assert(got == Map(0L -> 1L, 1L -> step1, 2L -> step2),
      s"walk diverged from the reference draw: $got")
  }

  test("harmonic centrality: reciprocal micro-lattice sums on a path graph") {
    // Undirected path 1-2-3-4-5, landmarks 1 and 5, cap 4 hops.
    val dir = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val edges = dir.unionAll(dir.select(col("dst").as("src"), col("src").as("dst")))
    val expect = Map(
      1L -> ((1000000L / 4, 1L)),            // d(5,1)=4; own landmark excluded
      2L -> ((1000000L + 1000000L / 3, 2L)), // d=1, d=3
      3L -> ((500000L + 500000L, 2L)),
      4L -> ((1000000L / 3 + 1000000L, 2L)),
      5L -> ((250000L, 1L)))
    val got = HarmonicCentrality.run(edges, Seq(1L, 5L), maxIter = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, s"got $got")
    // Tighter cap: d=4 terms vanish, d<=3 survive.
    val capped = HarmonicCentrality.run(edges, Seq(1L), maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1000000L, 3L -> 500000L, 4L -> 0L, 5L -> 0L))
  }

  test("scc: cycles, one-way links stay separate, two-way bridges merge, tails singleton") {
    // 3-cycle {1,2,3}, 3-cycle {4,5,6}, one-way 3->4 (separate SCCs),
    // tail 7->1 (singleton), and a 2-cycle {8,9} bridged INTO {1,2,3}
    // both ways (8->1, 2->9, 9->8) — mutual, so {1,2,3,8,9} is ONE SCC.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L),
      (7L, 1L),
      (8L, 1L), (2L, 9L), (9L, 8L)).toDF("src", "dst")
    val want = Map(
      1L -> 9L, 2L -> 9L, 3L -> 9L, 8L -> 9L, 9L -> 9L,
      4L -> 6L, 5L -> 6L, 6L -> 6L,
      7L -> 7L)
    // BOTH arms: driver Tarjan (default threshold) and forced FW-BW.
    val tarjan = StronglyConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tarjan == want, s"tarjan got $tarjan")
    val fwbw = StronglyConnectedComponents.run(edges, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fwbw == want, s"fwbw got $fwbw")
    // Pure DAG: every vertex is its own SCC.
    val dag = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val dagGot = StronglyConnectedComponents.run(dag)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dagGot == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("scc: driver Tarjan == distributed FW-BW on a random digraph") {
    val edges = spark.range(400).selectExpr(
      "abs(CAST(xxhash64(id, 21) % 80 AS BIGINT)) AS src",
      "abs(CAST(xxhash64(id, 22) % 80 AS BIGINT)) AS dst")
      .localCheckpoint(true)
    val a = StronglyConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = StronglyConnectedComponents.run(edges, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"arms diverge: ${a.toSet.diff(b.toSet)}")
    assert(a.nonEmpty)
  }

  test("duplicate edges don't bias the draw; reruns are identical") {
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val starts = Seq(1L, 2L, 3L).toDF("v")
    val a = RandomWalks.run(edges, starts, "v", len = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = RandomWalks.run(edges, starts, "v", len = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // Every walk on this sink-free graph runs the full length.
    assert(a.size == 3 * 4)
    // Different walks at the same vertex may draw different next hops:
    // the draw keys on walk_id, so walk 2 and walk 3 (both at vertex 1
    // after step 1) are independent draws — just assert structure holds.
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2) == Set(0L, 1L, 2L, 3L))
    }
  }
}
