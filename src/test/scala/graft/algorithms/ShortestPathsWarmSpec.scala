package graft.algorithms

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame

/** Warm-start shortest paths (g42): the relaxation re-seeded from a
  * CONVERGED prior run, round-1 frontier = added-edge sources only.
  * Exactness is the fixpoint argument — every spec compares against a
  * cold run on the edited graph.
  */
class ShortestPathsWarmSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], lms: Seq[Long],
      warm: Option[(org.apache.spark.sql.DataFrame, Seq[(Long, Long)])] = None)
      : (Map[Long, Seq[Int]], Int) = {
    val g = GraphFrame.fromEdges(edges.toDF("src", "dst"))
    val b = g.shortestPaths(lms).smallGraphThreshold(0)
    warm.foreach { case (p, a) => b.warmStart(p, a.toDF("src", "dst")) }
    val r = b.run()
    (r.vertices.collect().map { row =>
      row.getLong(lms.length) -> lms.indices.map(row.getInt)
    }.toMap, r.iterations)
  }

  test("warm == cold on randomized edited graphs, multi-landmark") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 77 + 5)
      val all = (0 until 220).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).distinct
      val added = all.filter { case (a, b) => (a + 3 * b) % 6 == 0 }
      val base = all.filterNot(added.contains)
      val lms = Seq(0L, 7L)
      val prev = GraphFrame.fromEdges(base.toDF("src", "dst"))
        .shortestPaths(lms).run().vertices
      val (cold, _) = dists(all, lms)
      val (got, _) = dists(all, lms, Some((prev, added)))
      assert(got == cold, s"seed $seed: warm diverged from cold")
    }
  }

  test("a shortcut edge re-cascades distances far beyond its endpoints, " +
      "and the warm run pays cascade depth, not diameter") {
    // Path 0→1→…→20 plus the added shortcut 0→15: distances 15..20 all
    // drop (15 becomes 1, 20 becomes 6) — vertices far from the added
    // edge's endpoints. Cold re-pays the full 20-round frontier walk;
    // warm settles in the ~6-round cascade from the shortcut.
    val path = (0L until 20L).map(i => (i, i + 1))
    val prev = GraphFrame.fromEdges(path.toDF("src", "dst"))
      .shortestPaths(Seq(0L)).run().vertices
    val edited = path :+ (0L, 15L)
    val (cold, coldIters) = dists(edited, Seq(0L))
    val (got, warmIters) = dists(edited, Seq(0L), Some((prev, Seq((0L, 15L)))))
    assert(got == cold, "shortcut warm start diverged from cold")
    assert(got(15L) == Seq(1) && got(20L) == Seq(6))
    assert(warmIters < coldIters,
      s"no round win: warm $warmIters vs cold $coldIters")
  }

  test("delta touching nothing shorter is a 1-round no-op; new vertices " +
      "seed at infinity and get exact distances") {
    val base = Seq((0L, 1L), (1L, 2L))
    val prev = GraphFrame.fromEdges(base.toDF("src", "dst"))
      .shortestPaths(Seq(0L)).run().vertices
    // Added edge extends the frontier to a NEW vertex (3): no existing
    // distance improves, the new vertex lands at 3.
    val added = Seq((2L, 3L))
    val (got, iters) = dists(base ++ added, Seq(0L), Some((prev, added)))
    assert(got(3L) == Seq(3) && got(0L) == Seq(0) && got(2L) == Seq(2))
    assert(iters <= 2, s"trickle append should settle fast, took $iters")
  }

  test("toLandmarks orientation: the frontier reverses with the edges") {
    // Distances TO landmark 3 over 0→1→2→3; add 0→3 (reversed frontier
    // source is 3, the edge's dst).
    val base = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val prevR = GraphFrame.fromEdges(base.toDF("src", "dst"))
      .shortestPaths(Seq(3L)).toLandmarks().run().vertices
    val g = GraphFrame.fromEdges((base :+ (0L, 3L)).toDF("src", "dst"))
    val warm = g.shortestPaths(Seq(3L)).toLandmarks()
      .smallGraphThreshold(0)
      .warmStart(prevR, Seq((0L, 3L)).toDF("src", "dst")).run()
      .vertices.collect().map(r => r.getLong(1) -> r.getInt(0)).toMap
    val cold = g.shortestPaths(Seq(3L)).toLandmarks().run()
      .vertices.collect().map(r => r.getLong(1) -> r.getInt(0)).toMap
    assert(warm == cold && warm(0L) == 1)
  }

  test("malformed prev (missing landmark column) is rejected loudly") {
    val g = GraphFrame.fromEdges(Seq((0L, 1L)).toDF("src", "dst"))
    val e = intercept[IllegalArgumentException] {
      g.shortestPaths(Seq(0L)).smallGraphThreshold(0)
        .warmStart(Seq((0L, 5)).toDF("id", "dist_9"),
          Seq((0L, 1L)).toDF("src", "dst")).run()
    }
    assert(e.getMessage.contains("dist_0"))
  }
}
