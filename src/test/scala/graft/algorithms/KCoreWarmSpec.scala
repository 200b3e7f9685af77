package graft.algorithms

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame

/** Warm-start k-core (g41): the capped h-index loop re-seeded from
  * yesterday's coreness with the sound insertion budget
  * `least(degree, prev + |A|)`. Exactness is the sandwich argument —
  * every spec here compares against a cold run on the edited graph.
  */
class KCoreWarmSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def cores(edges: Seq[(Long, Long)],
      warm: Option[(org.apache.spark.sql.DataFrame, Seq[(Long, Long)])] = None)
      : (Map[Long, Long], Int) = {
    val g = GraphFrame.fromEdges(edges.toDF("src", "dst"))
    val builder = g.kCore.smallGraphThreshold(0)
    warm.foreach { case (prev, added) =>
      builder.warmStart(prev, added.toDF("src", "dst"))
    }
    val r = builder.run()
    (r.vertices.select(col("id"), col("kcore")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap, r.iterations)
  }

  test("warm == cold on randomized edited graphs (adds + removes)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 1000 + 7)
      val all = (0 until 160).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
      val base = all.filter { case (a, b) => (a + b) % 7 != 0 }
      val added = all.filter { case (a, b) => (a + b) % 7 == 0 }
      val removed = base.filter { case (a, b) => (a + b) % 7 == 1 }
      val edited = base.filterNot(removed.contains) ++ added
      val prev = GraphFrame.fromEdges(base.toDF("src", "dst"))
        .kCore.run().vertices.select(col("id"), col("kcore"))
      val (cold, _) = cores(edited)
      val (got, _) = cores(edited, Some((prev, added)))
      assert(got == cold, s"seed $seed: warm diverged from cold recompute")
    }
  }

  test("star counterexample: a per-vertex incident bound would be unsound " +
      "- the global insertion budget is what keeps the center exact") {
    // Base: star 0-{1,2,3}, every core 1. Add the triangle among the
    // LEAVES: the edited graph is K4, core 3 everywhere - including the
    // center, which gained NO incident edges (prev + incident = 1 would
    // under-seed it and the monotone loop could never recover upward).
    val base = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val added = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val prev = GraphFrame.fromEdges(base.toDF("src", "dst"))
      .kCore.run().vertices.select(col("id"), col("kcore"))
    val (got, _) = cores(base ++ added, Some((prev, added)))
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"K4 after leaf-triangle insertion must be a 3-core: $got")
  }

  test("deletion delta: exact and in fewer iterations than the cold run") {
    // K5 with a 30-vertex path attached: the path's cold h-index cascade
    // is the slow part (the 1 walks in from the far end one round at a
    // time). Removing one clique edge leaves the path seeds exact
    // (prev = 1 vs degree seed 2), so the warm run settles the clique in
    // a couple of rounds while cold re-pays the whole cascade.
    val k5 = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val path = (0 until 30).map(i => (4L + i, 5L + i)) // 4 is in the clique
    val full = k5 ++ path
    val prevFull = GraphFrame.fromEdges(full.toDF("src", "dst"))
      .kCore.run().vertices.select(col("id"), col("kcore"))
    val edited = full.filterNot(_ == (0L, 1L))
    val (cold, coldIters) = cores(edited)
    val (got, warmIters) = cores(edited, Some((prevFull, Nil)))
    assert(got == cold, "deletion warm start diverged from cold recompute")
    assert(warmIters < coldIters,
      s"no iteration win: warm $warmIters vs cold $coldIters")
    // And the K5-minus-one-edge region actually dropped: 0 and 1 sit in
    // a 3-core now, the untouched path stays a 1-core.
    assert(got(0L) == 3L && got(1L) == 3L && got(20L) == 1L)
  }

  test("unchanged graph: an exact seed converges in one voting round") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
    val prev = GraphFrame.fromEdges(edges.toDF("src", "dst"))
      .kCore.run().vertices.select(col("id"), col("kcore"))
    val (got, iters) = cores(edges, Some((prev, Nil)))
    val (cold, _) = cores(edges)
    assert(got == cold && iters <= 1,
      s"exact seed should settle immediately, took $iters rounds")
  }

  test("malformed prev frame is rejected loudly") {
    val g = GraphFrame.fromEdges(Seq((0L, 1L)).toDF("src", "dst"))
    val e = intercept[IllegalArgumentException] {
      g.kCore.warmStart(Seq((0L, 1L)).toDF("id", "core"),
        Seq.empty[(Long, Long)].toDF("src", "dst"))
    }
    assert(e.getMessage.contains("kcore"))
  }
}
