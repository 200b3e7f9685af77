package graft.algorithms

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame

class KatzCentralitySpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def katzOf(edges: Seq[(Long, Long)], iters: Int,
      aDen: Int = 2): Map[Long, Long] = {
    val g = GraphFrame.fromEdges(edges.toDF("src", "dst"))
    val k = g.katz.iterations(iters)
    (if (aDen != 2) k.alphaDenominator(aDen) else k)
      .run().as[(Long, Long)].collect().toMap
  }

  test("katz: hand-computed chain — attenuated walk mass accumulates exactly") {
    // a -> b -> c, alpha = 1/2 on the 1e6 lattice.
    val chain = Seq((1L, 2L), (2L, 3L))
    // Round 1: b and c each receive one lattice-1.0 message.
    assert(katzOf(chain, 1) ===
      Map(1L -> 1000000L, 2L -> 1500000L, 3L -> 1500000L))
    // Round 2: c's mass now includes the 2-hop walk from a via b.
    assert(katzOf(chain, 2) ===
      Map(1L -> 1000000L, 2L -> 1500000L, 3L -> 1750000L))
    // Round 3 is the chain's fixpoint (no walks longer than 2 exist).
    assert(katzOf(chain, 3) === katzOf(chain, 2))
  }

  test("katz: division truncates (the div/`//` contract) and fan-in sums first") {
    // alpha = 1/3: 1e6 // 3 truncates to 333333 — the lattice rule the
    // oracle replays; a float engine would carry ...333.33.
    assert(katzOf(Seq((1L, 2L)), 1, aDen = 3)(2L) === 1333333L)
    // Diamond fan-in: d receives from b AND c — sum THEN divide:
    // round 2: k1(b) = k1(c) = 1.5e6, d = 1e6 + (3e6 div 2) = 2.5e6
    // (divide-then-sum would give 1e6 + 750000*2 = the same here, so pin
    // an ODD pair: b gets a second in-edge making k1(b) = 2e6, then
    // d = 1e6 + ((2e6 + 1.5e6) div 2) = 2.75e6).
    val diamond = Seq((1L, 2L), (5L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(katzOf(diamond, 2)(4L) === 2750000L)
  }

  test("katz: sources keep the base, guards fail loud") {
    val out = katzOf(Seq((1L, 2L)), 4)
    assert(out(1L) === 1000000L, "no-in-edge vertex must hold the base")
    intercept[IllegalArgumentException] {
      GraphFrame.fromEdges(Seq((1L, 2L)).toDF("src", "dst"))
        .katz.iterations(0)
    }
    intercept[IllegalArgumentException] {
      GraphFrame.fromEdges(Seq((1L, 2L)).toDF("src", "dst"))
        .katz.alphaDenominator(1)
    }
  }
}
