package graft.algorithms

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame

/** Property-style randomized testing (SURVEY §5 layer 4 strengthening):
  * seeded random graphs checked against independent in-test oracles —
  * exercising the DISTRIBUTED algorithm paths (hybrid fallbacks disabled),
  * whose correctness otherwise rests on a handful of fixed fixtures.
  */
class RandomGraphSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private case class RandomGraph(vs: Seq[Long], es: Seq[(Long, Long)]) {
    def gf: GraphFrame = GraphFrame(
      vs.toDF("id"), es.toDF("src", "dst"))
    /** Undirected simple adjacency (self-loops dropped). */
    def adj: Map[Long, Set[Long]] = {
      val sym = es.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
      sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        .withDefaultValue(Set.empty)
    }
  }

  private def randomGraph(seed: Int): RandomGraph = {
    val rnd = new scala.util.Random(seed)
    val n = 4 + rnd.nextInt(8)           // 4..11 vertices
    val m = rnd.nextInt(2 * n)           // 0..2n-1 edges (loops/dups allowed)
    val vs = (1L to n.toLong)
    val es = Seq.fill(m)((1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
      .map { case (a, b) => (a.toLong, b.toLong) }
    RandomGraph(vs, es)
  }

  private val seeds = 1 to 6

  test("random graphs: distributed WCC == union-find oracle") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      // oracle: BFS closure per vertex, label = min reachable id
      val adj = g.adj
      def component(v: Long): Long = {
        var seen = Set(v); var frontier = Set(v)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj) -- seen
          seen ++= frontier
        }
        seen.min
      }
      val expected = g.vs.map(v => v -> component(v)).toMap
      val got = g.gf.connectedComponents.smallGraphThreshold(0).run()
        .components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed graph=${g.es}")
      // threshold 1: distributed rounds run until the contracted remainder
      // is tiny, then the mid-loop union-find cutover finishes — same answer.
      val hybrid = g.gf.connectedComponents.smallGraphThreshold(1).run()
        .components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hybrid === expected, s"mid-loop cutover diverged: seed=$seed graph=${g.es}")
    }
  }

  test("random graphs: distributed k-core == peeling oracle") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      // oracle: repeatedly strip vertices with degree < k
      val adj = g.adj
      def coreness: Map[Long, Long] = {
        var core = g.vs.map(_ -> 0L).toMap
        var k = 1L
        var alive = g.vs.toSet
        var continue = true
        while (continue) {
          var changed = true
          var surviving = alive
          while (changed) {
            val next = surviving.filter(v => (adj(v) & surviving).size >= k)
            changed = next != surviving
            surviving = next
          }
          if (surviving.isEmpty) continue = false
          else { core = core ++ surviving.map(_ -> k); alive = surviving; k += 1 }
        }
        core
      }
      val expected = coreness
      val got = g.gf.kCore.smallGraphThreshold(0).run()
        .vertices.select("id", "kcore")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed graph=${g.es}")
    }
  }

  test("random graphs: distributed MIS is independent and maximal") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      val adj = g.adj
      val mis = g.gf.maximalIndependentSet.smallGraphThreshold(0).run()
        .vertices.collect().map(_.getLong(0)).toSet
      assert(mis.forall(v => (adj(v) & mis).isEmpty), s"seed=$seed not independent: $mis")
      assert((g.vs.toSet -- mis).forall(v => (adj(v) & mis).nonEmpty),
        s"seed=$seed not maximal: $mis")
    }
  }

  test("random graphs: driver MIS replay == distributed rounds (same set)") {
    // The hybrid path SIMULATES the distributed rounds (md5 draws, dyadic
    // probabilities) — outputs must be identical, not merely both valid.
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      val distributed = g.gf.maximalIndependentSet.smallGraphThreshold(0).run()
        .vertices.collect().map(_.getLong(0)).toSet
      val driver = g.gf.maximalIndependentSet.smallGraphThreshold(1000000).run()
        .vertices.collect().map(_.getLong(0)).toSet
      assert(driver === distributed, s"seed=$seed driver replay diverged: graph=${g.es}")
      // threshold 1: distributed rounds run until the contracted remainder
      // is tiny, then the mid-loop cutover CONTINUES the simulation from
      // the collected (p, iteration) state — same set again.
      val midLoop = g.gf.maximalIndependentSet.smallGraphThreshold(1).run()
        .vertices.collect().map(_.getLong(0)).toSet
      assert(midLoop === distributed, s"seed=$seed mid-loop cutover diverged: graph=${g.es}")
    }
  }

  test("random graphs: driver-peel k-core == peeling oracle") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      val adj = g.adj
      val expected = g.vs.map { v =>
        // coreness oracle: strip degree-<k vertices until fixpoint, per k
        var core = 0L
        var k = 1L
        var alive = g.vs.toSet
        var continue = true
        while (continue) {
          var changed = true
          var surviving = alive
          while (changed) {
            val next = surviving.filter(u => (adj(u) & surviving).size >= k)
            changed = next != surviving
            surviving = next
          }
          if (surviving.isEmpty) continue = false
          else { if (surviving(v)) core = k; alive = surviving; k += 1 }
        }
        v -> core
      }.toMap
      val got = g.gf.kCore.run() // default threshold => array peel on driver
        .vertices.select("id", "kcore")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed graph=${g.es}")
    }
  }

  test("random graphs: driver BFS == distributed shortest paths (capped and uncapped)") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      val lms = Seq(1L, 2L)
      def collect(r: graft.pregel.PregelResult): Map[Long, (Int, Int)] =
        r.vertices.select(col("id"), col("dist_1"), col("dist_2"))
          .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2)))).toMap
      Seq(2, Int.MaxValue).foreach { cap =>
        val driver = collect(
          g.gf.shortestPaths(lms).maxIterations(cap).run())
        val dist = collect(
          g.gf.shortestPaths(lms).maxIterations(cap).smallGraphThreshold(0).run())
        assert(driver === dist, s"seed=$seed cap=$cap graph=${g.es}")
      }
    }
  }

  test("random graphs: weighted SSSP == Bellman-Ford oracle, driver == distributed") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      val rnd = new scala.util.Random(seed * 31 + 7)
      val wes = g.es.map { case (s, d) => (s, d, 1L + rnd.nextInt(20)) }
      val gf = GraphFrame(g.vs.toDF("id"), wes.toDF("src", "dst", "weight"))
      val lm = 1L
      // oracle: full synchronous relaxation to fixpoint
      val dist = scala.collection.mutable.Map(g.vs.map(_ -> Long.MaxValue): _*)
      dist(lm) = 0L
      var changed = true
      while (changed) {
        changed = false
        wes.foreach { case (s, d, w) =>
          if (dist(s) < Long.MaxValue && dist(s) + w < dist(d)) {
            dist(d) = dist(s) + w; changed = true
          }
        }
      }
      val expected = dist.toMap
      def collect(r: graft.pregel.PregelResult): Map[Long, Long] =
        r.vertices.select(col("id"), col("dist_1"))
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val driver = collect(gf.weightedShortestPaths(Seq(lm)).run())
      val distrib = collect(
        gf.weightedShortestPaths(Seq(lm)).smallGraphThreshold(0).run())
      assert(driver === expected, s"seed=$seed graph=$wes")
      assert(distrib === expected, s"seed=$seed graph=$wes")
    }
  }

  test("random graphs: driver LPA == distributed label propagation") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      def collect(r: graft.pregel.PregelResult): Map[Long, Long] =
        r.vertices.select(col("id"), col("label"))
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val driver = collect(g.gf.labelPropagation.maxIterations(3).run())
      val dist = collect(
        g.gf.labelPropagation.maxIterations(3).smallGraphThreshold(0).run())
      assert(driver === dist, s"seed=$seed graph=${g.es}")
    }
  }

  test("random graphs: triangle counts == brute force") {
    seeds.foreach { seed =>
      val g = randomGraph(seed)
      val adj = g.adj
      val expected = g.vs.map { v =>
        v -> adj(v).toSeq.combinations(2).count { case Seq(a, b) => adj(a)(b) }.toLong
      }.toMap
      val got = g.gf.triangleCount.run()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed graph=${g.es}")
    }
  }
}
