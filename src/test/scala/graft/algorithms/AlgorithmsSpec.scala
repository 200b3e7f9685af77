package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{LdbcLoader, SparkTestHarness}
import graft.graph.GraphFrame

/** Golden-file and invariant tests for the five algorithms, ported from the
  * reference (`pagerank.rs:290-366`, `shortest_paths.rs:255-441`,
  * `k_core.rs:239-521`, `connected_components.rs:484-746`,
  * `maximal_independent_set.rs:560-754`).
  */
class AlgorithmsSpec extends AnyFunSuite with SparkTestHarness {

  private def graph(vs: Seq[Long], es: Seq[(Long, Long)]): GraphFrame = {
    val s = spark
    import s.implicits._
    GraphFrame(vs.map(Tuple1(_)).toDF("id"), es.toDF("src", "dst"))
  }

  // ---------------- ShortestPaths ----------------

  test("shortest paths: small graph, single landmark") {
    // Reference fixture shortest_paths.rs:255-377: 4 vertices, 8 edges.
    val g = graph(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L), (1L, 3L), (3L, 1L)))
    val res = g.shortestPaths(Seq(1L)).run()
    val dists = res.vertices.select(col("id"), col("dist_1"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dists === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("shortest paths: multiple landmarks in one pass") {
    val g = graph(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val res = g.shortestPaths(Seq(1L, 3L)).run()
    val rows = res.vertices.select(col("id"), col("dist_1"), col("dist_3"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val Inf = Int.MaxValue
    assert(rows === Set((1L, 0, Inf), (2L, 1, Inf), (3L, 2, 0), (4L, 3, 1)))
  }

  test("shortest paths: toLandmarks reverses direction") {
    val g = graph(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
    val res = g.shortestPaths(Seq(3L)).toLandmarks().run()
    val dists = res.vertices.select(col("id"), col("dist_3"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dists === Map(1L -> 2, 2L -> 1, 3L -> 0))
  }

  // ---------------- WeightedShortestPaths ----------------

  private def wgraph(vs: Seq[Long], es: Seq[(Long, Long, Long)]): GraphFrame = {
    val s = spark
    import s.implicits._
    GraphFrame(vs.map(Tuple1(_)).toDF("id"), es.toDF("src", "dst", "weight"))
  }

  private def wdists(g: GraphFrame, lm: Long, distributed: Boolean,
      cap: Int = Int.MaxValue): Map[Long, Long] = {
    var b = g.weightedShortestPaths(Seq(lm))
    if (distributed) b = b.smallGraphThreshold(0)
    if (cap != Int.MaxValue) b = b.maxIterations(cap)
    b.run().vertices.select(col("id"), col(s"dist_$lm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted shortest paths: lighter two-hop path beats heavier direct edge") {
    val g = wgraph(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 3L, 10L), (1L, 2L, 3L), (2L, 3L, 4L), (3L, 4L, 1L)))
    val expected = Map(1L -> 0L, 2L -> 3L, 3L -> 7L, 4L -> 8L)
    assert(wdists(g, 1L, distributed = false) === expected)
    assert(wdists(g, 1L, distributed = true) === expected)
  }

  test("weighted shortest paths: unreachable is Long.MaxValue; parallel edges take min") {
    val g = wgraph(Seq(1L, 2L, 3L, 9L),
      Seq((1L, 2L, 7L), (1L, 2L, 2L), (2L, 3L, 5L)))
    val expected = Map(1L -> 0L, 2L -> 2L, 3L -> 7L, 9L -> Long.MaxValue)
    assert(wdists(g, 1L, distributed = false) === expected)
    assert(wdists(g, 1L, distributed = true) === expected)
  }

  test("weighted shortest paths: iteration cap bounds path length in edges") {
    // Chain 1 -5-> 2 -5-> 3 -5-> 4; after 2 rounds vertex 4 is unreached.
    val g = wgraph(1L to 4L, Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L)))
    val expected = Map(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> Long.MaxValue)
    assert(wdists(g, 1L, distributed = false, cap = 2) === expected)
    assert(wdists(g, 1L, distributed = true, cap = 2) === expected)
  }

  test("weighted shortest paths: negative edge relaxes a longer-but-cheaper path") {
    // 1 -5-> 2 direct, but 1 -10-> 3 -(-8)-> 2 costs 2.
    val g = wgraph(1L to 3L, Seq((1L, 2L, 5L), (1L, 3L, 10L), (3L, 2L, -8L)))
    val expected = Map(1L -> 0L, 2L -> 2L, 3L -> 10L)
    assert(wdists(g, 1L, distributed = false) === expected)
    assert(wdists(g, 1L, distributed = true) === expected)
  }

  test("weighted shortest paths: multi-landmark and toLandmarks") {
    val g = wgraph(1L to 4L, Seq((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 4L)))
    val res = g.weightedShortestPaths(Seq(1L, 3L)).run()
      .vertices.select(col("id"), col("dist_1"), col("dist_3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val Inf = Long.MaxValue
    assert(res === Set((1L, 0L, Inf), (2L, 2L, Inf), (3L, 5L, 0L), (4L, 9L, 4L)))
    val to3 = g.weightedShortestPaths(Seq(3L)).toLandmarks().run()
      .vertices.select(col("id"), col("dist_3"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(to3 === Map(1L -> 5L, 2L -> 3L, 3L -> 0L, 4L -> Inf))
  }

  test("weighted shortest paths: empty edges, missing landmark, empty graph") {
    // No edges: landmark at 0, everyone else at infinity, 1 voting round.
    val g = wgraph(Seq(1L, 2L), Seq.empty)
    assert(wdists(g, 1L, distributed = true) === Map(1L -> 0L, 2L -> Long.MaxValue))
    // Landmark not in the vertex set: all infinite.
    val g2 = wgraph(Seq(1L, 2L), Seq((1L, 2L, 3L)))
    assert(wdists(g2, 99L, distributed = true) ===
      Map(1L -> Long.MaxValue, 2L -> Long.MaxValue))
    assert(wdists(g2, 99L, distributed = false) ===
      Map(1L -> Long.MaxValue, 2L -> Long.MaxValue))
  }

  test("weighted algorithms: NULL edge weight raises instead of diverging") {
    // Unguarded, a NULL weight is a free edge on the driver path (getLong
    // unboxes to 0) but a dropped edge distributed (min skips NULL) —
    // divergent silent answers. Both weighted algorithms must raise.
    val s = spark
    import s.implicits._
    val g = GraphFrame(Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id"),
      Seq((1L, 2L, Some(5L)), (2L, 3L, None)).toDF("src", "dst", "weight"))
    def messages(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .take(10).flatMap(t => Option(t.getMessage)).mkString("; ")
    Seq(true, false).foreach { distributed =>
      var b = g.weightedShortestPaths(Seq(1L))
      if (distributed) b = b.smallGraphThreshold(0)
      val e = intercept[Exception] { b.run().vertices.collect() }
      assert(messages(e).contains("NULL in weight column"),
        s"distributed=$distributed: ${messages(e)}")
    }
    val e2 = intercept[Exception] {
      g.pageRank.weighted("weight").maxIterations(1).run().ranks.collect()
    }
    assert(messages(e2).contains("NULL in weight column"), messages(e2))
  }

  test("weighted shortest paths: float weight column is rejected") {
    val s = spark
    import s.implicits._
    val g = GraphFrame(Seq(1L, 2L).map(Tuple1(_)).toDF("id"),
      Seq((1L, 2L, 1.5)).toDF("src", "dst", "weight"))
    val e = intercept[IllegalArgumentException] {
      g.weightedShortestPaths(Seq(1L)).run()
    }
    assert(e.getMessage.contains("integral"))
  }

  test("LDBC golden: test-bfs-directed exact distances from vertex 1") {
    val g = LdbcLoader.graph(spark, "test-bfs-directed")
    val res = g.shortestPaths(Seq(1L)).run()
    val golden = LdbcLoader.golden(spark, "test-bfs-directed", "BFS")
      .select(col("id"),
        // LDBC uses i64::MAX for infinity; we use i32::MAX (reference
        // mapping, shortest_paths.rs:427-435).
        when(col("expected").cast("long") === Long.MaxValue, lit(Int.MaxValue))
          .otherwise(col("expected").cast("int")).as("expected"))
    val joined = res.vertices.join(golden, "id")
    assert(joined.count() === g.numNodes)
    assert(joined.filter(col("dist_1") =!= col("expected")).count() === 0)
  }

  // ---------------- PageRank ----------------

  test("LDBC golden: test-pr-directed, fixed 14 iterations, tol 0.0015") {
    val g = LdbcLoader.graph(spark, "test-pr-directed")
    // .properties: damping 0.85 (reset 0.15), 14 iterations.
    val res = g.pageRank.maxIterations(14).tolerance(0.0).run()
    val golden = LdbcLoader.golden(spark, "test-pr-directed", "PR")
      .select(col("id"), col("expected").cast("double").as("expected"))
    val joined = res.ranks.join(golden, "id")
    assert(joined.count() === 50)
    val maxDiff = joined.agg(max(abs(col("pagerank") - col("expected"))))
      .collect().head.getDouble(0)
    assert(maxDiff <= 0.0015, s"max |pr - golden| = $maxDiff")
  }

  test("LDBC golden: test-pr-directed, convergence mode, tol 0.01 band") {
    val g = LdbcLoader.graph(spark, "test-pr-directed")
    val res = g.pageRank.maxIterations(0).tolerance(1e-4).run()
    val golden = LdbcLoader.golden(spark, "test-pr-directed", "PR")
      .select(col("id"), col("expected").cast("double").as("expected"))
    val joined = res.ranks.join(golden, "id")
    val maxDiff = joined.agg(max(abs(col("pagerank") - col("expected"))))
      .collect().head.getDouble(0)
    assert(maxDiff <= 0.01, s"max |pr - golden| = $maxDiff")
  }

  test("pagerank: ranks sum to 1 and sinks keep accumulated rank") {
    val g = graph(Seq(1L, 2L, 3L), Seq((1L, 3L), (2L, 3L))) // 3 is a sink
    val res = g.pageRank.maxIterations(5).run()
    val ranks = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    assert(ranks(3L) > ranks(1L))
    assert(ranks.contains(3L)) // sink present in the result
  }

  test("personalized pagerank: mass concentrates near the source, unreachable = 0") {
    // 1 -> 2 -> 3, and isolated-from-source 4 -> 5
    val g = graph(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    val ranks = g.pageRank.tolerance(1e-9).maxIterations(5).personalized(1L)
      .run().ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9) // normalized
    assert(ranks(1L) > ranks(2L) && ranks(2L) > ranks(3L)) // decays along the path
    assert(ranks(4L) == 0.0 && ranks(5L) == 0.0) // unreachable from source
  }

  test("weighted pagerank: mass follows edge weight; equal weights == unweighted") {
    // 1 -> 2 with weight 9, 1 -> 3 with weight 1: vertex 2 must outrank 3,
    // and the round-1 message split must be exactly 0.9/0.1 of the delta.
    val s = spark
    import s.implicits._
    val g = GraphFrame(Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id"),
      Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("src", "dst", "weight"))
    val r = g.pageRank.tolerance(1e-9).maxIterations(1).weighted("weight").run()
      .ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // pre-normalization: pr(1) = 0.15; pr(2) = 0.15 + 0.85*0.15*0.9;
    // pr(3) = 0.15 + 0.85*0.15*0.1
    val p1 = 0.15; val p2 = 0.15 + 0.85 * 0.15 * 0.9; val p3 = 0.15 + 0.85 * 0.15 * 0.1
    val tot = p1 + p2 + p3
    assert(math.abs(r(2L) - p2 / tot) < 1e-12 && math.abs(r(3L) - p3 / tot) < 1e-12)
    // Uniform weights reproduce the unweighted ranks exactly (w/W == 1/d).
    val gu = GraphFrame(Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id"),
      Seq((1L, 2L, 5L), (1L, 3L, 5L)).toDF("src", "dst", "weight"))
    val wr = gu.pageRank.tolerance(1e-9).maxIterations(2).weighted("weight").run()
      .ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val ur = gu.pageRank.tolerance(1e-9).maxIterations(2).run()
      .ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(wr.keySet === ur.keySet)
    wr.foreach { case (k, v) => assert(math.abs(v - ur(k)) < 1e-12, s"id=$k") }
  }

  test("weighted pagerank: float weight column is rejected") {
    val s = spark
    import s.implicits._
    val g = GraphFrame(Seq(1L, 2L).map(Tuple1(_)).toDF("id"),
      Seq((1L, 2L, 0.5)).toDF("src", "dst", "weight"))
    val e = intercept[IllegalArgumentException] {
      g.pageRank.weighted("weight").maxIterations(1).run()
    }
    assert(e.getMessage.contains("integral"))
  }

  test("hits: integer path counts on a fan graph") {
    // 1 -> {3, 4}, 2 -> 3: vertex 3 is the strongest authority, 1 the
    // strongest hub. Iter 1: auth = in-degree (3: 2, 4: 1), hub = sum of
    // out-neighbor auths (1: 2+1 = 3, 2: 2). Iter 2: auth_3 = hub_1 +
    // hub_2 = 5, auth_4 = hub_1 = 3; hub_1 = 5+3 = 8, hub_2 = 5.
    val g = graph(Seq(1L, 2L, 3L, 4L), Seq((1L, 3L), (1L, 4L), (2L, 3L)))
    val r = g.hits.iterations(2).run()
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(1L -> ((0L, 8L)), 2L -> ((0L, 5L)),
      3L -> ((5L, 0L)), 4L -> ((3L, 0L))))
  }

  test("hits: normalized scores divide the exact counts by their L2 norms") {
    // Same fan graph: auth vector (0,0,5,3), norm sqrt(34); hub vector
    // (8,5,0,0), norm sqrt(89).
    val g = graph(Seq(1L, 2L, 3L, 4L), Seq((1L, 3L), (1L, 4L), (2L, 3L)))
    val r = g.hits.iterations(2).normalized(true).run()
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    val na = math.sqrt(34.0); val nh = math.sqrt(89.0)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(r(3L)._1, 5.0 / na) && close(r(4L)._1, 3.0 / na))
    assert(close(r(1L)._2, 8.0 / nh) && close(r(2L)._2, 5.0 / nh))
    assert(r(1L)._1 == 0.0 && r(3L)._2 == 0.0)
    // All-isolated graph: zero norms must yield 0.0, not NaN.
    val iso = graph(Seq(7L, 8L), Seq.empty).hits.iterations(1).normalized(true)
      .run().collect().map(x => (x.getDouble(1), x.getDouble(2))).toSet
    assert(iso === Set((0.0, 0.0)))
  }

  test("hits: Long overflow raises instead of wrapping") {
    // K2 bipartite-complete blowup: n sources each pointing at n sinks
    // doubles magnitudes fast, but Long survives any practical n. Force
    // the wrap cheaply instead: two vertices exchanging edges with initial
    // counts amplified by a huge fan would need a big graph — so assert
    // the guard path directly on a crafted graph: a self-loop vertex with
    // 2^62-scale counts overflows within 40 iterations.
    val g = graph(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L)))
    // each round roughly triples counts: 3^k > 2^63 at k = 40
    val e = intercept[Exception] {
      g.hits.iterations(45).run().collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString("; ")
    assert(messages.contains("overflow"), s"unexpected failure: $messages")
  }

  // ---------------- KCore ----------------

  private def cores(g: GraphFrame): Map[Long, Long] =
    g.kCore.run().vertices.select(col("id"), col("kcore"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kcore: triangle with tail — core differs from degree") {
    // k_core.rs:365-389: edges (1,2),(2,3),(3,1),(1,4),(4,5)
    val g = graph(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L)))
    assert(cores(g) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("kcore: DISTRIBUTED rounds path matches driver peeling") {
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val g = graph((1L to 5L) ++ Seq(10L, 11L, 99L),
      k5 ++ Seq((5L, 10L), (10L, 11L), (1L, 2L))) // duplicate edge on purpose
    val res = g.kCore.smallGraphThreshold(0).run()
    assert(res.iterations > 0) // hybrid fallback disabled: the rounds must run
    val dist = res.vertices.select(col("id"), col("kcore"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === cores(g)) // same fixpoint as Matula–Beck peeling
    assert(dist(99L) === 0L)  // isolated vertex
  }

  test("kcore: reciprocal pair is a 1-core, not 2-core") {
    // k_core.rs:486-502: directed (0,1),(1,0) treated as one undirected edge
    val g = graph(Seq(0L, 1L), Seq((0L, 1L), (1L, 0L)))
    assert(cores(g) === Map(0L -> 1L, 1L -> 1L))
  }

  test("kcore: K5 plus chain layering") {
    // K5 core (all 4-core) with a chain 5->10->11 hanging off vertex 5.
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val g = graph((1L to 5L) ++ Seq(10L, 11L), k5 ++ Seq((5L, 10L), (10L, 11L)))
    val c = cores(g)
    assert((1L to 5L).forall(c(_) === 4L))
    assert(c(10L) === 1L && c(11L) === 1L)
  }

  test("kcore: isolated vertices get core 0") {
    val g = graph(Seq(1L, 2L, 3L), Seq((1L, 2L)))
    assert(cores(g) === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  // ---------------- ConnectedComponents ----------------

  private def components(g: GraphFrame): Map[Long, Long] =
    g.connectedComponents.run().components
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("wcc: two disjoint components get min-label ids") {
    // connected_components.rs:601-647: {1,2,3} via (1,2),(2,3); {10,11}
    val g = graph(Seq(1L, 2L, 3L, 10L, 11L), Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(components(g) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("wcc: empty edge set — every vertex its own component") {
    val g = graph(Seq(1L, 2L, 3L), Seq.empty)
    assert(components(g) === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("wcc: self-loops only") {
    val g = graph(Seq(1L, 2L), Seq((1L, 1L), (2L, 2L)))
    assert(components(g) === Map(1L -> 1L, 2L -> 2L))
  }

  test("LDBC golden: test-wcc-directed exact components") {
    val g = LdbcLoader.graph(spark, "test-wcc-directed")
    val res = g.connectedComponents.run()
    val golden = LdbcLoader.golden(spark, "test-wcc-directed", "WCC")
      .select(col("id"), col("expected").cast("long").as("expected"))
    val joined = res.components.join(golden, "id")
    assert(joined.count() === g.numNodes)
    assert(joined.filter(col("component") =!= col("expected")).count() === 0)
  }

  test("LDBC golden: test-wcc-directed via the DISTRIBUTED contraction path") {
    val g = LdbcLoader.graph(spark, "test-wcc-directed")
    val res = g.connectedComponents.smallGraphThreshold(0).run()
    assert(res.iterations > 0) // hybrid fallback disabled: the loop must run
    val golden = LdbcLoader.golden(spark, "test-wcc-directed", "WCC")
      .select(col("id"), col("expected").cast("long").as("expected"))
    val joined = res.components.join(golden, "id")
    assert(joined.count() === g.numNodes)
    assert(joined.filter(col("component") =!= col("expected")).count() === 0)
  }

  test("wcc: mid-loop cutover after distributed rounds matches pure distributed") {
    // Two K5s bridged by a long path: big enough to start distributed at
    // threshold 8, small enough to cut over after contraction shrinks it.
    val k5 = (base: Long) => for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (base + i, base + j)
    val path = (20L until 40L).map(i => (i, i + 1))
    val es = k5(0L) ++ k5(100L) ++ path ++ Seq((4L, 20L), (40L, 100L))
    val vs = es.flatMap(e => Seq(e._1, e._2)).distinct
    val g = graph(vs, es)
    val pure = g.connectedComponents.smallGraphThreshold(0).run()
    val hybrid = g.connectedComponents.smallGraphThreshold(8).run()
    assert(hybrid.iterations > 0 && hybrid.iterations < pure.iterations,
      s"expected a MID-loop cutover (pure=${pure.iterations}, hybrid=${hybrid.iterations})")
    val p = pure.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h = hybrid.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h === p)
    assert(h.values.toSet.size === 1) // single connected component
  }

  test("wcc: raw hashed labels mode still partitions identically") {
    val g = graph(Seq(1L, 2L, 3L, 10L, 11L), Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    val raw = g.connectedComponents.labelsAsComponents(false).run().components
    val grouped = raw.groupBy("component").agg(collect_set("id").as("members"))
      .collect().map(_.getSeq[Long](1).toSet).toSet
    assert(grouped === Set(Set(1L, 2L, 3L), Set(10L, 11L)))
  }

  // ---------------- MaximalIndependentSet ----------------

  private def misOf(g: GraphFrame): Set[Long] =
    g.maximalIndependentSet.run().vertices.collect().map(_.getLong(0)).toSet

  private def checkInvariants(g: GraphFrame, mis: Set[Long]): Unit = {
    val edges = g.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(e => e._1 != e._2)
    // Independence: no edge inside the set.
    assert(edges.forall { case (s, d) => !(mis(s) && mis(d)) },
      s"edge inside MIS: $mis")
    // Maximality: every vertex outside has a neighbour inside.
    val vs = g.vertices.collect().map(_.getLong(0)).toSet
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    assert((vs -- mis).forall(v => nbrs.getOrElse(v, Set.empty).exists(mis)),
      s"non-maximal MIS: $mis")
  }

  test("mis: K5 yields exactly one vertex") {
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val g = graph(1L to 5L, k5)
    val mis = misOf(g)
    assert(mis.size === 1)
    checkInvariants(g, mis)
  }

  test("mis: empty graph — all vertices are the set") {
    val g = graph(Seq(1L, 2L, 3L), Seq.empty)
    assert(misOf(g) === Set(1L, 2L, 3L))
  }

  test("mis: path graph invariants") {
    val g = graph(1L to 6L, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    val mis = misOf(g)
    checkInvariants(g, mis)
    assert(mis.size >= 2 && mis.size <= 3)
  }

  test("mis: 6-cycle invariants") {
    val g = graph(0L to 5L, (0L to 5L).map(i => (i, (i + 1) % 6)))
    val mis = misOf(g)
    checkInvariants(g, mis)
    assert(mis.size >= 2 && mis.size <= 3)
  }

  test("mis: isolated vertices always join") {
    val g = graph(Seq(1L, 2L, 3L, 99L), Seq((1L, 2L), (2L, 3L)))
    val mis = misOf(g)
    assert(mis(99L))
    checkInvariants(g, mis)
  }

  test("session conf spark.graft.smallGraphThreshold flips the hybrid cutover") {
    // KCore reports iterations == 0 only on the driver-peel hybrid path.
    val g = graph(1L to 5L, Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(g.kCore.run().iterations === 0) // default threshold: driver peel
    spark.conf.set(graft.GraftConf.SmallGraphThresholdKey, "0")
    try {
      assert(g.kCore.run().iterations > 0) // session default: distributed
      // Builder setter still wins over the session conf.
      assert(g.kCore.smallGraphThreshold(1000000L).run().iterations === 0)
    } finally spark.conf.unset(graft.GraftConf.SmallGraphThresholdKey)
  }

  // ---------------- TriangleCount / LabelPropagation ----------------

  test("triangle count: triangle with tail and an isolated vertex") {
    val g = graph(Seq(1L, 2L, 3L, 4L, 5L, 9L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L)))
    val t = g.triangleCount.run().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L, 9L -> 0L))
  }

  test("triangle count: K4 has 3 per vertex; direction and duplicates ignored") {
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 3L))
    val g = graph(1L to 4L, k4)
    val t = g.triangleCount.run().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle count: degree-ordered orientation bounds hub wedges (10k-star)") {
    // A star is the worst case for min-id orientation: hub id 0 would own
    // all 10k edges and enumerate ~5*10^7 wedges. Degree orientation points
    // every leaf (degree 1) AT the hub, so each leaf has out-degree 1 and
    // the wedge count is ZERO — this test hangs, not fails, if the
    // orientation regresses.
    val n = 10000L
    val spark2 = spark
    import spark2.implicits._
    val edges = spark.range(1, n + 1).select(lit(0L).as("src"), col("id").as("dst"))
    val vertices = spark.range(0, n + 1).select(col("id"))
    val t0 = System.nanoTime()
    val t = GraphFrame(vertices, edges).triangleCount.run()
    assert(t.filter(col("triangles") =!= 0L).count() === 0L)
    assert(t.count() === n + 1)
    // Generous bound: the whole run is a handful of small joins. A wedge
    // explosion is two orders of magnitude slower.
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
  }

  test("triangle count: hub plus attached triangle stays exact under skew") {
    // 1000-star at vertex 0 plus triangle {1,2,3}. The hub is adjacent to
    // all three corners, so the graph has 4 triangles — {1,2,3} and
    // {0,i,j} for each corner pair — and every one of {0,1,2,3} sits in
    // exactly 3 of them: checks the (degree, id) orientation neither
    // double- nor zero-counts around a hub.
    val star = (1L to 1000L).map(i => (0L, i))
    val g = graph(0L to 1000L, star ++ Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val t = g.triangleCount.run().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t(0L) === 3L)
    assert(t(1L) === 3L && t(2L) === 3L && t(3L) === 3L)
    assert(t(500L) === 0L)
  }

  test("label propagation: 10k-star hub is safe under skew (bounded aggregate state)") {
    // A star hub aggregates its entire neighbourhood's labels each round.
    // With collect_list that is a 10k-element buffer shipped un-combined
    // through the shuffle; label_mode's histogram partials combine map-side
    // and late rounds collapse to a handful of distinct labels. The exact
    // synchronous trace is deterministic: round 1 hub<-mode(1..n)=1,
    // leaves<-0; the pair then oscillates with period 2, so after 4 rounds
    // hub=0 and every leaf=1.
    val n = 10000L
    val edges = spark.range(1, n + 1).select(lit(0L).as("src"), col("id").as("dst"))
    val vertices = spark.range(0, n + 1).select(col("id"))
    val g = GraphFrame(vertices, edges)
    val t0 = System.nanoTime()
    val res = g.labelPropagation.maxIterations(4).smallGraphThreshold(0).run()
      .vertices.select("id", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(0L) === 0L)
    assert(res(1L) === 1L && res(n) === 1L)
    assert(res.count(_._2 == 1L) === n)
    assert((System.nanoTime() - t0) / 1e9 < 120.0)
  }

  test("label propagation: two cliques bridged by one edge form two communities") {
    val clique = (base: Long) => for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (base + i, base + j)
    val g = graph((1L to 4L) ++ (11L to 14L), clique(1L) ++ clique(11L) :+ (4L, 11L))
    val labels = g.labelPropagation.maxIterations(8).run()
      .vertices.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap // id -> label
    assert(Set(1L, 2L, 3L).map(labels).size === 1) // core of clique A agrees
    assert(Set(12L, 13L, 14L).map(labels).size === 1) // core of clique B agrees
    assert(labels(1L) !== labels(12L)) // and the communities differ
  }

  test("mis: DISTRIBUTED rounds path keeps invariants (6-cycle + K5 + isolated)") {
    val g = graph(0L to 10L,
      (0L to 5L).map(i => (i, (i + 1) % 6)) ++
        (for (i <- 6L to 9L; j <- (i + 1) to 9L) yield (i, j)))
    val res = g.maximalIndependentSet.smallGraphThreshold(0).run()
    assert(res.iterations > 0) // hybrid fallback disabled: the rounds must run
    val mis = res.vertices.collect().map(_.getLong(0)).toSet
    assert(mis(10L)) // isolated vertex always joins
    checkInvariants(g, mis)
  }
}
