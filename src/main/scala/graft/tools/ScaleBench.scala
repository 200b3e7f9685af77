package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.GraphFrame

/** Distributed-path scale probe: WCC and k-core on a seeded synthetic
  * random graph (xxhash64-derived endpoints, Erdos-Renyi-ish), far above
  * the hybrid small-graph threshold — evidence the iterative loops hold
  * when the driver fallback cannot apply. Usage:
  * `runMain graft.tools.ScaleBench [nVertices] [nEdges] [algo]`.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1L << 22)  // 4.2M vertices
    val m = args.lift(1).map(_.toLong).getOrElse(1L << 24)  // 16.8M edges
    val algo = args.lift(2).getOrElse("wcc")
    val threshold = args.lift(3).map(_.toLong).getOrElse(0L) // 0 = force distributed
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Uniform Erdos-Renyi-ish endpoints; `-skew` algo variants draw the
    // dst from a power-law-ish transform (u^4 concentrates mass near 0, so
    // low-id vertices become hubs — top vertex degree ≈ m·n^(-1/4), ~370 k
    // at the defaults): the adversarial shape for per-vertex aggregation
    // state and wedge enumeration.
    val skew = algo.endsWith("-skew")
    val u = pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).cast("double") / lit(1000000.0)
    val dstCol =
      if (skew) (pow(u, 4.0) * n).cast("long")
      else pmod(xxhash64(col("id"), lit(2)), lit(n))
    val edges = spark.range(m).select(
      pmod(xxhash64(col("id"), lit(1)), lit(n)).as("src"),
      dstCol.as("dst"))
    val vertices = spark.range(n).select(col("id"))
    val g = GraphFrame(vertices, edges)

    val t0 = System.nanoTime()
    algo match {
      case "wcc" =>
        val r = g.connectedComponents.smallGraphThreshold(threshold).run()
        val comps = r.components.select(countDistinct("component")).head.getLong(0)
        println(f"SCALE-OK wcc n=$n m=$m thr=$threshold iters=${r.iterations} components=$comps sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "kcore" | "kcore-skew" =>
        val r = g.kCore.smallGraphThreshold(0).run()
        val maxCore = r.vertices.select(max("kcore")).head.getLong(0)
        println(f"SCALE-OK $algo n=$n m=$m iters=${r.iterations} maxCore=$maxCore sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "kcore-copart" =>
        val r = g.kCore.smallGraphThreshold(0).withCoPartitionedState().run()
        val maxCore = r.vertices.select(max("kcore")).head.getLong(0)
        println(f"SCALE-OK kcore-copart n=$n m=$m iters=${r.iterations} maxCore=$maxCore sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "pagerank" =>
        val r = g.pageRank.maxIterations(10).run()
        val cnt = r.ranks.count()
        println(f"SCALE-OK pagerank n=$n m=$m iters=${r.iterations} rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "mis" =>
        val r = g.maximalIndependentSet.smallGraphThreshold(0).run()
        val size = r.vertices.count()
        println(f"SCALE-OK mis n=$n m=$m iters=${r.iterations} size=$size sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "triangles" | "triangles-skew" =>
        val t = g.triangleCount.run()
        val total = t.agg(sum("triangles")).head.getLong(0)
        println(f"SCALE-OK $algo n=$n m=$m total=$total sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
