package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.graph.GraphFrame

/** Landmark-sampled harmonic centrality — the classic scalable estimator
  * (Boldi & Vigna's probe-based family): run ONE multi-landmark BFS
  * ([[ShortestPaths]], all landmarks in a single Pregel pass with one
  * dist column each) and score every vertex by the reciprocal-distance sum
  * over the probes it reaches. Full harmonic centrality sums over ALL
  * sources — O(n·m) and hopeless at scale; `|landmarks| = O(100)` hash-
  * chosen probes estimate it with relative error ~1/sqrt(|landmarks|),
  * and the BFS cost stays one Pregel run with a `|landmarks|`-wide state
  * vector.
  *
  * The per-term value is the exact integer `1_000_000 div d` (micro-
  * lattice, like every engine-portable float-free score in this repo), so
  * the g21 oracle replays the whole estimate in BIGINT SQL off a
  * recursive-CTE BFS. Unreached landmarks (the i32-∞ sentinel) and the
  * landmark's own vertex (d = 0) contribute nothing.
  *
  * Output: `[id, h_micros, n_reached]` for every vertex.
  */
object HarmonicCentrality {

  def run(edges: DataFrame, landmarks: Seq[Long], maxIter: Int): DataFrame = {
    require(landmarks.nonEmpty, "at least one landmark")
    require(landmarks.distinct == landmarks,
      s"duplicate landmarks double-count their reciprocal terms: $landmarks")
    val sp = GraphFrame.fromEdges(edges)
      .shortestPaths(landmarks).maxIterations(maxIter).run()
      .vertices
    val inf = Int.MaxValue.toLong
    val terms = landmarks.map { lm =>
      val d = col(s"dist_$lm").cast(LongType)
      (when(d > 0L && d < inf, expr(s"1000000 div CAST(dist_$lm AS BIGINT)"))
        .otherwise(0L),
        when(d > 0L && d < inf, 1L).otherwise(0L))
    }
    sp.select(col("id"),
      terms.map(_._1).reduce(_ + _).as("h_micros"),
      terms.map(_._2).reduce(_ + _).as("n_reached"))
  }
}
