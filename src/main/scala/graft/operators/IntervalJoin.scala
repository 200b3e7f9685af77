package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, binned — the scale-correct form of
  * `p.t >= i.start AND p.t < i.end`: written as a raw theta-join Spark
  * plans a broadcast-nested-loop (or cartesian) that scores EVERY
  * (point, interval) pair — O(n·m), the classic range-join trap. Binning
  * makes it an equi-join: the time axis splits into fixed `binWidth`
  * buckets, each interval registers in every bucket it overlaps
  * (bounded replication: `len/binWidth + 1` rows), each point maps to
  * exactly ONE bucket, and the equi-join on (keys..., bucket) meets every
  * candidate pair exactly once — the point's bucket — so there are NO
  * duplicate pairs and no dedup pass. The exact predicate then refines
  * the bucket's candidates.
  *
  * `binWidth` is the knob: replication is `ceil(len/binWidth)+1` per
  * interval while a bucket's candidate count grows with `binWidth`; set
  * it near the MEDIAN interval length (replication ≈ 2 and buckets stay
  * selective). Exchange volume is points + replicated intervals — never
  * the pair count.
  *
  * Semantics: half-open `[start, end)`; empty/inverted intervals match
  * nothing; NULL times/bounds drop (they fail any range predicate — the
  * SQL contract, and the inner equi-join enforces it for free). The
  * trunc-division bucketing is monotone, so coverage holds on negative
  * axes too — but both engines must share the SAME division (Spark `div`
  * == DuckDB `//` only on the non-negative domain; the gates run on
  * nanos, which are non-negative).
  */
object IntervalJoin {

  /** All (point, interval) pairs with equal `keyCols` and `pointTime` in
    * `[startCol, endCol)`. Column sets of the two frames must be
    * disjoint apart from `keyCols`; output = point columns ++ interval
    * columns (keys once).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTime: String, startCol: String, endCol: String,
      binWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val ip = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__ij_bin",
        explode(sequence(expr(s"`$startCol` div ${binWidth}L"),
          expr(s"(`$endCol` - 1) div ${binWidth}L"))))
    val pp = points
      .withColumn("__ij_bin", expr(s"`$pointTime` div ${binWidth}L"))
    pp.join(ip, keyCols :+ "__ij_bin")
      .filter(col(startCol) <= col(pointTime) &&
        col(pointTime) < col(endCol))
      .drop("__ij_bin")
  }
}
