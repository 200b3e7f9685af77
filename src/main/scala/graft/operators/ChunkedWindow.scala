package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Chunked trailing RANGE-frame windows — the scale form of
  * `PARTITION BY k ORDER BY ts RANGE BETWEEN frame PRECEDING AND CURRENT
  * ROW` when the partition key is LOW-cardinality (the q28 shape:
  * `event_type` has 5 values, so the naive window plan lands ALL rows of
  * a type in ONE task whose sort grows linearly with corpus size — a
  * single-task sort of tens of billions of rows per type at 100 TB).
  *
  * A trailing frame of width F only ever reaches F back in time, so time
  * chunks parallelize it exactly (the two-level discipline the repo's p08
  * prefix sum uses, applied to value frames): chunk the axis at width
  * `W >= F`, route every row to its own chunk plus — when it sits within
  * F of the chunk's right edge — a CARRY copy to the next chunk, and run
  * the SAME range window partitioned by `(keys..., chunk)`. For a row in
  * chunk c the frame `[ts-F, ts]` spans chunks {c-1, c} only, and the
  * partition holds exactly one copy of every such row (own rows of c,
  * carry rows of c-1's boundary strip) — so per-row aggregates equal the
  * global window's bit-for-bit while the work spreads over
  * `keys x nChunks` tasks instead of `keys`.
  *
  * COST MODEL: replication factor is `1 + F/W` (W = F doubles the rows;
  * the default W = 4F carries ~25% extra), against which the naive plan
  * pays an unbounded per-key sort. The carry filter keeps only the
  * boundary strip, so W trades replication (smaller W = more carry rows)
  * against parallelism (larger W = fewer chunks); both ends are safe —
  * correctness never depends on W (spec-pinned, and the oracle gate
  * replays the GLOBAL window).
  *
  * The own/carry routing is a single union of two projections of one
  * scan — map-only, no join; the one shuffle is the window's own
  * `(keys, chunk)` exchange, now high-cardinality. The carry-row filter
  * after the window references the non-partition `__cw_chunk` column, so
  * Catalyst cannot push it below the window (predicates only push through
  * Window on partition keys) — carry rows are scored and dropped, own
  * rows keep their exact frame aggregates.
  */
object ChunkedWindow {

  /** Run trailing-range aggregates over `df`, chunk-parallel.
    *
    * @param tsCol    BIGINT event-time column (any integer lattice)
    * @param keyCols  logical partition keys (may be low-cardinality —
    *                 that is the point)
    * @param frame    trailing frame width F: the window is
    *                 `RANGE BETWEEN F PRECEDING AND CURRENT ROW`
    * @param chunkWidth chunk width W >= F; default 4F
    * @param aggs     output columns over the supplied WindowSpec, e.g.
    *                 `w => Seq(count(lit(1)).over(w).as("n"))` — use ONLY
    *                 frame-respecting aggregates (count/sum/min/max/avg);
    *                 rank-style functions read peer ORDER, not the frame,
    *                 and would see carry rows
    * @return input columns plus the agg columns, one row per input row
    */
  def trailingRange(df: DataFrame, tsCol: String, keyCols: Seq[String],
      frame: Long, chunkWidth: Long = -1L)
      (aggs: WindowSpec => Seq[Column]): DataFrame = {
    require(frame >= 1, s"frame must be >= 1, got $frame")
    val w = if (chunkWidth == -1L) 4L * frame else chunkWidth
    require(w >= frame, s"chunkWidth $w must be >= frame $frame " +
      "(a frame spanning 3+ chunks would need multi-hop carries)")
    val ts = col(tsCol)
    // Integer floor-div via pmod + SQL `div` — exact on the long domain
    // (including negative timestamps). Spark's `/` on longs is a DOUBLE
    // divide: at nano-epoch magnitudes (~2^62, ulp 512) the rounded
    // quotient can truncate to q-1 and assign a row to the wrong chunk —
    // silent wrong frames, caught by review, now pinned by the huge-|ts|
    // rows in the spec. `ts - pmod(ts, W)` is an exact multiple of W, so
    // `div` truncation never bites. (Only |ts| within W of Long.MinValue
    // could overflow the subtraction — outside any real time lattice.)
    def chunkOf(t: Column): Column =
      call_function("div", t - pmod(t, lit(w)), lit(w))
    val own = df.withColumn("__cw_chunk", chunkOf(ts))
      .withColumn("__cw_wchunk", col("__cw_chunk"))
    // Carry copies: only the chunk's right boundary strip [Wc+W-F, Wc+W)
    // can fall inside a next-chunk row's frame.
    val carry = df.filter(pmod(ts, lit(w)) >= lit(w - frame))
      .withColumn("__cw_chunk", chunkOf(ts))
      .withColumn("__cw_wchunk", chunkOf(ts) + lit(1L))
    val spec = Window
      .partitionBy((keyCols :+ "__cw_wchunk").map(col): _*)
      .orderBy(ts).rangeBetween(-frame, 0)
    own.unionByName(carry)
      .select(df.columns.map(col) ++ Seq(col("__cw_chunk"),
        col("__cw_wchunk")) ++ aggs(spec): _*)
      .filter(col("__cw_wchunk") === col("__cw_chunk"))
      .drop("__cw_chunk", "__cw_wchunk")
  }
}
