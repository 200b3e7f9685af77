package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * NO `rand()` anywhere: at 100 TB a train/val/test split must be a pure
  * function of the row KEY so it is stable under task retries, shuffles,
  * repartitioning, and incremental backfills (a re-ingested document lands
  * in the same split it was in last month), and reproducible by any other
  * engine auditing the pipeline. Both operators rank rows by the 60-bit
  * portable md5 hash ([[graft.functions.PortableHashes]] convention:
  * `('0x' || substr(md5(key), 1, 15))::BIGINT` in DuckDB,
  * `conv(substring(md5(key), 1, 15), 16, 10)` in Spark), which any
  * md5-capable engine can replay in plain SQL — that is what makes an
  * exact oracle possible.
  */
object Sampling {

  /** 2^60 as a double — the hash space size used for weight thresholds. */
  private val HashSpace = (1L << 60).toDouble

  /** 60-bit portable hash of `key` rendered as a string. Built-ins only —
    * stays inside whole-stage codegen, no custom kernel needed here.
    */
  def keyHash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** The integer hash threshold for a cumulative weight in [0, 1]: the
    * split boundary `floor(cum * 2^60)`. Public so oracle SQL can embed the
    * exact same constants the plan compares against.
    */
  def threshold(cum: Double): Long = (cum * HashSpace).toLong

  /** Assign every row to a named split by comparing its key hash against
    * cumulative integer thresholds — `hashSplit(df, "doc_id",
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`. The last split is
    * the unconditional `otherwise`, so weight rounding can never leave a
    * row unassigned. One projection, zero shuffles.
    */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    val h = keyHash60(col(keyCol))
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cums.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cum), rest) =>
        when(h < lit(threshold(cum)), lit(name)).otherwise(rest)
      }
    df.withColumn(outCol, assigned)
  }

  /** Deterministic k-per-stratum sample: the k rows with the SMALLEST key
    * hashes in each stratum — a rerun-stable "reservoir". Implemented with
    * the bounded-heap [[graft.functions.TopKByScore]] aggregate (score =
    * `-hash` as double, ties by key ascending): per-stratum state is O(k)
    * on the map side, the shuffle moves `strata x k` rows, and no sort or
    * window over the full corpus ever appears in the plan — the
    * scale-correct shape for sampling a 100 TB corpus.
    *
    * `keyCol` must be LONG (the heap's id slot); output is one
    * `(strataCol, keyCol)` row per sampled key.
    */
  def stratifiedTakeK(df: DataFrame, strataCol: String, keyCol: String,
      k: Int): DataFrame = {
    val h = keyHash60(col(keyCol))
    df.select(col(strataCol), col(keyCol).cast(LongType).as("__samp_id"),
        negate(h.cast(DoubleType)).as("__samp_score"))
      .groupBy(col(strataCol))
      .agg(graft.functions.TopKByScore
        .top_k_by_score(col("__samp_score"), col("__samp_id"), k).as("__tk"))
      .select(col(strataCol), explode(col("__tk.id")).as(keyCol))
  }
}
