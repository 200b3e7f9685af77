package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators for the training-data pipeline. The
  * reference engine is batch-only ("out-of-core" = disk-spilled batch, no
  * streams — SURVEY §2 "Streaming"); these extend the engine to continuous
  * ingestion, reusing the SAME column formulas as the batch operators so a
  * pipeline can run identically in either mode.
  *
  * All operators are watermark-bounded: state is dropped once event time
  * passes the lateness bound, so memory stays O(active window), not O(stream).
  */
object Streams {

  /** Streaming exact dedup: one output row per first-seen fingerprint
    * (md5 of `textCol`), duplicates within the lateness window dropped.
    * State: one fingerprint per distinct doc inside the watermark horizon.
    */
  def streamingExactDedup(
      stream: DataFrame, tsCol: String, textCol: String,
      lateness: String = "10 minutes"): DataFrame =
    stream
      .withColumn("fingerprint", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicates("fingerprint")

  /** Sliding-window event counts + value sums per event type.
    * Late data beyond `lateness` is dropped; windows emit once finalized
    * (append mode) or continuously (update mode) — caller's choice of sink.
    */
  def windowedEventStats(
      stream: DataFrame, tsCol: String, typeCol: String,
      window: String = "1 hour", slide: String = "15 minutes",
      lateness: String = "30 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window, slide),
        col(typeCol))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("value_sum"))
      .select(
        col("window.start").as("window_start"), col("window.end").as("window_end"),
        col(typeCol), col("cnt"), col("value_sum"))

  /** Streaming quality filter: the batch text-quality formula applied to a
    * document stream — rows below `minQuality` are dropped at ingest, before
    * any stateful stage. Demonstrates batch/stream operator reuse.
    */
  def qualityFilter(stream: DataFrame, textCol: String, minQuality: Double): DataFrame =
    stream.withColumn("quality", graft.text.TextFunctions.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
}
