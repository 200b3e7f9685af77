package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, so 100 TB
  * of media shares the same partitioning/shuffle/pushdown machinery as text.
  *
  * Spark-side design is real and tested (schema, batched partition-level
  * processing, deterministic output); ONLY the codec calls are stubbed —
  * this container has no image/audio libraries, so `decodeStub` derives
  * features from the raw bytes deterministically where a real implementation
  * would call the decoder. Swap points are marked `REAL-CODEC`.
  */
object Multimodal {

  /** Canonical media schema: `[media_id, content binary, meta struct]`. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("checksum", StringType, nullable = true))), nullable = true)))

  /** Wrap any (id, string-payload) frame into the media schema: payload →
    * UTF-8 bytes + metadata (mime, size, md5). Pure Column ops — codegen'd.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      struct(
        lit(mime).as("mime"),
        length(encode(col(payloadCol), "UTF-8")).cast(LongType).as("n_bytes"),
        md5(encode(col(payloadCol), "UTF-8")).as("checksum")).as("meta"))

  private val histBins = 16

  /** REAL-CODEC: replace with an actual image/audio decode + model feature
    * extractor. The stub computes a 16-bin byte histogram normalized to
    * sum 1 — deterministic, shape-identical to a real feature vector.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val h = new Array[Double](histBins)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) / (256 / histBins)) += 1.0; i += 1 }
      var j = 0
      while (j < histBins) { h(j) /= bytes.length; j += 1 }
    }
    h
  }

  /** Feature extraction over media rows, batched per partition (the shape a
    * GPU/codec worker needs: one library init per partition, streaming
    * iterator, no per-row overhead). Output `[media_id, features
    * array<double>, n_bytes]`.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      // REAL-CODEC: initialize the decoder/model ONCE per partition here.
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), decodeStub(bytes).toSeq, bytes.length.toLong)
      }
    }(encoder)
  }

  /** Frame sampling: pick `n` evenly-strided fixed-size blocks from the
    * payload (stand-in for video frame extraction; REAL-CODEC would seek
    * keyframes). Pure Column ops: `[media_id, frame_idx, frame binary]`.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 64): DataFrame = {
    val total = coalesce(length(col("content")).cast(LongType), lit(0L))
    // Integer stride (Column./ on longs is double division — floor it back).
    val stride = greatest(
      floor((total - lit(frameBytes)) / lit(math.max(n - 1, 1))).cast(LongType), lit(1L))
    media.select(col("media_id"), col("content"), total.as("tot"), stride.as("stride"))
      .filter(col("tot") >= frameBytes)
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"), col("stride"))
      .filter(col("frame_idx") * col("stride") + frameBytes <= col("tot"))
      .select(col("media_id"), col("frame_idx").cast(LongType).as("frame_idx"),
        col("content")
          .substr((col("frame_idx") * col("stride") + 1).cast("int"), lit(frameBytes))
          .as("frame"))
  }
}
