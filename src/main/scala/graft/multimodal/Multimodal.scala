package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, so 100 TB
  * of media shares the same partitioning/shuffle/pushdown machinery as text.
  *
  * Spark-side design is real and tested (schema, batched partition-level
  * processing, deterministic output). PNG decode/resize (`javax.imageio`)
  * and WAV PCM decode (`javax.sound.sampled`) are REAL pure-JDK codec
  * paths; the VIDEO tier is real end to end for MP4 with image-codec
  * frames: ISO BMFF box parse ([[extractMp4Meta]]), sample-table seek
  * plan ([[extractMp4SampleTable]]), per-sample pread
  * ([[extractMp4Samples]]) and frame decode ([[decodeMp4Frames]], the
  * MJPEG shape — `javax.imageio` standing in for the video codec this
  * container lacks). Only NON-image video codecs (H.264 et al.) remain
  * stubbed: `decodeStub` derives features from raw bytes
  * deterministically where a real implementation would call the decoder.
  * Swap points are marked `REAL-CODEC`.
  */
object Multimodal {

  // Keep every ImageIO.read(InputStream) in memory: with the default
  // use-cache=true each call wraps the stream in a FileCacheImageInputStream
  // — a temp FILE created and deleted per frame. The many-tiny-samples
  // containers the lazy sampleWalk is hardened against would churn executor
  // disk per sample (and fail outright on an unwritable tmp dir); decode
  // inputs here are already in-heap byte arrays, so the file cache buys
  // nothing. JVM-global, set once per executor at class load.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL-CODEC (non-MP4 video mimes and unknown payloads only): replace
    * with an actual decode + model feature extractor. The stub computes a
    * 16-bin byte histogram normalized to sum 1 — deterministic,
    * shape-identical to a real feature vector. `image/png` does NOT take
    * this path — it gets a real `javax.imageio` decode in
    * [[pngPixelHistogram]] — nor does `audio/wav` (`javax.sound.sampled`
    * in [[wavSampleHistogram]]), nor `video/mp4`, whose frames go through
    * the full container-walk → pread → image-decode chain in
    * [[mp4FramePixelHistogram]] (m14).
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

  /** REAL codec path: decode a PNG with `javax.imageio` and histogram the
    * DECODED grayscale pixel values (16 bins, normalized to sum 1). Raw
    * PNG bytes are a deflate stream whose byte histogram looks nothing
    * like the pixel distribution, so the m04 oracle (which computes the
    * pixel histogram from the synthesis formula in SQL) passes only if
    * this decode is actually correct. Undecodable/empty payloads yield
    * the zero vector, matching the stub's empty-input behavior.
    */
  private[multimodal] def pngPixelHistogram(bytes: Array[Byte]): Array[Double] = {
    val h = new Array[Double](histBins)
    if (bytes == null || bytes.isEmpty) return h
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (decoded == null) return h
    val n = grayCounts(decoded, h)
    var j = 0
    while (j < histBins) { h(j) /= n.toDouble; j += 1 }
    h
  }

  /** Accumulate the UNNORMALIZED grayscale-pixel bin counts of a decoded
    * image into `h`; returns the pixel count. Shared by the single-image
    * normalizer ([[pngPixelHistogram]]) and the multi-frame video
    * aggregate ([[mp4FramePixelHistogram]]), which must accumulate counts
    * across frames before normalizing once.
    */
  private def grayCounts(decoded: java.awt.image.BufferedImage,
      h: Array[Double]): Long = {
    val img = toByteGray(decoded)
    val raster = img.getRaster
    val (w, ht) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < ht) {
      var x = 0
      while (x < w) {
        h((raster.getSample(x, y, 0) & 0xff) / (256 / histBins)) += 1.0
        x += 1
      }
      y += 1
    }
    w.toLong * ht
  }

  /** Synthesize a deterministic 8-bit grayscale PNG: pixel(x,y) =
    * (7x + 13y + id) mod 256, encoded with `javax.imageio`. PNG is
    * lossless, so decoding recovers these exact values — which makes the
    * pixel statistics a pure SQL-expressible function of (id, w, h): the
    * m04 oracle replays them without ever touching a decoder.
    */
  def synthesizeGrayPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, (java.lang.Math.floorMod(7L * x + 13L * y + id, 256L)).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** REAL codec path: decode a WAV container with `javax.sound.sampled`
    * (pure JDK — header parse, format negotiation, frame extraction) and
    * histogram the DECODED 16-bit signed samples: 16 bins over
    * `(sample + 32768) / 4096`, normalized to sum 1. Raw WAV bytes carry a
    * 44-byte RIFF header and little-endian sample packing, so the m06
    * oracle (which replays the synthesis formula in SQL) passes only if
    * the container is actually parsed and the samples actually decoded —
    * the same only-a-correct-decode-matches construction as the PNG gate.
    * Undecodable/empty/non-16-bit payloads yield the zero vector — that
    * includes corrupt-but-recognized containers (e.g. a truncated RIFF
    * header that passes `getAudioInputStream` but throws `IOException`
    * mid-decode): junk bytes degrade one row, never the job, matching the
    * PNG junk-payload behavior.
    */
  private[multimodal] def wavSampleHistogram(bytes: Array[Byte]): Array[Double] = {
    val h = new Array[Double](histBins)
    if (bytes == null || bytes.isEmpty) return h
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => return h
        case _: java.io.IOException                               => return h
      }
    try {
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return h
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      if (n == 0) return h
      var i = 0
      while (i < n) {
        val lo = pcm(2 * i) & 0xff
        val hi = pcm(2 * i + 1).toInt // sign-carrying high byte
        val sample = (hi << 8) | lo   // signed 16-bit, LE unless flagged
        val s = if (fmt.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
                else sample
        h((s + 32768) / (65536 / histBins)) += 1.0
        i += 1
      }
      var j = 0
      while (j < histBins) { h(j) /= n; j += 1 }
      h
    } catch {
      case _: java.io.IOException => new Array[Double](histBins)
    } finally in.close()
  }

  /** Synthesize a deterministic 16-bit PCM mono WAV: sample(i) =
    * `((31 i + 17 id) mod 65536) - 32768`, encoded through
    * `javax.sound.sampled` (real RIFF container, little-endian frames).
    * PCM is lossless, so decoding recovers these exact values — sample
    * statistics are a pure SQL-expressible function of (id, n): the m06
    * oracle replays them without touching the audio stack.
    */
  def synthesizeWav(id: Long, nSamples: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = java.lang.Math.floorMod(31L * i + 17L * id, 65536L).toInt - 32768
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** One media-schema frame of per-id synthesized payloads — the shared
    * wrapper behind every `synthesize*Media` (synthesis + MD5 run per
    * partition, no driver loop). ONE copy on purpose: the Row framing and
    * checksum convention must not drift between media types.
    */
  private def synthMedia(df: DataFrame, idCol: String, mime: String)(
      synth: Long => Array[Byte]): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = synth(id)
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(payload).map("%02x".format(_)).mkString
        Row(id, payload, Row(mime, payload.length.toLong, md5hex))
      }
    }(encoder)
  }

  /** A media-schema frame of synthesized WAVs, one per input id — the audio
    * analogue of [[synthesizePngMedia]]; encoding runs per partition.
    */
  def synthesizeWavMedia(df: DataFrame, idCol: String, nSamples: Int): DataFrame =
    synthMedia(df, idCol, "audio/wav")(synthesizeWav(_, nSamples))

  /** A media-schema frame of synthesized grayscale PNGs, one per input id —
    * the PNG analogue of [[asMedia]]; encoding runs per partition (one
    * ImageIO context per task, no driver loop).
    */
  def synthesizePngMedia(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame =
    synthesizePngMediaDyn(df, idCol, lit(w), lit(h))

  /** REAL resize: decode the PNG, nearest-neighbour resample to `w`×`h`,
    * re-encode — a full decode→transform→encode chain through the actual
    * codec, per partition. Nearest-neighbour (`src(x·sw/dw, y·sh/dh)`,
    * integer floor) is chosen over interpolation precisely so the output
    * pixels are an EXACT function of the input pixels — which is what lets
    * the m05 oracle replay a resize of the synthesized corpus in pure SQL.
    * Single-band (grayscale) rasters; undecodable payloads pass through
    * unchanged with a NULL content so downstream stages see the failure.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val img = if (bytes.isEmpty) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Row(r.getLong(0), null, Row("image/png", 0L, null))
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val src = img.getRaster
          val dst = out.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              dst.setSample(x, y, 0, src.getSample(x * sw / w, y * sh / h, 0))
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          val png = baos.toByteArray
          val md5hex = java.security.MessageDigest.getInstance("MD5").digest(png)
            .map("%02x".format(_)).mkString
          Row(r.getLong(0), png, Row("image/png", png.length.toLong, md5hex))
        }
      }
    }(encoder)
  }

  /** Feature extraction over media rows, batched per partition (the shape a
    * GPU/codec worker needs: one library init per partition, streaming
    * iterator, no per-row overhead). `image/png` content is REALLY decoded
    * (`javax.imageio`) and histogrammed over pixel values; `audio/wav` is
    * REALLY decoded (`javax.sound.sampled`) and histogrammed over PCM
    * samples; remaining mimes (video) take the byte-histogram stub. Output
    * `[media_id, features array<double>, n_bytes]`.
    */
  /** Re-draw into 8-bit single-band grayscale unless the decode already is
    * one — shared by the histogram and perceptual-hash paths so both read
    * proper luminance, never the low byte of a 16-bit sample or one RGB
    * channel.
    */
  private def toByteGray(decoded: java.awt.image.BufferedImage): java.awt.image.BufferedImage =
    if (decoded.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY &&
        decoded.getRaster.getNumBands == 1) decoded
    else {
      val gray = new java.awt.image.BufferedImage(
        decoded.getWidth, decoded.getHeight,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = gray.createGraphics()
      try g.drawImage(decoded, 0, 0, null) finally g.dispose()
      gray
    }

  /** Average-hash (aHash) bits of a PNG payload: REAL decode, nearest-
    * neighbour 8x8 downsample (the same `x*sw/8` stride arithmetic as
    * [[resizeImages]]), then one bit per cell — set iff the cell EXCEEDS
    * the 64-cell mean. The threshold compares `p*64 > sum` in integers, so
    * there is no mean-rounding convention for an oracle to disagree with.
    * Returned as the 64-char '0'/'1' string in (y, x) raster order —
    * portable across engines where a 64-bit integer would fight sign-bit
    * and shift-overflow conventions. NULL for undecodable payloads.
    */
  private[multimodal] def pngAHashBits(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return null
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (decoded == null) return null
    val img = toByteGray(decoded)
    val raster = img.getRaster
    val (sw, sh) = (img.getWidth, img.getHeight)
    val p = new Array[Long](64)
    var sum = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val v = (raster.getSample(x * sw / 8, y * sh / 8, 0) & 0xff).toLong
        p(y * 8 + x) = v
        sum += v
        x += 1
      }
      y += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) { sb.append(if (p(i) * 64L > sum) '1' else '0'); i += 1 }
    sb.toString
  }

  /** Perceptual hash per media row: `[media_id, phash]` (64-char aHash bit
    * string, NULL when undecodable). The image-side member of the dedup
    * family — identical content hashes equal under re-encode, and
    * near-identical content differs in few bits (Hamming distance on the
    * bit string). One narrow mapPartitions over the payloads: no shuffle;
    * the downstream groupBy-phash bucket join is vocabulary-sized.
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", StringType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), pngAHashBits(bytes))
      }
    }(encoder)
  }

  /** 16-bit mono PCM samples from a WAV payload through the REAL
    * `javax.sound.sampled` decode (same container/format policy as
    * [[wavSampleHistogram]]); null for undecodable/unsupported payloads.
    */
  private def wavPcmSamples(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null || bytes.isEmpty) return null
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => return null
        case _: java.io.IOException                               => return null
      }
    try {
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return null
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      if (n == 0) return null
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val lo = pcm(2 * i) & 0xff
        val hi = pcm(2 * i + 1).toInt
        out(i) = if (fmt.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
                 else (hi << 8) | lo
        i += 1
      }
      out
    } catch {
      case _: java.io.IOException => null
    } finally in.close()
  }

  /** Frame-energy fingerprint: samples split into `frames` balanced frames
    * (`frame(i) = i * frames / n` — integer math any engine replays); each
    * frame contributes its 12-bit-quantized share of the total absolute
    * amplitude, `(energy_f * 4096) // total`, zero-padded to 4 digits.
    * All-integer, so the profile string is exact across engines; equal
    * audio ⇒ equal profile, and near-equal audio collides at the
    * quantization granularity (the perceptual-bucket property).
    */
  private[multimodal] def wavEnergyProfile(bytes: Array[Byte], frames: Int): String = {
    val s = wavPcmSamples(bytes)
    if (s == null) return null
    val e = new Array[Long](frames)
    var total = 0L
    var i = 0
    while (i < s.length) {
      val a = math.abs(s(i).toLong)
      e((i.toLong * frames / s.length).toInt) += a
      total += a
      i += 1
    }
    if (total == 0L) return "0000" * frames
    val sb = new java.lang.StringBuilder(4 * frames)
    var f = 0
    while (f < frames) { sb.append("%04d".format(e(f) * 4096L / total)); f += 1 }
    sb.toString
  }

  /** Audio fingerprint per media row: `[media_id, afp]` (the
    * `4*frames`-char quantized energy profile, NULL when undecodable) —
    * the audio member of the perceptual-dedup family next to
    * [[perceptualHash]]. Same shape: one narrow mapPartitions over
    * payloads (the decode IS the work; no Catalyst expression fits a
    * codec), downstream equality buckets are vocabulary-sized.
    */
  def wavEnergyFingerprint(media: DataFrame, frames: Int = 8): DataFrame = {
    require(frames >= 2 && frames <= 64, s"frames out of range: $frames")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("afp", StringType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), wavEnergyProfile(bytes, frames))
      }
    }(encoder)
  }

  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"), col("meta.mime").as("mime"))
      .mapPartitions { rows =>
        // REAL-CODEC: initialize heavier decoders/models ONCE per partition
        // here (ImageIO is stateless, so PNG needs no init).
        rows.map { r =>
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val feats =
            if (!r.isNullAt(2) && r.getString(2) == "image/png") pngPixelHistogram(bytes)
            else if (!r.isNullAt(2) && r.getString(2) == "audio/wav") wavSampleHistogram(bytes)
            else if (!r.isNullAt(2) && r.getString(2) == "video/mp4") mp4FramePixelHistogram(bytes)
            else decodeStub(bytes)
          Row(r.getLong(0), feats.toSeq, bytes.length.toLong)
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

  /** [[synthesizePngMedia]] with PER-ROW dimensions (w/h as Columns): the
    * m10 gate varies image size by id so the IHDR parse has non-constant
    * fields to recover.
    */
  def synthesizePngMediaDyn(df: DataFrame, idCol: String,
      wCol: org.apache.spark.sql.Column,
      hCol: org.apache.spark.sql.Column): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast(LongType), wCol.cast("int"), hCol.cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val png = synthesizeGrayPng(id, r.getInt(1), r.getInt(2))
          val md5hex = java.security.MessageDigest.getInstance("MD5").digest(png)
            .map("%02x".format(_)).mkString
          Row(id, png, Row("image/png", png.length.toLong, md5hex))
        }
      }(encoder)
  }

  /** REAL container parse, image side (the [[extractMp4Meta]] twin): walk
    * the PNG chunk list — 8-byte signature, then length/type/data/CRC
    * frames — and big-endian-decode IHDR for width/height/bit depth/color
    * type. The metadata tier of an image-curation pass: dimensions and
    * pixel format cost ~33 header bytes per file and prune (thumbnails,
    * monochrome, absurd aspect ratios) before any pixel decode is
    * scheduled. Malformed payloads yield NULL fields. Output
    * `[media_id, width, height, bit_depth, color_type]`.
    */
  def extractPngMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("bit_depth", LongType, nullable = true),
      StructField("color_type", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        parsePngIhdr(bytes) match {
          case Some((w, h, bd, ct)) => Row(r.getLong(0), w, h, bd, ct)
          case None => Row(r.getLong(0), null, null, null, null)
        }
      }
    }(encoder)
  }

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Chunk walk: the signature must match, every chunk frame must fit, and
    * the FIRST chunk must be IHDR (the PNG spec's requirement) — returns
    * (width, height, bitDepth, colorType) or None.
    */
  private[graft] def parsePngIhdr(
      bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    if (!bytes.take(8).sameElements(PngSig)) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    // Validate the whole chunk list: each frame is 4 len + 4 type + data
    // + 4 crc; the stream must end exactly at a boundary.
    var off = 8
    var first: String = null
    while (off < bytes.length) {
      if (off + 8 > bytes.length) return None
      val len = u32(off)
      if (off + 12 + len > bytes.length) return None
      if (first == null) first = new String(bytes, off + 4, 4, "US-ASCII")
      off += 12 + len.toInt
    }
    if (first != "IHDR" || u32(8) < 13) return None
    Some((u32(16), u32(20), (bytes(24) & 0xff).toLong, (bytes(25) & 0xff).toLong))
  }

  /** Synthesize a deterministic minimal ISO BMFF (MP4) container: `ftyp`
    * (major brand `isom`) + `moov`>`mvhd` v0 carrying
    * `timescale = 600 + (id mod 10)*100` and
    * `duration = (id*37) mod 100000 + 600` + an `mdat` of
    * `(id mod 32) + 4` filler bytes (`(7i + id) mod 256`). Every byte is
    * a pure function of `id`, so the m09 oracle replays the extracted
    * metadata in plain SQL — while the engine must actually walk the box
    * tree and big-endian-decode the mvhd fields to recover it.
    */
  def synthesizeMp4(id: Long): Array[Byte] =
    buildMp4(id, trak = None, mdat = mp4Filler(id, mdatFillerLen(id)))

  private def mdatFillerLen(id: Long): Int =
    (java.lang.Math.floorMod(id, 32L)).toInt + 4

  /** `(7p + id) mod 256` filler — the byte formula every MP4 oracle
    * replays (m09's mdat, m12's per-sample sums).
    */
  private def mp4Filler(id: Long, len: Int): Array[Byte] =
    Array.tabulate(len)(p =>
      (java.lang.Math.floorMod(7L * p + id, 256L)).toByte)

  /** ONE writer for the synthetic ISO BMFF layout (ftyp + moov>mvhd v0
    * [+ trak>mdia>minf>stbl] + mdat) shared by every MP4 synthesizer —
    * the byte layout is spec-pinned (m09/m11/m12/m13 parse round-trips
    * index into fixed offsets), so it must not drift between variants.
    * `trak` carries (sampleSizes, chunkOffsets); `stsc` optionally adds
    * a sample-to-chunk run table (first_chunk, samples_per_chunk) after
    * stts; stts always writes the two-run form `(n-1) x delta, 1 x 100`
    * with `delta = (id mod 5)+1`.
    */
  /** The spec-pinned layout constants in ONE place: box sizes of the
    * synthetic trak chain and the resulting in-file mdat payload offset —
    * shared by [[buildMp4]] (which writes them) and the synthesizers that
    * must pre-compute real stco offsets ([[synthesizeMp4Frames]],
    * [[synthesizeMp4Chunks]]); a drifted copy would write stco pointing
    * at the wrong mdat bytes and fail only at oracle time.
    */
  private def mp4StscSz(nRuns: Int): Int =
    if (nRuns > 0) 16 + 12 * nRuns else 0
  private def mp4TrakSz(n: Int, nc: Int, nRuns: Int): Int =
    100 + 4 * n + 4 * nc + mp4StscSz(nRuns)
  private def mp4PayloadOffset(n: Int, nc: Int, nRuns: Int): Int =
    16 + (8 + 108 + mp4TrakSz(n, nc, nRuns)) + 8

  private[graft] def buildMp4(id: Long, trak: Option[(Array[Int], Array[Int])],
      mdat: Array[Byte],
      stsc: Option[Array[(Int, Int)]] = None): Array[Byte] = {
    val ts = 600 + (java.lang.Math.floorMod(id, 10L)).toInt * 100
    val dur = (java.lang.Math.floorMod(id * 37L, 100000L)).toInt + 600
    val stscSz = mp4StscSz(stsc.map(_.length).getOrElse(0))
    val trakSz = trak.map { case (sizes, offsets) =>
      mp4TrakSz(sizes.length, offsets.length, stsc.map(_.length).getOrElse(0))
    }.getOrElse(0)
    val moovSz = 8 + 108 + trakSz
    val buf = java.nio.ByteBuffer.allocate(16 + moovSz + 8 + mdat.length)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
    buf.putInt(moovSz).put("moov".getBytes("US-ASCII"))
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)           // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(ts).putInt(dur)
      .putInt(0x00010000)  // rate 1.0
      .putShort(0x0100.toShort) // volume 1.0
      .putShort(0).putInt(0).putInt(0) // reserved 2+8
      .putInt(0x00010000).putInt(0).putInt(0) // unity matrix
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // pre_defined
      .putInt(2)           // next_track_id
    trak.foreach { case (sizes, offsets) =>
      val n = sizes.length
      val delta = (java.lang.Math.floorMod(id, 5L)).toInt + 1
      val sttsSz = 16 + 2 * 8
      val stszSz = 20 + n * 4
      val stcoSz = 16 + offsets.length * 4
      val stblSz = 8 + sttsSz + stscSz + stszSz + stcoSz
      buf.putInt(trakSz).put("trak".getBytes("US-ASCII"))
      buf.putInt(trakSz - 8).put("mdia".getBytes("US-ASCII"))
      buf.putInt(trakSz - 16).put("minf".getBytes("US-ASCII"))
      buf.putInt(stblSz).put("stbl".getBytes("US-ASCII"))
      buf.putInt(sttsSz).put("stts".getBytes("US-ASCII"))
        .putInt(0).putInt(2)
        .putInt(n - 1).putInt(delta)
        .putInt(1).putInt(100)
      stsc.foreach { runs =>
        buf.putInt(stscSz).put("stsc".getBytes("US-ASCII"))
          .putInt(0).putInt(runs.length)
        runs.foreach { case (first, spc) =>
          buf.putInt(first).putInt(spc).putInt(1) // sample_description_index
        }
      }
      buf.putInt(stszSz).put("stsz".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(n)
      sizes.foreach(buf.putInt)
      buf.putInt(stcoSz).put("stco".getBytes("US-ASCII"))
        .putInt(0).putInt(offsets.length)
      offsets.foreach(buf.putInt)
    }
    buf.putInt(8 + mdat.length).put("mdat".getBytes("US-ASCII")).put(mdat)
    buf.array()
  }

  /** A media-schema frame of synthesized MP4 containers — the video
    * analogue of [[synthesizePngMedia]]; encoding runs per partition.
    */
  def synthesizeMp4Media(df: DataFrame, idCol: String): DataFrame =
    synthMedia(df, idCol, "video/mp4")(synthesizeMp4)

  /** REAL container parse (the video path's metadata tier): walk the ISO
    * BMFF box tree — big-endian u32 size + 4CC per box, recursing into
    * `moov` — and decode `mvhd` (v0 AND v1 layouts) for timescale/
    * duration. This is what a 100 TB video-curation pass runs FIRST:
    * container metadata (duration, timescale, brand, box census) costs a
    * few hundred header bytes per file and prunes the corpus before any
    * frame decode is scheduled; the decode tier proper stays REAL-CODEC
    * (no video codec library in this container). Malformed payloads
    * (truncated box, no moov/mvhd, 64-bit largesize) yield NULL fields,
    * never a task failure. Output `[media_id, brand, n_top_boxes,
    * timescale, duration, duration_ms]`.
    */
  def extractMp4Meta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("brand", StringType, nullable = true),
      StructField("n_top_boxes", LongType, nullable = true),
      StructField("timescale", LongType, nullable = true),
      StructField("duration", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        parseMp4(bytes) match {
          case Some((brand, nBoxes, ts, dur)) =>
            Row(r.getLong(0), brand, nBoxes, ts, dur,
              if (ts > 0) java.lang.Long.valueOf(dur * 1000L / ts) else null)
          case None => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(encoder)
  }

  /** Box walk: returns (major brand, top-level box count, mvhd timescale,
    * mvhd duration) or None when the container is unparseable.
    */
  private[graft] def parseMp4(
      bytes: Array[Byte]): Option[(String, Long, Long, Long)] = {
    if (bytes == null || bytes.length < 8) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    def fourCC(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    // Walk the sibling boxes in [from, to); returns (count, offsets by type).
    def walk(from: Int, to: Int): Option[Seq[(String, Int, Int)]] = {
      var off = from
      val found = Seq.newBuilder[(String, Int, Int)]
      while (off < to) {
        if (off + 8 > to) return None
        val size = u32(off)
        if (size == 1 || size < 8 || off + size > to) return None // largesize unsupported / malformed
        found += ((fourCC(off + 4), off, size.toInt))
        off += size.toInt
      }
      Some(found.result())
    }
    for {
      top <- walk(0, bytes.length)
      // brand lives at ftyp+8..11: an 8-byte (body-less) ftyp is
      // malformed, and reading past it would throw out of mapPartitions.
      ftyp <- top.find(b => b._1 == "ftyp" && b._3 >= 12)
      moov <- top.find(_._1 == "moov")
      kids <- walk(moov._2 + 8, moov._2 + moov._3)
      mvhd <- kids.find(_._1 == "mvhd")
      body = mvhd._2 + 8
      if mvhd._3 >= 8 + 4
      version = bytes(body) & 0xff
      tsdur <- version match {
        case 0 if mvhd._3 >= 8 + 20 => Some((u32(body + 12), u32(body + 16)))
        case 1 if mvhd._3 >= 8 + 32 => Some((u32(body + 20), bb.getLong(body + 24)))
        case _ => None
      }
    } yield (fourCC(ftyp._2 + 8), top.size.toLong, tsdur._1, tsdur._2)
  }

  /** Synthesize an MP4 like [[synthesizeMp4]] but with a full
    * `moov`>`trak`>`mdia`>`minf`>`stbl` chain carrying the three sample
    * tables a frame-sampling pass indexes on:
    * `stts` (decode deltas: `nSamples-1` samples at `(id mod 5)+1` ticks +
    * one tail sample at 100), `stsz` (per-sample sizes
    * `(id*13 + 5i) mod 200 + 50`, `nSamples = (id mod 7)+2`) and `stco`
    * (`(id mod 3)+1` chunk offsets `1000 + 512j + id mod 100`). Every
    * field is a pure function of `id` for closed-form oracle replay; the
    * mvhd is [[synthesizeMp4]]'s, so the m09 metadata walk still parses
    * these containers unchanged.
    */
  def synthesizeMp4Track(id: Long): Array[Byte] = {
    val n = (java.lang.Math.floorMod(id, 7L)).toInt + 2
    val nc = (java.lang.Math.floorMod(id, 3L)).toInt + 1
    val sizes = Array.tabulate(n)(i =>
      (java.lang.Math.floorMod(id * 13L + 5L * i, 200L)).toInt + 50)
    val offsets = Array.tabulate(nc)(j =>
      1000 + 512 * j + (java.lang.Math.floorMod(id, 100L)).toInt)
    buildMp4(id, Some((sizes, offsets)), mp4Filler(id, mdatFillerLen(id)))
  }

  /** Media frame of track-bearing MP4s ([[synthesizeMp4Track]]). */
  def synthesizeMp4TrackMedia(df: DataFrame, idCol: String): DataFrame =
    synthMedia(df, idCol, "video/mp4")(synthesizeMp4Track)

  /** Synthesize an MP4 whose sample tables index REAL payload bytes: one
    * chunk at the true in-file mdat payload offset, `nSamples = (id mod
    * 7)+2` samples of `(id*13 + 5i) mod 200 + 50` bytes laid out
    * consecutively, payload byte at position p = `(7p + id) mod 256`.
    * Unlike [[synthesizeMp4Track]] (whose stco carries formula offsets
    * for the m11 census oracle), this container supports actual
    * extraction: seeking stco[0] + stsz prefix sums lands on the exact
    * sample bytes — what [[extractMp4Samples]] gates (m12).
    */
  def synthesizeMp4Frames(id: Long): Array[Byte] = {
    val n = (java.lang.Math.floorMod(id, 7L)).toInt + 2
    val sizes = Array.tabulate(n)(i =>
      (java.lang.Math.floorMod(id * 13L + 5L * i, 200L)).toInt + 50)
    val payloadOff = mp4PayloadOffset(n, nc = 1, nRuns = 0)
    buildMp4(id, Some((sizes, Array(payloadOff))), mp4Filler(id, sizes.sum))
  }

  /** Media frame of extraction-ready MP4s ([[synthesizeMp4Frames]]). */
  def synthesizeMp4FramesMedia(df: DataFrame, idCol: String): DataFrame =
    synthMedia(df, idCol, "video/mp4")(synthesizeMp4Frames)

  /** Multi-chunk extraction container: the [[synthesizeMp4Frames]] sample
    * stream split across `nc = min((id mod 3)+1, n)` chunks via a REAL
    * stsc run map (`spc = n/nc` samples per chunk, remainder in the
    * last), with `(id mod 5)` bytes of 0xAA junk BETWEEN chunks — so a
    * reader that ignores stsc/stco and walks the payload linearly reads
    * gap bytes into samples and fails the oracle; only honest chunk
    * resolution recovers the m12 byte formula (sample content is chunk-
    * layout-invariant by construction, which is what lets m13 share it).
    */
  def synthesizeMp4Chunks(id: Long): Array[Byte] = {
    val n = (java.lang.Math.floorMod(id, 7L)).toInt + 2
    val nc = math.min((java.lang.Math.floorMod(id, 3L)).toInt + 1, n)
    val sizes = Array.tabulate(n)(i =>
      (java.lang.Math.floorMod(id * 13L + 5L * i, 200L)).toInt + 50)
    val spc = n / nc
    val lastCnt = n - spc * (nc - 1)
    val runs: Array[(Int, Int)] =
      if (nc == 1) Array((1, n))
      else if (lastCnt == spc) Array((1, spc))
      else Array((1, spc), (nc, lastCnt))
    val gap = (java.lang.Math.floorMod(id, 5L)).toInt
    val counts = Array.tabulate(nc)(c => if (c < nc - 1) spc else lastCnt)
    val chunkBytes = {
      var si = 0
      counts.map { cnt =>
        var b = 0; var k = 0
        while (k < cnt) { b += sizes(si); si += 1; k += 1 }
        b
      }
    }
    val payloadOff = mp4PayloadOffset(n, nc, runs.length)
    val offsets = new Array[Int](nc)
    var off = payloadOff
    var c = 0
    while (c < nc) {
      offsets(c) = off
      off += chunkBytes(c) + (if (c < nc - 1) gap else 0)
      c += 1
    }
    // mdat: per chunk, its slice of the SAMPLE stream (global position p
    // over sample bytes only), then the junk gap.
    val mdat = new Array[Byte](chunkBytes.sum + gap * (nc - 1))
    var p = 0L; var mp = 0; c = 0
    while (c < nc) {
      var q = 0
      while (q < chunkBytes(c)) {
        mdat(mp) = (java.lang.Math.floorMod(7L * p + id, 256L)).toByte
        p += 1; mp += 1; q += 1
      }
      if (c < nc - 1) {
        var g = 0
        while (g < gap) { mdat(mp) = 0xAA.toByte; mp += 1; g += 1 }
      }
      c += 1
    }
    buildMp4(id, Some((sizes, offsets)), mdat, Some(runs))
  }

  /** Media frame of multi-chunk extraction MP4s ([[synthesizeMp4Chunks]]). */
  def synthesizeMp4ChunksMedia(df: DataFrame, idCol: String): DataFrame =
    synthMedia(df, idCol, "video/mp4")(synthesizeMp4Chunks)

  private[multimodal] val mp4PngW = 16
  private[multimodal] val mp4PngH = 12

  /** Synthesize an MP4 whose mdat samples are REAL PNG images: frame `i`
    * of `n = (id mod 3)+2` is [[synthesizeGrayPng]]`(id + 31 i, 16, 12)`
    * — so each frame's pixel(x,y) is `(7x + 13y + id + 31 i) mod 256`, a
    * pure function of (id, i) the m14 oracle replays in SQL. The stsz
    * sizes are the ACTUAL encoded PNG byte lengths (deflate-dependent,
    * NOT closed-form — the oracle never sees them; only the decoded
    * pixels are checkable, which is exactly the point: the engine must
    * walk the container, pread each sample, and really decode it to
    * agree). Single-chunk faststart layout at the true payload offset,
    * same as [[synthesizeMp4Frames]]. This is the MJPEG shape with the
    * sandbox's available image codec standing in for a video codec.
    */
  def synthesizeMp4Png(id: Long): Array[Byte] = {
    val n = (java.lang.Math.floorMod(id, 3L)).toInt + 2
    val frames = Array.tabulate(n)(i =>
      synthesizeGrayPng(id + 31L * i, mp4PngW, mp4PngH))
    val sizes = frames.map(_.length)
    val payloadOff = mp4PayloadOffset(n, nc = 1, nRuns = 0)
    buildMp4(id, Some((sizes, Array(payloadOff))), frames.flatten)
  }

  /** Media frame of PNG-frame MP4s ([[synthesizeMp4Png]]). */
  def synthesizeMp4PngMedia(df: DataFrame, idCol: String): DataFrame =
    synthMedia(df, idCol, "video/mp4")(synthesizeMp4Png)

  /** REAL video-frame decode, end to end: container walk
    * ([[parseMp4SampleTablesWithSizes]]) → per-sample pread
    * ([[samplePlacement]] + bounds-checked slice) → image decode
    * (`javax.imageio`) → pixel histogram. The codec tier a frame-level
    * curation pass runs AFTER the metadata tiers (m09/m11) pruned the
    * corpus; on a cluster each task decodes only its partition's
    * containers, one ImageIO context per task. Output one row per
    * (track, sample): `[media_id, track, sample, width, height,
    * features]`.
    *
    * Degradation tiers mirror [[extractMp4Samples]]: a malformed
    * container / no honest placement yields ONE all-NULL row per media;
    * a sample RANGE escaping the file poisons its whole track (an index
    * lying about its own file); a sample whose bytes are in range but do
    * not decode as an image yields NULL width/height/features for THAT
    * row only — per-frame degradation, the corrupted-sample refusal the
    * m14 spec pins.
    */
  def decodeMp4Frames(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("track", LongType, nullable = true),
      StructField("sample", LongType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("features", ArrayType(DoubleType, containsNull = false),
        nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val id = r.getLong(0)
        val nullRow = Iterator.single(Row(id, null, null, null, null, null))
        parseMp4SampleTablesWithSizes(bytes) match {
          case Some(tracks) if tracks.nonEmpty =>
            val live = tracks.flatMap(t =>
              sampleWalk(t, bytes.length).map(gen => (t.table.track, gen)))
            if (live.isEmpty) nullRow
            else live.iterator.flatMap { case (track, gen) =>
              gen().map { case (_, sample, start, sz) =>
                decodeFrameRow(id, track, sample, bytes, start.toInt, sz.toInt)
              }
            }
          case _ => nullRow
        }
      }
    }(encoder)
  }

  /** Decode one in-range sample slice; undecodable bytes degrade to NULL
    * decode fields on the row, never a task failure.
    */
  private def decodeFrameRow(id: Long, track: Long, sample: Long,
      bytes: Array[Byte], start: Int, sz: Int): Row = {
    val frame = java.util.Arrays.copyOfRange(bytes, start, start + sz)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) Row(id, track, sample, null, null, null)
    else {
      val h = new Array[Double](histBins)
      val n = grayCounts(img, h)
      var j = 0
      while (j < histBins) { h(j) /= n.toDouble; j += 1 }
      Row(id, track, sample, img.getWidth.toLong, img.getHeight.toLong,
        h.toSeq)
    }
  }

  /** Whole-file feature path for `video/mp4` in [[extractFeatures]]: the
    * per-frame decode aggregated into ONE normalized pixel histogram —
    * counts accumulate across every decodable frame of every track
    * (frames weighted by their pixel counts), normalized once at the
    * end. Undecodable frames are skipped; a container with NO decodable
    * frame (including the codec-less filler-mdat containers m09
    * synthesizes) yields the zero vector, matching the PNG/WAV
    * undecodable behavior.
    */
  private[multimodal] def mp4FramePixelHistogram(bytes: Array[Byte]): Array[Double] = {
    val h = new Array[Double](histBins)
    if (bytes == null || bytes.isEmpty) return h
    var total = 0L
    parseMp4SampleTablesWithSizes(bytes).foreach { tracks =>
      tracks.foreach { t =>
        sampleWalk(t, bytes.length).foreach { gen =>
          gen().foreach { case (_, _, start, sz) =>
            if (sz > 0) {
              val frame = java.util.Arrays.copyOfRange(
                bytes, start.toInt, (start + sz).toInt)
              val img =
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
                catch { case scala.util.control.NonFatal(_) => null }
              if (img != null) total += grayCounts(img, h)
            }
          }
        }
      }
    }
    if (total > 0) {
      var j = 0
      while (j < histBins) { h(j) /= total.toDouble; j += 1 }
    }
    h
  }

  /** Sample EXTRACTION through the stbl index (m11's tier cashed in):
    * resolve each sample's chunk via the stsc run map, seek that chunk's
    * stco offset, walk the stsz sizes, and slice each sample's actual
    * bytes out of the container — the pread a frame-sampling pipeline
    * issues once the index told it where to look; no codec involved, and
    * none needed to prove the byte arithmetic. A track WITHOUT an stsc
    * box is honored only in the single-chunk (faststart) layout — for a
    * multi-chunk track the run map is the only honest placement source,
    * and guessing would silently read wrong bytes, so stsc-less
    * multi-chunk tracks yield NULL rows. Output one row per (track,
    * sample): `[media_id, track, sample, chunk, nbytes, byte_sum]` with
    * `chunk` the 0-based chunk the sample lives in and `byte_sum` the
    * sum of its unsigned bytes (a closed-form content witness the
    * m12/m13 oracles replay; a decoder would take the slice itself).
    * Malformed containers, inconsistent stsc totals, or out-of-bounds
    * sample ranges yield one NULL row per media, never a task failure.
    */
  def extractMp4Samples(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("track", LongType, nullable = true),
      StructField("sample", LongType, nullable = true),
      StructField("chunk", LongType, nullable = true),
      StructField("nbytes", LongType, nullable = true),
      StructField("byte_sum", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val id = r.getLong(0)
        val nullRow = Iterator.single(Row(id, null, null, null, null, null))
        parseMp4SampleTablesWithSizes(bytes) match {
          case Some(tracks) if tracks.nonEmpty =>
            // Survivor generators are picked EAGERLY (bounds pre-pass per
            // track, constant memory); rows stream LAZILY — no per-sample
            // collection is ever held (the many-tiny-samples hardening).
            val live = tracks.flatMap(t =>
              sampleWalk(t, bytes.length).map(gen => (t.table.track, gen)))
            if (live.isEmpty) nullRow
            else live.iterator.flatMap { case (track, gen) =>
              gen().map { case (chunk, sample, start, sz) =>
                var s = 0L; var p = start.toInt
                val end = (start + sz).toInt
                while (p < end) { s += bytes(p) & 0xff; p += 1 }
                Row(id, track, sample, chunk, sz, s)
              }
            }
          case _ => nullRow
        }
      }
    }(encoder)
  }

  /** Samples-per-chunk vector from the track's stsc/stco/stsz: stsc runs
    * expanded over chunk indices, or the implicit single-chunk layout
    * when the box is absent. None when placement cannot be honestly
    * derived (no samples, no chunks, stsc-less multi-chunk, malformed
    * runs, or run totals disagreeing with the sample count).
    */
  private def chunkCounts(t: TrackTables): Option[Array[Int]] = {
    val nChunks = t.chunkOffsets.length
    if (t.sizes.isEmpty || nChunks == 0) return None
    val perChunk: Option[Array[Int]] =
      if (t.stscRuns.isEmpty) {
        if (nChunks == 1) Some(Array(t.sizes.length)) else None
      } else {
        val runs = t.stscRuns
        val wellFormed = runs.headOption.exists(_._1 == 1L) &&
          runs.zip(runs.drop(1)).forall { case (a, b) => a._1 < b._1 } &&
          runs.forall { case (first, spc) =>
            first >= 1L && first <= nChunks && spc >= 1L && spc <= t.sizes.length
          }
        if (!wellFormed) None
        else {
          // LINEAR merge over the sorted runs (one pointer each): a
          // per-chunk scan of the run list would be O(nChunks x nRuns) —
          // a crafted stsc/stco pair with both counts in the 10^5 range
          // pins a core for hours before the totals check can refuse it,
          // exactly the attacker-input class this parser is hardened
          // against.
          val counts = new Array[Int](nChunks)
          var r = 0
          var c = 1
          while (c <= nChunks) {
            while (r + 1 < runs.length && runs(r + 1)._1 <= c) r += 1
            counts(c - 1) = runs(r)._2.toInt
            c += 1
          }
          Some(counts)
        }
      }
    perChunk.filter(_.map(_.toLong).sum == t.sizes.length.toLong)
  }

  /** Validated LAZY sample walk: `Some(generator)` yielding
    * `(chunk0, sample0, startByte, size)` tuples in sample order when the
    * track's placement is honest AND every sample range fits inside
    * `fileLen`; `None` when the track must be refused (no honest
    * placement — the [[chunkCounts]] cases — or ANY range escaping the
    * buffer: an index lying about its own file poisons its whole track).
    *
    * ITERATOR DISCIPLINE: nothing sample-count-sized is materialized
    * beyond the stsz table itself (which the parse already holds) — the
    * bounds pre-pass streams the placement once in constant extra memory,
    * and each call of the generator re-derives positions on the fly. A
    * pathological single file claiming millions of tiny samples therefore
    * costs per-sample ITERATION, never a per-sample tuple+Row allocation
    * held live at once; consumers decide what (if anything) to retain.
    */
  private def sampleWalk(t: TrackTables,
      fileLen: Int): Option[() => Iterator[(Long, Long, Long, Long)]] =
    chunkCounts(t).flatMap { counts =>
      val sizes: Array[Long] = t.sizes.toArray
      val offsets = t.chunkOffsets
      def gen(): Iterator[(Long, Long, Long, Long)] = {
        var sample = 0
        counts.indices.iterator.flatMap { c =>
          var start = offsets(c)
          Iterator.fill(counts(c)) {
            val out = (c.toLong, sample.toLong, start, sizes(sample))
            start += sizes(sample)
            sample += 1
            out
          }
        }
      }
      val inBounds = gen().forall { case (_, _, start, sz) =>
        start >= 0 && sz >= 0 && start + sz <= fileLen.toLong
      }
      if (inBounds) Some(() => gen()) else None
    }

  /** Everything the SAME walk decodes per track: the census row, the
    * per-sample sizes, the stsc sample-to-chunk runs (empty when the box
    * is absent), and the full stco offset list. The fixed-size stsz form
    * expands to `count` copies ONLY when `fixed * count <= bytes.length`
    * (each sample must physically fit in the file; an index claiming more
    * would poison the extraction walk anyway, and an unbounded u32 count
    * must never size an allocation) — infeasible tables surface as an
    * empty size list, which the extractor refuses with a NULL row.
    */
  private[graft] final case class TrackTables(
      table: TrackSampleTable, sizes: Seq[Long],
      stscRuns: IndexedSeq[(Long, Long)], chunkOffsets: IndexedSeq[Long])

  private[graft] def parseMp4SampleTablesWithSizes(
      bytes: Array[Byte]): Option[Seq[TrackTables]] =
    parseMp4SampleTablesImpl(bytes).map(_.map { raw =>
      val sizes = raw.sizesSpec match {
        case Right(entries) => entries
        case Left((fixed, count)) =>
          if (count > 0 && fixed > 0 && count <= bytes.length / fixed)
            Seq.fill(count.toInt)(fixed)
          else Seq.empty
      }
      TrackTables(raw.table, sizes, raw.stscRuns, raw.chunkOffsets)
    })

  /** Sample-table tier (m09's next level down): per track, the census a
    * frame-sampling pass needs BEFORE any codec runs — how many samples
    * (stsz), how many bytes they occupy, where the chunks start (stco),
    * and how many timescale ticks they span (stts). Reading these three
    * tables costs a few hundred bytes per file and turns "sample frame at
    * t=30 s" into an exact (chunk offset, byte range) seek plan — the
    * index that makes distributed video ingest a pread, not a scan.
    * Output `[media_id, track, sample_count, total_sample_bytes,
    * n_chunks, first_chunk_offset, total_ticks]`; malformed containers
    * yield ONE row of NULL fields (the m09 discipline), traks without a
    * complete stbl chain are skipped.
    */
  def extractMp4SampleTable(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("track", LongType, nullable = true),
      StructField("sample_count", LongType, nullable = true),
      StructField("total_sample_bytes", LongType, nullable = true),
      StructField("n_chunks", LongType, nullable = true),
      StructField("first_chunk_offset", LongType, nullable = true),
      StructField("total_ticks", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        parseMp4SampleTables(bytes) match {
          case Some(tracks) if tracks.nonEmpty => tracks.map { t =>
            Row(r.getLong(0), t.track, t.sampleCount, t.totalBytes,
              t.nChunks, t.firstChunkOffset.map(java.lang.Long.valueOf).orNull,
              t.totalTicks)
          }
          case _ => Seq(Row(r.getLong(0), null, null, null, null, null, null))
        }
      }
    }(encoder)
  }

  private[graft] final case class TrackSampleTable(
      track: Long, sampleCount: Long, totalBytes: Long, nChunks: Long,
      firstChunkOffset: Option[Long], totalTicks: Long)

  /** Walk moov>trak>mdia>minf>stbl and decode stsz/stco/stts per track.
    * Pure big-endian box arithmetic with the [[parseMp4]] bounds
    * discipline: any size overrun or truncated table returns None (the
    * caller emits a NULL row); a trak that simply lacks the chain is
    * skipped, not an error.
    */
  private[graft] def parseMp4SampleTables(
      bytes: Array[Byte]): Option[Seq[TrackSampleTable]] =
    parseMp4SampleTablesImpl(bytes).map(_.map(_.table))

  /** Per-sample sizes as decoded (Right) or the fixed-size form's
    * `(fixed, count)` left unexpanded (Left) — expansion is the caller's
    * bounded decision, never this parser's allocation.
    */
  private type SizeSpec = Either[(Long, Long), IndexedSeq[Long]]

  private final case class RawTrackTables(
      table: TrackSampleTable, sizesSpec: SizeSpec,
      stscRuns: IndexedSeq[(Long, Long)], chunkOffsets: IndexedSeq[Long])

  private def parseMp4SampleTablesImpl(
      bytes: Array[Byte]): Option[Seq[RawTrackTables]] = {
    if (bytes == null || bytes.length < 8) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    def fourCC(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def walk(from: Int, to: Int): Option[Seq[(String, Int, Int)]] = {
      var off = from
      val found = Seq.newBuilder[(String, Int, Int)]
      while (off < to) {
        if (off + 8 > to) return None
        val size = u32(off)
        if (size == 1 || size < 8 || off + size > to) return None
        found += ((fourCC(off + 4), off, size.toInt))
        off += size.toInt
      }
      Some(found.result())
    }
    def child(parent: (String, Int, Int), name: String): Option[(String, Int, Int)] =
      walk(parent._2 + 8, parent._2 + parent._3).flatMap(_.find(_._1 == name))
    // Full-box body start + remaining payload length after version/flags.
    def fullBody(b: (String, Int, Int)): Option[Int] =
      if (b._3 >= 12) Some(b._2 + 12) else None
    // addExact/multiplyExact throughout: all fields are attacker-supplied
    // u32s, and a wrapped Long (e.g. fixed_size x count ~ 1.8e19) would
    // emit garbage as a valid census row instead of the malformed-None
    // path — the ArithmeticException funnels there via the outer catch.
    def parseStbl(stbl: (String, Int, Int)): Option[RawTrackTables] = for {
      kids <- walk(stbl._2 + 8, stbl._2 + stbl._3)
      stsz <- kids.find(_._1 == "stsz"); stszB <- fullBody(stsz)
      stco <- kids.find(_._1 == "stco"); stcoB <- fullBody(stco)
      stts <- kids.find(_._1 == "stts"); sttsB <- fullBody(stts)
      // stsz: fixed sample_size, or 0 -> per-sample u32 table (whose
      // count is bounded by the box size, so materializing it is safe).
      if stsz._3 >= 20
      fixedSize = u32(stszB)
      nSamples = u32(stszB + 4)
      sized <- if (fixedSize != 0)
        Some((Math.multiplyExact(fixedSize, nSamples),
          Left((fixedSize, nSamples)): SizeSpec))
      else if (stsz._3 >= 20 + nSamples * 4) {
        val entries = (0L until nSamples)
          .map(i => u32(stszB + 8 + i.toInt * 4)).toIndexedSeq
        Some((entries.foldLeft(0L)(Math.addExact), Right(entries): SizeSpec))
      } else None
      // stco: u32 chunk offsets (count bounded by the box size). Decoded
      // LAZILY — the census tier (m11) reads only the first offset, and
      // eagerly boxing up to file/4 longs per media would tax the
      // "few hundred header bytes per file" contract; the extraction
      // tier walks them all, each an O(1) big-endian read.
      if stco._3 >= 16
      nChunks = u32(stcoB)
      _ <- if (stco._3 >= 16 + nChunks * 4) Some(()) else None
      offsets = new scala.collection.immutable.IndexedSeq[Long] {
        def length: Int = nChunks.toInt
        def apply(i: Int): Long = u32(stcoB + 4 + i * 4)
      }
      // stsc (optional): (first_chunk, samples_per_chunk) runs; a PRESENT
      // but malformed stsc fails the parse like any other table.
      stscRuns <- kids.find(_._1 == "stsc") match {
        case None => Some(IndexedSeq.empty[(Long, Long)])
        case Some(sc) => fullBody(sc).flatMap { scB =>
          if (sc._3 < 16) None
          else {
            val nRuns = u32(scB)
            if (sc._3 >= 16 + nRuns * 12)
              Some((0L until nRuns).map(i =>
                (u32(scB + 4 + i.toInt * 12), u32(scB + 8 + i.toInt * 12)))
                .toIndexedSeq)
            else None
          }
        }
      }
      // stts: (sample_count, delta) runs; ticks = sum count*delta.
      if stts._3 >= 16
      nRuns = u32(sttsB)
      totalTicks <- if (stts._3 >= 16 + nRuns * 8) Some(
        (0L until nRuns).foldLeft(0L)((a, i) =>
          Math.addExact(a, Math.multiplyExact(
            u32(sttsB + 4 + i.toInt * 8), u32(sttsB + 8 + i.toInt * 8)))))
        else None
    } yield RawTrackTables(
      TrackSampleTable(0L, nSamples, sized._1, nChunks, offsets.headOption,
        totalTicks),
      sized._2, stscRuns, offsets)
    try {
      for {
        top <- walk(0, bytes.length)
        ftyp <- top.find(b => b._1 == "ftyp" && b._3 >= 12)
        moov <- top.find(_._1 == "moov")
        kids <- walk(moov._2 + 8, moov._2 + moov._3)
        tracks <- kids.filter(_._1 == "trak").zipWithIndex
          .foldLeft(Option(Seq.empty[RawTrackTables])) {
            case (acc, (trak, i)) =>
              acc.flatMap { seq =>
                // trak without the full chain: skipped. Chain present but
                // a table malformed: the whole parse fails (bounds
                // discipline).
                child(trak, "mdia").flatMap(child(_, "minf"))
                  .flatMap(child(_, "stbl")) match {
                  case None => Some(seq)
                  case Some(stbl) =>
                    parseStbl(stbl).map { r =>
                      seq :+ r.copy(table = r.table.copy(track = i + 1L))
                    }
                }
              }
          }
      } yield tracks
    } catch { case _: ArithmeticException => None }
  }

  // --- JPEG (m15): the web's dominant image container -------------------

  /** Synthesize a deterministic, structurally valid baseline JPEG:
    * SOI, JFIF APP0, `id mod 3` COM segments, one DQT, SOF0 carrying
    * `precision 8, h = 48 + id mod 32, w = 64 + id mod 64, nComp = 3`
    * (even ids) `or 1` (odd), SOS with `(id mod 32) + 4` entropy bytes
    * (filler avoids 0xFF so no marker aliasing), EOI. Every byte is a
    * pure function of id — the m09/m10 discipline: the oracle states the
    * planted fields in closed form, the engine only matches if the
    * marker-segment walk actually recovers them.
    */
  def synthesizeJpeg(id: Long): Array[Byte] = {
    val w = 64 + (id % 64).toInt
    val h = 48 + (id % 32).toInt
    val nComp = if (id % 2 == 0) 3 else 1
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xff); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)                                   // SOI
    m(0xe0); u16(16)                          // APP0/JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)                // version 1.1
    out.write(0); u16(1); u16(1)              // units dpi 1x1
    out.write(0); out.write(0)                // no thumbnail
    (0 until (id % 3).toInt).foreach { k =>   // COM segments
      val txt = s"c$id-$k".getBytes("US-ASCII")
      m(0xfe); u16(2 + txt.length); out.write(txt)
    }
    m(0xdb); u16(67); out.write(0)            // DQT, table 0
    (0 until 64).foreach(i => out.write(((id + 3 * i) % 255).toInt))
    m(0xc0); u16(8 + 3 * nComp)               // SOF0
    out.write(8); u16(h); u16(w); out.write(nComp)
    (0 until nComp).foreach { c =>
      out.write(c + 1); out.write(0x11); out.write(0)
    }
    m(0xda); u16(6 + 2 * nComp)               // SOS
    out.write(nComp)
    (0 until nComp).foreach { c => out.write(c + 1); out.write(0) }
    out.write(0); out.write(0x3f); out.write(0)
    (0 until (id % 32).toInt + 4)             // entropy filler, no 0xFF
      .foreach(i => out.write(((5 * i + id) % 255).toInt))
    m(0xd9)                                   // EOI
    out.toByteArray
  }

  /** A media-schema frame of synthesized JPEGs, one per input id. */
  def synthesizeJpegMedia(df: DataFrame, idCol: String): DataFrame =
    synthMedia(df, idCol, "image/jpeg")(synthesizeJpeg)

  /** REAL JPEG marker-segment walk (the [[extractPngMeta]] twin for the
    * web's dominant image format): SOI, then length-framed segments,
    * SOFn (C0–CF minus C4/C8/CC) big-endian-decoded for precision/
    * height/width/components, SOS entropy data skipped by the stuffing
    * rule (0xFF00 is a literal, 0xFFD0–D7 are restart markers, anything
    * else ends the scan), EOI must close the stream exactly. Handles
    * real encoder output (javax.imageio JPEGs parse — spec-pinned), and
    * malformed payloads yield NULL fields, never a task failure. Output
    * `[media_id, width, height, n_comp, precision, n_segments]`.
    */
  def extractJpegMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_comp", LongType, nullable = true),
      StructField("precision", LongType, nullable = true),
      StructField("n_segments", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        parseJpegMeta(bytes) match {
          case Some((w, h, nc, prec, nseg)) =>
            Row(r.getLong(0), w, h, nc, prec, nseg)
          case None => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(encoder)
  }

  // --- EXIF / TIFF inside JPEG APP1 (m16): camera metadata ---------------

  /** Synthesize a JPEG carrying a deterministic EXIF APP1 — the
    * [[synthesizeJpeg]] stream with `Exif\0\0` + a TIFF block spliced in
    * after APP0. The TIFF exercises every structural trap a real EXIF
    * parser must survive: BOTH byte orders (`II` little-endian for even
    * ids, `MM` big-endian for odd — per-id, so one corpus scan crosses
    * endianness constantly), an inline SHORT whose 2 bytes sit at the
    * START of the 4-byte value field (the MM padding trap), a RATIONAL
    * and an ASCII value stored at OFFSETS from the TIFF origin (not the
    * file origin — the classic off-by-APP1-header bug), and a sub-IFD
    * descent via the ExifIFD pointer tag. Planted fields, closed form:
    * orientation `1 + id%8`, XResolution `(72 + id%10)/1`, software
    * `"sw-" + id%100`, PixelX/YDimension = the SOF0 width/height.
    */
  def synthesizeExifJpeg(id: Long): Array[Byte] = {
    val w = 64 + (id % 64).toInt
    val h = 48 + (id % 32).toInt
    val little = id % 2 == 0
    val tiff = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (little) { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
      else { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def u32(v: Int): Unit =
      if (little) { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff)
        tiff.write((v >> 16) & 0xff); tiff.write((v >> 24) & 0xff) }
      else { tiff.write((v >> 24) & 0xff); tiff.write((v >> 16) & 0xff)
        tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def entry(tag: Int, typ: Int, count: Int)(value: => Unit): Unit = {
      u16(tag); u16(typ); u32(count); value
    }
    val sw = s"sw-${id % 100}".getBytes("US-ASCII")
    val ratOff = 62                 // after 8-byte header + 4 entries + next
    val swOff = ratOff + 8
    val exifOff = swOff + sw.length + 1
    tiff.write(if (little) 'I' else 'M'); tiff.write(if (little) 'I' else 'M')
    u16(42); u32(8)                 // magic, IFD0 at offset 8
    u16(4)                          // IFD0: 4 entries
    entry(0x0112, 3, 1) { u16(1 + (id % 8).toInt); u16(0) } // SHORT inline
    entry(0x011a, 5, 1) { u32(ratOff) }                     // RATIONAL @off
    entry(0x0131, 2, sw.length + 1) { u32(swOff) }          // ASCII @off
    entry(0x8769, 4, 1) { u32(exifOff) }                    // ExifIFD ptr
    u32(0)                          // next IFD: none
    u32(72 + (id % 10).toInt); u32(1)                       // XRes num/den
    tiff.write(sw); tiff.write(0)                           // software\0
    u16(2)                          // sub-IFD: 2 entries
    entry(0xa002, 4, 1) { u32(w) }                          // PixelXDim
    entry(0xa003, 4, 1) { u32(h) }                          // PixelYDim
    u32(0)
    val t = tiff.toByteArray
    // Splice APP1 right after the base JPEG's APP0 (SOI 2 + APP0 18).
    val base = synthesizeJpeg(id)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 20)
    out.write(0xff); out.write(0xe1)
    val len = 2 + 6 + t.length
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(t)
    out.write(base, 20, base.length - 20)
    out.toByteArray
  }

  /** A media-schema frame of EXIF-bearing JPEGs, one per input id. */
  def synthesizeExifJpegMedia(df: DataFrame, idCol: String): DataFrame =
    synthMedia(df, idCol, "image/jpeg")(synthesizeExifJpeg)

  /** REAL EXIF extraction: [[parseJpegMeta]]'s marker walk locates the
    * `Exif\0\0` APP1, then a TIFF walk — byte-order detection, IFD0
    * entry scan, inline-vs-offset value resolution (a value wider than
    * 4 bytes lives at an offset FROM THE TIFF ORIGIN), ExifIFD sub-IFD
    * descent — recovers orientation, X resolution, software string, and
    * pixel dimensions. The per-pipeline reason to care: orientation
    * decides whether a decode pipeline must rotate, and EXIF dimensions
    * catch truncated re-encodes (they disagree with SOF). Missing EXIF
    * or a malformed TIFF yields NULL fields, never a task failure.
    * Output `[media_id, byte_order, orientation, xres_num, xres_den,
    * software, pixel_x, pixel_y]`.
    */
  def extractExifMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("byte_order", StringType, nullable = true),
      StructField("orientation", LongType, nullable = true),
      StructField("xres_num", LongType, nullable = true),
      StructField("xres_den", LongType, nullable = true),
      StructField("software", StringType, nullable = true),
      StructField("pixel_x", LongType, nullable = true),
      StructField("pixel_y", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        parseExifMeta(bytes) match {
          case Some((bo, o, xn, xd, sw, px, py)) =>
            Row(r.getLong(0), bo, o, xn, xd, sw, px, py)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null)
        }
      }
    }(encoder)
  }

  /** Locate the Exif APP1 payload (after `Exif\0\0`) via the marker
    * walk; None when absent/malformed.
    */
  private def exifTiffBlock(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 4) return None
    def b(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (b(i) << 8) | b(i + 1)
    if (b(0) != 0xff || b(1) != 0xd8) return None
    var off = 2
    while (off + 4 <= bytes.length && b(off) == 0xff) {
      val marker = b(off + 1)
      if (marker == 0xd9 || marker == 0xda) return None // image data: no EXIF
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) ||
        marker == 0x01) { off += 2 }
      else {
        val len = u16(off + 2)
        if (len < 2 || off + 2 + len > bytes.length) return None
        if (marker == 0xe1 && len >= 8 &&
          bytes.slice(off + 4, off + 10).sameElements(
            Array[Byte]('E', 'x', 'i', 'f', 0, 0)))
          return Some(bytes.slice(off + 10, off + 2 + len))
        off += 2 + len
      }
    }
    None
  }

  private[graft] def parseExifMeta(bytes: Array[Byte])
      : Option[(String, Long, Long, Long, String, Long, Long)] = {
    val t = exifTiffBlock(bytes).getOrElse(return None)
    if (t.length < 8) return None
    def b(i: Int): Int = t(i) & 0xff
    val little = b(0) == 'I' && b(1) == 'I'
    if (!little && !(b(0) == 'M' && b(1) == 'M')) return None
    def u16(i: Int): Int =
      if (i + 2 > t.length) -1
      else if (little) b(i) | (b(i + 1) << 8) else (b(i) << 8) | b(i + 1)
    def u32(i: Int): Long =
      if (i + 4 > t.length) -1L
      else if (little) (b(i) | (b(i + 1) << 8) | (b(i + 2) << 16)).toLong |
        (b(i + 3).toLong << 24)
      else ((b(i).toLong << 24) | (b(i + 1) << 16) | (b(i + 2) << 8) |
        b(i + 3))
    if (u16(2) != 42) return None
    // Collect (tag -> entry offset) maps for IFD0 and the Exif sub-IFD.
    def ifdEntries(ifdOff: Long): Map[Int, Int] = {
      if (ifdOff < 0 || ifdOff + 2 > t.length) return Map.empty
      val n = u16(ifdOff.toInt)
      if (n < 0) return Map.empty
      (0 until n).flatMap { i =>
        val e = ifdOff.toInt + 2 + i * 12
        if (e + 12 > t.length) None else Some(u16(e) -> e)
      }.toMap
    }
    val ifd0 = ifdEntries(u32(4))
    if (ifd0.isEmpty) return None
    def shortInline(e: Int): Long = u16(e + 8).toLong  // first 2 value bytes
    def longValue(e: Int): Long = u32(e + 8)
    def rational(e: Int): Option[(Long, Long)] = {
      val off = u32(e + 8)
      if (off < 0 || off + 8 > t.length) None
      else Some((u32(off.toInt), u32(off.toInt + 4)))
    }
    def ascii(e: Int): Option[String] = {
      val n = u32(e + 4)
      if (n <= 0) return None
      if (n <= 4) Some(new String(t, e + 8, n.toInt - 1, "US-ASCII"))
      else {
        val off = u32(e + 8)
        if (off < 0 || off + n > t.length) None
        else Some(new String(t, off.toInt, n.toInt - 1, "US-ASCII"))
      }
    }
    val orientation = ifd0.get(0x0112).map(shortInline)
    val xres = ifd0.get(0x011a).flatMap(rational)
    val software = ifd0.get(0x0131).flatMap(ascii)
    val sub = ifd0.get(0x8769).map(e => ifdEntries(longValue(e)))
      .getOrElse(Map.empty)
    Some((if (little) "II" else "MM",
      orientation.getOrElse(-1L),
      xres.map(_._1).getOrElse(-1L), xres.map(_._2).getOrElse(-1L),
      software.getOrElse(""),
      sub.get(0xa002).map(longValue).getOrElse(-1L),
      sub.get(0xa003).map(longValue).getOrElse(-1L)))
  }

  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf &&
      marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  private[graft] def parseJpegMeta(
      bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    if (bytes == null || bytes.length < 4) return None
    def b(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (b(i) << 8) | b(i + 1)
    if (b(0) != 0xff || b(1) != 0xd8) return None
    var off = 2
    var sof: Option[(Long, Long, Long, Long)] = None
    var nSeg = 0L
    while (off < bytes.length) {
      if (off + 2 > bytes.length || b(off) != 0xff) return None
      // ITU T.81 B.1.1.2: any run of 0xFF fill bytes may pad before a
      // marker — consume it (some real encoders emit padding; without
      // this the 0xFF would parse as a length-framed marker byte).
      while (off + 2 < bytes.length && b(off + 1) == 0xff) off += 1
      val marker = b(off + 1)
      if (marker == 0xd9) {                       // EOI closes exactly
        return if (off + 2 == bytes.length)
          sof.map { case (w, h, nc, p) => (w, h, nc, p, nSeg) } else None
      } else if (marker == 0xd8 ||
          (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        off += 2                                  // standalone marker
      } else {
        if (off + 4 > bytes.length) return None
        val len = u16(off + 2)
        if (len < 2 || off + 2 + len > bytes.length) return None
        nSeg += 1L
        if (isSof(marker)) {
          if (len < 8) return None
          sof = Some((u16(off + 7).toLong, u16(off + 5).toLong,
            b(off + 9).toLong, b(off + 4).toLong))
        }
        off += 2 + len
        if (marker == 0xda) {                     // skip entropy data
          var done = false
          while (!done) {
            if (off + 1 >= bytes.length) return None
            if (b(off) == 0xff && b(off + 1) != 0x00 &&
              !(b(off + 1) >= 0xd0 && b(off + 1) <= 0xd7)) done = true
            else off += 1
          }
        }
      }
    }
    None                                          // ran out before EOI
  }
}
