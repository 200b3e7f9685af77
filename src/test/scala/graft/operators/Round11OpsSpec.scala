package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.multimodal.Multimodal

class Round11OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  test("mp4 box walk recovers the synthesized mvhd fields exactly") {
    (0L to 50L).foreach { id =>
      val parsed = Multimodal.parseMp4(Multimodal.synthesizeMp4(id))
      val ts = 600L + (id % 10) * 100
      val dur = (id * 37) % 100000 + 600
      assert(parsed.contains(("isom", 3L, ts, dur)), s"id=$id got $parsed")
    }
  }

  test("mp4 parse handles the v1 mvhd layout (64-bit duration)") {
    // Hand-build ftyp + moov>mvhd v1: 8+4 version/flags, 8+8 creation/
    // modification, 4 timescale, 8 duration, then rate onward as v0.
    val ts = 48000
    val dur = 5000000000L // > 2^32: only representable in the v1 layout
    val mvhdBody = 4 + 8 + 8 + 4 + 8 + 4 + 2 + 10 + 36 + 24 + 4
    val buf = java.nio.ByteBuffer.allocate(16 + 8 + 8 + mvhdBody)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("avc1".getBytes("US-ASCII")).putInt(0)
    buf.putInt(8 + 8 + mvhdBody).put("moov".getBytes("US-ASCII"))
    buf.putInt(8 + mvhdBody).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000) // version 1
      .putLong(0L).putLong(0L)
      .putInt(ts).putLong(dur)
      .putInt(0x00010000).putShort(0x0100.toShort)
      .put(new Array[Byte](10 + 36 + 24)).putInt(2)
    assert(Multimodal.parseMp4(buf.array())
      .contains(("avc1", 2L, ts.toLong, dur)))
  }

  test("mp4 parse yields None on malformed containers, NULL rows downstream") {
    assert(Multimodal.parseMp4(null).isEmpty)
    assert(Multimodal.parseMp4(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseMp4("not an mp4 at all".getBytes).isEmpty)
    // Truncated mid-box: valid ftyp, then a moov whose declared size
    // overruns the payload.
    val good = Multimodal.synthesizeMp4(7L)
    assert(Multimodal.parseMp4(good.take(40)).isEmpty)
    // No moov at all.
    assert(Multimodal.parseMp4(good.take(16)).isEmpty)

    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "garbage".getBytes, Row("video/mp4", 7L, "x")),
        Row(2L, null, Row("video/mp4", 0L, null)))),
      Multimodal.mediaSchema)
    val out = Multimodal.extractMp4Meta(junk).collect()
      .map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }
}
