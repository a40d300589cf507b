package graft

import org.apache.spark.sql.functions._

import graft.plans.Video

/** ISO-BMFF (MP4) container codec: real box bytes, top-level box
  * scan with the largesize / to-EOF escapes, mvhd v0+v1 layouts, and
  * the null-quarantine contract shared with the other codecs. */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  private def decodeBytes(b: Array[Byte]) =
    Seq(b).toDF("blob").select(Video.decode($"blob").as("m"))
      .select($"m.brand", $"m.timescale", $"m.duration", $"m.mdat_len", $"m.payload_off")
      .head()

  test("pack/decode roundtrip recovers brand, timescale, duration, payload span") {
    val payload = "hello mdat".getBytes("UTF-8")
    val m = Seq(("isom", 90000L, 4500L)).toDF("br", "tsc", "dur")
      .select(Video.pack($"br", $"tsc", $"dur", lit(payload)).as("blob"))
      .withColumn("m", Video.decode($"blob"))
      .select($"m.brand", $"m.timescale", $"m.duration", $"m.mdat_len", $"m.payload_off",
        octet_length($"blob"))
      .head()
    assert(m.getString(0) == "isom" && m.getLong(1) == 90000L && m.getLong(2) == 4500L)
    assert(m.getInt(3) == payload.length && m.getInt(4) == Video.HeaderLen - 8 + 8)
    assert(m.getInt(5) == Video.HeaderLen + payload.length)
  }

  test("decoder skips unknown top-level boxes and parses an mvhd v1 layout") {
    // hand-build: ftyp + free(unknown) + moov>mvhd(v1, u64 times) + mdat(size=0: to EOF)
    val bb = java.nio.ByteBuffer.allocate(4096)
    def box(typ: String, payload: Array[Byte]): Unit = {
      bb.putInt(8 + payload.length); bb.put(typ.getBytes("US-ASCII")); bb.put(payload)
    }
    box("ftyp", "mp42".getBytes ++ Array[Byte](0, 0, 2, 0) ++ "isom".getBytes)
    box("free", Array.fill[Byte](5)(0x7f))
    val mvhd = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 + 8 + 80)
    mvhd.put(1.toByte); mvhd.put(Array[Byte](0, 0, 0))   // version 1, flags
    mvhd.putLong(0L); mvhd.putLong(0L)                   // creation/modification u64
    mvhd.putInt(600)                                     // timescale
    mvhd.putLong(1234567890123L)                         // duration u64
    mvhd.put(new Array[Byte](80))
    val mvhdBytes = mvhd.array()
    val moovPayload = java.nio.ByteBuffer.allocate(8 + mvhdBytes.length)
    moovPayload.putInt(8 + mvhdBytes.length); moovPayload.put("mvhd".getBytes); moovPayload.put(mvhdBytes)
    box("moov", moovPayload.array())
    // mdat with size=0 (extends to end of file)
    bb.putInt(0); bb.put("mdat".getBytes); bb.put("xyz".getBytes)
    val blob = java.util.Arrays.copyOf(bb.array(), bb.position())
    val m = decodeBytes(blob)
    assert(m.getString(0) == "mp42" && m.getLong(1) == 600L)
    assert(m.getLong(2) == 1234567890123L)
    assert(m.getInt(3) == 3)
  }

  test("decoder handles the 64-bit largesize escape") {
    val base = Video.packMp4(
      org.apache.spark.unsafe.types.UTF8String.fromString("isom"), 1000L, 500L,
      "abcdefgh".getBytes("UTF-8"))
    // rewrite the mdat box to use size=1 + largesize
    val mdatOff = Video.FtypLen + Video.MoovLen
    val pre = base.slice(0, mdatOff)
    val payload = base.slice(mdatOff + 8, base.length)
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.putInt(1); bb.put("mdat".getBytes); bb.putLong(16L + payload.length); bb.put(payload)
    val m = decodeBytes(pre ++ bb.array())
    assert(m.getString(0) == "isom" && m.getInt(3) == payload.length)
  }

  test("malformed video quarantines as null, never throws") {
    val good = Video.packMp4(
      org.apache.spark.unsafe.types.UTF8String.fromString("isom"), 1000L, 500L,
      "abcdefgh".getBytes("UTF-8"))
    val cases = Seq(
      "this is not an mp4 file at all!!".getBytes("UTF-8"),  // no ftyp
      good.slice(0, 30),                                     // truncated mid-moov
      {
        val b = good.clone()                                 // box size overruns blob
        b(0) = 0x7f.toByte
        b
      },
      {
        val b = good.clone()                                 // mvhd version 2: unknown
        b(Video.FtypLen + 16) = 2.toByte
        b
      },
      good.slice(Video.FtypLen, good.length))                // moov first, no leading ftyp
    val out = cases.toDF("blob").select(Video.decode($"blob").as("m")).collect()
    assert(out.forall(_.isNullAt(0)), "every malformed blob must decode to null")
  }

  test("pack rejects out-of-domain parameters as null") {
    val rows = Seq(
      ("iso", 1000L, 10L),        // brand not 4 chars
      ("isom", 0L, 10L),          // timescale < 1
      ("isom", 1000L, -1L),       // negative duration
      ("isom", 1000L, 0x100000000L) // duration > u32 (v0 packer)
    ).toDF("br", "tsc", "dur")
      .select(Video.pack($"br", $"tsc", $"dur", lit("x".getBytes("UTF-8"))).as("blob"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("video codec works through the SQL surface") {
    val m = spark.sql(
      """SELECT graft_decode_mp4(graft_pack_mp4('mp41', 30000L, 900L, encode('pp', 'UTF-8'))) AS m"""
    ).select($"m.brand", $"m.timescale", $"m.duration", $"m.mdat_len").head()
    assert(m.getString(0) == "mp41" && m.getLong(1) == 30000L && m.getLong(2) == 900L)
    assert(m.getInt(3) == 2)
  }
}
