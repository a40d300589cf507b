package graft

import org.apache.spark.sql.functions._

import graft.plans.Audio

/** WAV container codec: real RIFF bytes, chunk-scan decode, and the
  * null-quarantine contract shared with the frame/image codecs. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  private def decodeBytes(b: Array[Byte]) =
    Seq(b).toDF("blob").select(Audio.decode($"blob").as("m"))
      .select($"m.channels", $"m.sample_rate", $"m.bits", $"m.data_len", $"m.payload_off")
      .head()

  test("pack/decode roundtrip recovers header fields and whole-frame payload") {
    val payload = "abcdefghij".getBytes("UTF-8")    // 10 bytes
    val rows = Seq((2L, 44100L)).toDF("ch", "rate")
      .select(Audio.pack($"ch", $"rate", lit(payload)).as("blob"))
      .withColumn("m", Audio.decode($"blob"))
      .select($"m.channels", $"m.sample_rate", $"m.bits", $"m.data_len", $"m.payload_off",
        octet_length($"blob"))
      .head()
    // block align 4: 10 bytes truncate to 8 (whole frames only)
    assert(rows.getInt(0) == 2 && rows.getInt(1) == 44100 && rows.getInt(2) == 16)
    assert(rows.getInt(3) == 8 && rows.getInt(4) == 44)
    assert(rows.getInt(5) == 44 + 8)
  }

  test("decoder skips unknown RIFF chunks (with the even-byte pad) before data") {
    val base = Audio.packWav(1, 8000, "abcd".getBytes("UTF-8"))
    // splice an unknown 3-byte 'LIST' chunk (padded to 4) between fmt and data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.slice(0, 36) ++ extra ++ base.slice(36, base.length)
    // fix the RIFF size field for the added bytes
    val riffSize = (base.length - 8) + extra.length
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val m = decodeBytes(spliced)
    assert(m.getInt(0) == 1 && m.getInt(1) == 8000)
    assert(m.getInt(3) == 4 && m.getInt(4) == 36 + 12 + 8)
  }

  test("malformed audio quarantines as null, never throws") {
    val cases = Seq(
      "not a riff header at all".getBytes("UTF-8"),             // wrong magic
      Audio.packWav(1, 8000, "abcdef".getBytes("UTF-8")).slice(0, 20), // truncated
      {
        val b = Audio.packWav(1, 8000, "abcdef".getBytes("UTF-8"))
        b(20) = 3; b                                             // non-PCM format tag
      },
      {
        val b = Audio.packWav(2, 16000, "abcdefgh".getBytes("UTF-8"))
        b(40) = 7; b                                             // data not whole frames
      },
      {
        // crafted near-2^31 chunk size: Int arithmetic would wrap the
        // bounds check and index negatively (crash) instead of null
        val b = Audio.packWav(1, 8000, "abcdef".getBytes("UTF-8"))
        b(16) = 0xf0.toByte; b(17) = 0xff.toByte
        b(18) = 0xff.toByte; b(19) = 0x7f.toByte; b              // fmt size = 0x7ffffff0
      })
    cases.foreach { bytes =>
      val out = Seq(bytes).toDF("blob").select(Audio.decode($"blob").as("m")).head()
      assert(out.isNullAt(0), s"expected null for ${bytes.take(8).mkString(",")}")
    }
    // out-of-domain pack parameters quarantine too
    val p = Seq((9L, 8000L)).toDF("ch", "rate")
      .select(Audio.pack($"ch", $"rate", lit("ab".getBytes("UTF-8"))).as("b")).head()
    assert(p.isNullAt(0))
  }

  test("mm_audio derives integer-exact durations from parsed bytes") {
    val out = graft.operators.Multimodal.audio(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nBytes = r.getLong(1); val ch = r.getLong(2); val rate = r.getLong(3)
      val nSamples = r.getLong(4); val dur = r.getLong(5)
      assert(nBytes == 44 + nSamples * ch * 2)
      assert(dur == nSamples * 1000000L / rate)
    }
  }

  test("downsample halves rate and frames, preserving duration to frame rounding") {
    val in = graft.operators.Multimodal.audio(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val out = graft.operators.Multimodal.audioDownsample(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (rate, n, dur) = in(r.getLong(0))
      assert(r.getLong(2) == rate / 2)
      assert(r.getLong(3) <= n / 2 && r.getLong(3) >= n / 2 - 2)
      // half the frames at half the rate: duration within one output
      // frame period of the original
      val framePeriodUs = 1000000L / (rate / 2) + 1
      assert(math.abs(r.getLong(4) - dur) <= 2 * framePeriodUs + 2,
        s"doc ${r.getLong(0)}: in $dur out ${r.getLong(4)}")
    }
  }

  test("graft_pack_wav / graft_decode_wav resolve in SQL") {
    val r = spark.sql(
      """SELECT graft_decode_wav(graft_pack_wav(CAST(1 AS BIGINT), CAST(8000 AS BIGINT),
        |  encode('abcd', 'UTF-8'))) AS m""".stripMargin)
      .select($"m.channels", $"m.sample_rate", $"m.data_len").head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 8000 && r.getInt(2) == 4)
  }
}
