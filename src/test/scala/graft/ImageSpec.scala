package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.plans.Image
import graft.sources.Tables

/** The multimodal codec must parse real container bytes — including
  * headers it did not write itself — and quarantine garbage as null. */
class ImageSpec extends SparkSpec {
  import spark.implicits._

  test("mm_meta decodes format/width/height from the actual blob bytes") {
    val rows = Multimodal.meta(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("height") == (doc % 48) + 1)
      assert(Set("png", "jpeg", "webp", "raw").contains(r.getAs[String]("format")))
      assert(r.getAs[Long]("n_bytes") >
        Image.headerLen(r.getAs[String]("format")).toLong)
    }
  }

  test("mm_resize halves dimensions through a real decode-encode cycle") {
    val meta = Multimodal.meta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"), r.getAs[String]("format"))).toMap
    Multimodal.resize(spark, sf).collect().foreach { r =>
      val (w0, h0, f0) = meta(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("format") == f0, "format survives the transform")
      assert(r.getAs[Long]("width") == math.max(w0 / 2, 1L))
      assert(r.getAs[Long]("height") == math.max(h0 / 2, 1L))
      assert(r.getAs[Long]("n_bytes") <= Image.headerLen(f0) + 16L)
    }
  }

  test("decoder reads a JPEG it did not write (APP0 segment before SOF0)") {
    // independent construction straight from the JPEG spec: SOI, a
    // JFIF APP0 segment the decoder must skip, then SOF0 with the
    // dimensions — proves the marker scan walks segments rather than
    // assuming our own fixed layout
    val buf = ByteBuffer.allocate(64)
    buf.put(0xff.toByte).put(0xd8.toByte)                       // SOI
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(16)          // APP0, len 16
    buf.put("JFIF".getBytes).put(0.toByte)
    buf.put(1.toByte).put(2.toByte).put(0.toByte)
    buf.putShort(1).putShort(1).put(0.toByte).put(0.toByte)
    buf.put(0xff.toByte).put(0xc0.toByte).putShort(17)          // SOF0, len 17
    buf.put(8.toByte).putShort(90).putShort(160).put(3.toByte)  // 160 × 90
    (1 to 3).foreach(c => buf.put(c.toByte).put(0x11.toByte).put(0.toByte))
    val jpeg = java.util.Arrays.copyOf(buf.array(), buf.position())
    val r = Seq(Tuple1(jpeg)).toDF("blob")
      .select(Image.decode($"blob").as("m")).select($"m.*").head()
    assert(r.getAs[String]("format") == "jpeg")
    assert(r.getAs[Int]("width") == 160 && r.getAs[Int]("height") == 90)
  }

  test("decoder reads a spec-constructed PNG IHDR") {
    val buf = ByteBuffer.allocate(64)
    buf.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    buf.putInt(13).put("IHDR".getBytes)
    buf.putInt(640).putInt(480)
    buf.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(0)                                               // crc (unchecked)
    val png = java.util.Arrays.copyOf(buf.array(), buf.position())
    val r = Seq(Tuple1(png)).toDF("blob")
      .select(Image.decode($"blob").as("m")).select($"m.*").head()
    assert(r.getAs[String]("format") == "png")
    assert(r.getAs[Int]("width") == 640 && r.getAs[Int]("height") == 480)
  }

  test("our own PNG header carries a correct CRC32") {
    val blob = Seq(Tuple1("x")).toDF("p")
      .select(Image.pack(lit("png"), lit(320L), lit(200L), encode($"p", "UTF-8")))
      .head().getAs[Array[Byte]](0)
    val stored = ((blob(29) & 0xff) << 24) | ((blob(30) & 0xff) << 16) |
      ((blob(31) & 0xff) << 8) | (blob(32) & 0xff)
    val crc = new java.util.zip.CRC32
    crc.update(blob, 12, 17)
    assert(stored == crc.getValue.toInt, "IHDR CRC must be the real CRC32")
  }

  test("external PNG wider than our packer's domain still decodes") {
    // PNG dims are u31: a 70000-px-wide image is legal per spec even
    // though our own packer never writes one — the decoder follows
    // the format's domain, not the writer's
    val buf = ByteBuffer.allocate(64)
    buf.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    buf.putInt(13).put("IHDR".getBytes)
    buf.putInt(70000).putInt(2)
    buf.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(0)
    val png = java.util.Arrays.copyOf(buf.array(), buf.position())
    val r = Seq(Tuple1(png)).toDF("blob")
      .select(Image.decode($"blob").as("m")).select($"m.*").head()
    assert(r.getAs[Int]("width") == 70000 && r.getAs[Int]("height") == 2)
  }

  test("right magic with corrupt dimensions still quarantines as null") {
    // a GRAW header whose width field is zero: magic passes, the
    // parsed dimensions are outside the codec domain -> null, never
    // garbage metadata
    val bad = "GRAW".getBytes ++ Array[Byte](0, 0, 0, 0) ++ Array[Byte](5, 0, 0, 0)
    val r = Seq(Tuple1(bad)).toDF("blob")
      .select(Image.decode($"blob").as("m")).head()
    assert(r.isNullAt(0))
  }

  test("unrecognized bytes decode to null, out-of-domain dims pack to null") {
    val bad = Seq(Tuple1("not an image at all".getBytes)).toDF("blob")
      .select(Image.decode($"blob").as("m")).head()
    assert(bad.isNullAt(0))
    val over = Seq(Tuple1("p")).toDF("p")
      .select(Image.pack(lit("png"), lit(100000L), lit(1L), encode($"p", "UTF-8")))
      .head()
    assert(over.isNullAt(0))
  }

  test("codec handles non-ASCII payloads: blob sizes are UTF-8 bytes") {
    // round-3 lifted the ASCII-corpus restriction: hashes/ngrams are
    // code-point-defined and the mm oracles count UTF-8 bytes
    // (strlen/hex walk), so a non-ASCII payload must round-trip with
    // byte-accurate sizes. 'héllo😀' = 6 code points, 10 UTF-8 bytes.
    val r = Seq(Tuple1("héllo😀")).toDF("t")
      .select(
        Image.pack(lit("png"), lit(3L), lit(2L), encode($"t", "UTF-8")).as("blob"),
        length($"t").as("cps"), octet_length(encode($"t", "UTF-8")).as("bytes"))
      .withColumn("m", Image.decode($"blob"))
      .select($"cps", $"bytes", octet_length($"blob").as("blob_len"),
        $"m.format".as("fmt")).head()
    assert(r.getInt(0) == 6 && r.getInt(1) == 10)
    assert(r.getInt(2) == Image.PngHeaderLen + 10, "blob length counts bytes")
    assert(r.getString(3) == "png")
  }
}
