package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container codec for the multimodal column family
  * (SURVEY §2.G): blobs carry genuine format headers — the actual
  * PNG signature + IHDR chunk (with a correct CRC32), a JPEG
  * SOI + SOF0 segment, a WebP RIFF/VP8X extended header, or graft's
  * own raw container — and the decode expression parses width /
  * height / format back out of the bytes themselves (big-endian IHDR
  * fields, a real JPEG marker scan, little-endian 24-bit VP8X
  * fields). This replaces the round-1 ByteSum stand-in: the decode
  * step now reads the same bytes any image tool would.
  *
  * Full pixel decoding (IDAT inflate / entropy decode) is out of
  * scope in this container — no imaging libraries — but the header
  * layer IS the real format, byte for byte: these blobs open in any
  * viewer that tolerates a truncated payload, and the decoder
  * rejects wrong magic/malformed headers with NULL exactly as the
  * frame codec does.
  */
object Image {
  def pack(format: Column, width: Column, height: Column, payload: Column): Column =
    ColumnBridge.column(PackImage(
      ColumnBridge.expression(format), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(payload)))
  def decode(blob: Column): Column =
    ColumnBridge.column(DecodeImageMeta(ColumnBridge.expression(blob)))
  def ahash(blob: Column, off: Column): Column =
    ColumnBridge.column(AHash62(ColumnBridge.expression(blob), ColumnBridge.expression(off)))

  val PngHeaderLen = 33   // 8 signature + 25 IHDR chunk (len+type+13+crc)
  val JpegHeaderLen = 21  // 2 SOI + 2 marker + 17 SOF0 segment
  val WebpHeaderLen = 30  // 12 RIFF/WEBP + 8 chunk header + 10 VP8X data
  val RawHeaderLen = 12   // 4 magic + 2 × int32 LE

  def headerLen(format: String): Int = format match {
    case "png" => PngHeaderLen
    case "jpeg" => JpegHeaderLen
    case "webp" => WebpHeaderLen
    case _ => RawHeaderLen
  }

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Static body for PackImage. Returns null for unknown formats or
    * out-of-domain dimensions (JPEG/PNG dims are u16/u31 here). */
  def packImage(format: String, width: Long, height: Long, payload: Array[Byte]): Array[Byte] = {
    if (width < 1 || height < 1 || width > 0xffff || height > 0xffff) return null
    val w = width.toInt
    val h = height.toInt
    format match {
      case "png" =>
        val out = new Array[Byte](PngHeaderLen + payload.length)
        System.arraycopy(PngSig, 0, out, 0, 8)
        putIntBE(out, 8, 13)                       // IHDR data length
        out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
        putIntBE(out, 16, w)
        putIntBE(out, 20, h)
        out(24) = 8                                // bit depth
        out(25) = 6                                // color type RGBA
        out(26) = 0; out(27) = 0; out(28) = 0      // compression/filter/interlace
        val crc = new java.util.zip.CRC32
        crc.update(out, 12, 17)                    // type + data
        putIntBE(out, 29, crc.getValue.toInt)
        System.arraycopy(payload, 0, out, PngHeaderLen, payload.length)
        out
      case "jpeg" =>
        val out = new Array[Byte](JpegHeaderLen + payload.length)
        out(0) = 0xff.toByte; out(1) = 0xd8.toByte // SOI
        out(2) = 0xff.toByte; out(3) = 0xc0.toByte // SOF0
        putShortBE(out, 4, 17)                     // segment length
        out(6) = 8                                 // precision
        putShortBE(out, 7, h)
        putShortBE(out, 9, w)
        out(11) = 3                                // components
        var c = 0
        while (c < 3) {                            // id, sampling, qtable
          out(12 + 3 * c) = (c + 1).toByte
          out(13 + 3 * c) = 0x11
          out(14 + 3 * c) = if (c == 0) 0 else 1
          c += 1
        }
        System.arraycopy(payload, 0, out, JpegHeaderLen, payload.length)
        out
      case "webp" =>
        val out = new Array[Byte](WebpHeaderLen + payload.length)
        out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
        putIntLE(out, 4, WebpHeaderLen - 8 + payload.length) // RIFF content size
        out(8) = 'W'; out(9) = 'E'; out(10) = 'B'; out(11) = 'P'
        out(12) = 'V'; out(13) = 'P'; out(14) = '8'; out(15) = 'X'
        putIntLE(out, 16, 10)                      // VP8X chunk size
        out(20) = 0                                // flags
        out(21) = 0; out(22) = 0; out(23) = 0      // reserved
        putInt24LE(out, 24, w - 1)                 // canvas width - 1
        putInt24LE(out, 27, h - 1)                 // canvas height - 1
        System.arraycopy(payload, 0, out, WebpHeaderLen, payload.length)
        out
      case "raw" =>
        val out = new Array[Byte](RawHeaderLen + payload.length)
        out(0) = 'G'; out(1) = 'R'; out(2) = 'A'; out(3) = 'W'
        putIntLE(out, 4, w)
        putIntLE(out, 8, h)
        System.arraycopy(payload, 0, out, RawHeaderLen, payload.length)
        out
      case _ => null
    }
  }

  /** Static body for DecodeImageMeta: sniff the magic, parse the real
    * header fields; null for anything unrecognized or truncated. */
  def decodeImage(b: Array[Byte]): InternalRow = {
    if (b.length >= PngHeaderLen && isPng(b)) {
      // require the IHDR tag where the signature says it must be
      if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        row("png", getIntBE(b, 16), getIntBE(b, 20), PngHeaderLen)
      else null
    } else if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte) {
      // real JPEG marker scan: walk segments until a SOF marker.
      // Per the spec, 0xFF fill bytes may pad between segments, and
      // TEM (0x01) / RST0-7 (0xD0-0xD7) are standalone markers with
      // no length field — both legal before SOF; treating every
      // marker as length-carrying misaligns the walk and quarantines
      // valid external JPEGs.
      var i = 2
      while (i + 1 < b.length) {
        if (b(i) != 0xff.toByte) return null
        // skip repeated 0xFF padding to the real marker byte
        var j = i + 1
        while (j < b.length && b(j) == 0xff.toByte) j += 1
        if (j >= b.length) return null
        val marker = b(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (j + 8 > b.length) return null         // need len + 5 SOF bytes
          val segLen = getShortBE(b, j + 1)
          if (segLen < 7) return null               // SOF carries >= 5 data bytes
          val h = getShortBE(b, j + 4)
          val w = getShortBE(b, j + 6)
          return row("jpeg", w, h, j + 1 + segLen)
        } else if (marker == 0xd9 || marker == 0xda) {
          return null                               // EOI / SOS: no SOF seen
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 1                                 // standalone marker, no length
        } else {
          if (j + 2 >= b.length) return null
          val segLen = getShortBE(b, j + 1)
          if (segLen < 2) return null               // length includes itself
          i = j + 1 + segLen
        }
      }
      null
    } else if (b.length >= WebpHeaderLen && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P' &&
        b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X') {
      row("webp", getInt24LE(b, 24) + 1, getInt24LE(b, 27) + 1, WebpHeaderLen)
    } else if (b.length >= RawHeaderLen && b(0) == 'G' && b(1) == 'R' && b(2) == 'A' &&
        b(3) == 'W') {
      row("raw", getIntLE(b, 4), getIntLE(b, 8), RawHeaderLen)
    } else null
  }

  /** Null (not a row) when the parsed dimensions fall outside the
    * FORMAT's own legal domain — a corrupt header that happens to
    * carry the right magic must quarantine like any other malformed
    * input, not emit garbage metadata. Domains follow each spec, not
    * our packer's narrower 1..0xffff write range: PNG and GRAW carry
    * u31 fields (any positive int32 is a legal external image), JPEG
    * is inherently u16, WebP VP8X 24-bit. */
  private def row(fmt: String, w: Int, h: Int, payloadOff: Int): InternalRow = {
    val max = fmt match {
      case "jpeg" => 0xffff
      case "webp" => 1 << 24
      case _ => Int.MaxValue
    }
    if (w < 1 || h < 1 || w > max || h > max) null
    else InternalRow(UTF8String.fromString(fmt), w, h, payloadOff)
  }

  private def isPng(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return false; i += 1 }
    true
  }

  private def putIntBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }
  private def putShortBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 8) & 0xff).toByte
    b(off + 1) = (v & 0xff).toByte
  }
  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def putInt24LE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
  }
  private def getIntBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def getShortBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getInt24LE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)
}

/** (format string, width int64, height int64, payload binary) → blob
  * with a real container header. Null on unknown format or
  * out-of-domain dimensions. */
case class PackImage(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression with CodegenFallback
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq[DataType](StringType, LongType, LongType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(f: Any, w: Any, h: Any, p: Any): Any =
    Image.packImage(f.asInstanceOf[UTF8String].toString,
      w.asInstanceOf[Long], h.asInstanceOf[Long], p.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(a, b, c, d)
}

/** (bytes binary, off int) → 62-bit average-hash fingerprint of the
  * byte region starting at `off` (the perceptual-hash shape over a
  * decoded image's sample grid, computed here over the payload
  * region a full pixel decoder would fill): up to 62 unsigned bytes
  * are read, their integer mean taken once, and bit i is set iff
  * byte i exceeds the mean. 62 bits keeps the value strictly
  * positive in an int64 on every engine (the [[graft.functions
  * .HashFns]] simhash convention — bit 63 would flip the sign, and
  * bit 62 differs between engines' `<<` overflow behavior).
  * Null when `off` is out of range or the region is empty —
  * malformed blobs quarantine, they don't fingerprint. */
case class AHash62(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType, IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(bytes: Any, off: Any): Any = {
    val b = bytes.asInstanceOf[Array[Byte]]
    val o = off.asInstanceOf[Int]
    if (o < 0 || o >= b.length) return null
    val n = math.min(62, b.length - o)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (b(o + i) & 0xff); i += 1 }
    val mean = sum / n
    var hash = 0L
    i = 0
    while (i < n) {
      if ((b(o + i) & 0xff) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** blob → struct(format string, width int, height int, payload_off int),
  * parsed from the actual header bytes; null when the magic/header is
  * unrecognized (quarantinable, like UnpackFrame). */
case class DecodeImageMeta(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload_off", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    Image.decodeImage(v.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
