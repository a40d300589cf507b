package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Real WAV (RIFF/WAVE) container codec — the audio modality beside
  * [[Image]]: blobs carry a genuine 44-byte canonical PCM header
  * (RIFF size, fmt chunk with channels / sample rate / block align /
  * byte rate, data chunk length) over the payload standing in for
  * PCM frames, and the decoder parses those actual little-endian
  * bytes back with a proper RIFF chunk scan (unknown chunks are
  * skipped with even-byte padding, the spec rule real writers rely
  * on). Sample decode (the PCM frames themselves) sits behind the
  * same column boundary as pixel decode does for images; the header
  * layer is the genuine wire format — these blobs open in any tool
  * that tolerates truncated audio.
  *
  * Malformed input (wrong magic, truncated header, fmt/data missing)
  * returns NULL for quarantine, like the frame and image codecs.
  */
object Audio {
  def pack(channels: Column, sampleRate: Column, payload: Column): Column =
    ColumnBridge.column(PackWav(
      ColumnBridge.expression(channels), ColumnBridge.expression(sampleRate),
      ColumnBridge.expression(payload)))
  def decode(blob: Column): Column =
    ColumnBridge.column(DecodeWavMeta(ColumnBridge.expression(blob)))
  def pcmStats(blob: Column, off: Column, len: Column): Column =
    ColumnBridge.column(PcmStats(
      ColumnBridge.expression(blob), ColumnBridge.expression(off),
      ColumnBridge.expression(len)))
  def pcmVad(blob: Column, off: Column, len: Column,
      win: Int = 32, thresh: Long = 20000L): Column =
    ColumnBridge.column(PcmVad(
      ColumnBridge.expression(blob), ColumnBridge.expression(off),
      ColumnBridge.expression(len), win, thresh))

  val HeaderLen = 44     // canonical PCM: RIFF(12) + fmt(24) + data header(8)
  val Bits = 16          // PCM s16le, the overwhelmingly common layout

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && b(off) == t(0).toByte && b(off + 1) == t(1).toByte &&
      b(off + 2) == t(2).toByte && b(off + 3) == t(3).toByte
  private def putTag(b: Array[Byte], off: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = t(i).toByte; i += 1 }
  }

  /** Static body for PackWav: canonical 44-byte PCM header. The
    * payload truncates to a whole number of sample frames (block
    * align) — a data chunk that ends mid-frame is malformed. Null on
    * out-of-domain channels/rate. */
  def packWav(channels: Long, sampleRate: Long, payload: Array[Byte]): Array[Byte] = {
    if (channels < 1 || channels > 8 || sampleRate < 1 || sampleRate > 384000) return null
    val ch = channels.toInt
    val rate = sampleRate.toInt
    val blockAlign = ch * (Bits / 8)
    val dataLen = payload.length - (payload.length % blockAlign)
    val out = new Array[Byte](HeaderLen + dataLen)
    putTag(out, 0, "RIFF")
    putIntLE(out, 4, 36 + dataLen)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt ")
    putIntLE(out, 16, 16)                       // fmt chunk size (PCM)
    putShortLE(out, 20, 1)                      // audio format: PCM
    putShortLE(out, 22, ch)
    putIntLE(out, 24, rate)
    putIntLE(out, 28, rate * blockAlign)        // byte rate
    putShortLE(out, 32, blockAlign)
    putShortLE(out, 34, Bits)
    putTag(out, 36, "data")
    putIntLE(out, 40, dataLen)
    System.arraycopy(payload, 0, out, HeaderLen, dataLen)
    out
  }

  /** Static body for DecodeWavMeta: RIFF chunk scan. Requires
    * RIFF/WAVE magic and a PCM fmt chunk before the data chunk;
    * skips unknown chunks with the RIFF even-byte pad. Null on any
    * malformation. */
  def decodeWav(b: Array[Byte]): InternalRow = {
    if (b.length < HeaderLen || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    // chunk offsets/sizes advance in LONG arithmetic: the size field
    // is u32 from untrusted bytes, and Int math would overflow on a
    // crafted ~2^31 size — wrapping past the bounds check and then
    // indexing with a negative offset (a crash, not the promised
    // null quarantine)
    var off = 12L
    var channels = -1
    var rate = -1
    var blockAlign = -1
    while (off + 8 <= b.length) {
      val size = getIntLE(b, off.toInt + 4).toLong & 0xffffffffL  // u32
      if (off + 8 + size > b.length) return null
      val o = off.toInt
      if (tag(b, o, "fmt ")) {
        if (size < 16) return null
        if (getShortLE(b, o + 8) != 1) return null            // PCM only
        channels = getShortLE(b, o + 10)
        rate = getIntLE(b, o + 12)
        blockAlign = getShortLE(b, o + 20)
        if (getShortLE(b, o + 22) != Bits) return null
        if (channels < 1 || rate < 1 || blockAlign != channels * (Bits / 8)) return null
      } else if (tag(b, o, "data")) {
        if (channels < 0) return null                          // fmt must precede data
        if (size % blockAlign != 0) return null                // whole frames only
        return InternalRow(channels, rate, Bits, size.toInt, o + 8)
      }
      off += 8 + size + (size % 2)                             // RIFF even-byte pad
    }
    null
  }
}

/** (channels int64, sample_rate int64, payload binary) → canonical
  * PCM WAV blob. Null on out-of-domain parameters. */
case class PackWav(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](LongType, LongType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(c: Any, r: Any, p: Any): Any =
    Audio.packWav(c.asInstanceOf[Long], r.asInstanceOf[Long], p.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression = copy(a, b, c)
}

/** (blob, payload_off int64, data_len int64) → struct(n_samples,
  * peak_abs, sum_abs, n_loud): amplitude statistics over the payload
  * interpreted as s16le PCM — the loudness/VAD feature pass of an
  * audio pipeline, walking the SIGNED little-endian samples (high
  * bytes ≥ 0x80 flip the sign, which the non-ASCII corpus
  * exercises). Integer outputs only, so any engine that walks the
  * same bytes reproduces them exactly. Null on a window that exceeds
  * the blob (quarantine, consistent with the codec). */
case class PcmStats(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType, LongType, LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("n_loud", LongType, nullable = false)))
  override def nullable: Boolean = true

  /** |sample| > LoudAbs counts as loud — above what a lowercase-text
    * payload can reach (high byte ≤ 'z' = 0x7a ⇒ |s| ≤ 31354), though
    * not above ALL of ASCII ('~~' = 32382); sign-flipped samples
    * (high byte ≥ 0x80) land here via the negative range. */
  val LoudAbs = 32000

  override protected def nullSafeEval(v: Any, o: Any, l: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val off = o.asInstanceOf[Long].toInt
    val len = l.asInstanceOf[Long].toInt
    if (off < 0 || len < 0 || off + len > b.length) return null
    val n = len / 2
    var i = 0
    var peak = 0L
    var sum = 0L
    var loud = 0L
    while (i < n) {
      val s = (((b(off + 2 * i) & 0xff) | ((b(off + 2 * i + 1) & 0xff) << 8)).toShort).toInt
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sum += a
      if (a > LoudAbs) loud += 1
      i += 1
    }
    InternalRow(n.toLong, peak, sum, loud)
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression = copy(a, b, c)
}

/** (blob, payload_off, data_len, win, thresh) → struct(n_windows,
  * n_active, max_win_sum, first_active): fixed-window energy
  * segmentation over the s16le payload — the voice-activity-style
  * gating pass a speech pipeline runs to find which regions of a
  * clip carry signal. Complete windows of `win` samples each; a
  * window is ACTIVE when its summed absolute amplitude exceeds
  * `thresh·win` (i.e. mean |sample| > thresh). Integer outputs only
  * (window sums, counts, the first active window index or -1), so
  * any engine walking the same bytes reproduces them exactly; one
  * pass, O(1) memory, scan-local. Null when the window exceeds the
  * blob (quarantine, consistent with the codec). */
case class PcmVad(first: Expression, second: Expression, third: Expression,
    win: Int, thresh: Long)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType, LongType, LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("n_active", LongType, nullable = false),
    StructField("max_win_sum", LongType, nullable = false),
    StructField("first_active", LongType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any, o: Any, l: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val off = o.asInstanceOf[Long].toInt
    val len = l.asInstanceOf[Long].toInt
    if (off < 0 || len < 0 || off + len > b.length || win <= 0) return null
    val nSamples = len / 2
    val nw = nSamples / win
    var w = 0
    var active = 0L
    var maxSum = 0L
    var firstActive = -1L
    val bar = thresh * win
    while (w < nw) {
      var i = 0
      var s = 0L
      val base = off + 2 * w * win
      while (i < win) {
        val x = (((b(base + 2 * i) & 0xff) | ((b(base + 2 * i + 1) & 0xff) << 8)).toShort).toInt
        s += math.abs(x.toLong)
        i += 1
      }
      if (s > maxSum) maxSum = s
      if (s > bar) {
        active += 1
        if (firstActive < 0) firstActive = w.toLong
      }
      w += 1
    }
    InternalRow(nw.toLong, active, maxSum, firstActive)
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression = copy(a, b, c)
}

/** blob → struct(channels, sample_rate, bits, data_len, payload_off),
  * parsed from the actual RIFF bytes; null when malformed. */
case class DecodeWavMeta(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("data_len", IntegerType, nullable = false),
    StructField("payload_off", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Audio.decodeWav(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
