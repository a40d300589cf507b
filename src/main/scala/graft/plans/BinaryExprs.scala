package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the reference's binary frame
  * format (iceberg-twist main.py:55-81):
  *
  *   bytes 0..1   magic 0x49 0x4D ("IM")
  *   bytes 2..5   int32 LE device id
  *   bytes 6..9   int32 LE timestamp-seconds   (get_timestamp @6)
  *   bytes 10..23 7 × int16 LE samples         (get_data_array 10..24)
  *
  * Implemented as Expressions (not UDFs) so they slot into Catalyst
  * plans with null-safety and column pruning; CodegenFallback keeps
  * them simple — these are format shims, not hot aggregation loops.
  */
object Frame {
  val Magic0: Byte = 0x49
  val Magic1: Byte = 0x4D
  val NumSamples = 7
  val FrameLen = 24

  // Spark 4: Column ↔ Expression goes through the sql-private
  // ExpressionUtils — reached via our ColumnBridge shim
  private def col(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  def pack(device: Column, tsSecs: Column, samples: Column): Column =
    col(PackFrame(ex(device), ex(tsSecs), ex(samples)))
  def unpack(frame: Column): Column = col(UnpackFrame(ex(frame)))
  def byteSum(bin: Column, n: Column): Column = col(ByteSum(ex(bin), ex(n)))
  def binJoin(blobs: Column, sep: Byte): Column = col(BinJoin(ex(blobs), sep))
}

/** array<binary> → one blob with `sep` appended after every element.
  * Single pass with the total length computed up front — O(total
  * bytes), where a fold of binary `concat`s re-copies the growing
  * accumulator each step (quadratic in elements per group). */
case class BinJoin(child: Expression, sep: Byte)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // single extraction pass (getBinary on unsafe arrays copies, so
    // cache the elements rather than re-extracting in the write loop);
    // a null element quarantines the whole join as null, matching the
    // null propagation of a binary-concat fold
    val elems = new Array[Array[Byte]](n)
    var total = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val b = arr.getBinary(i)
      elems(i) = b
      total += b.length + 1
      i += 1
    }
    val out = new Array[Byte](total)
    var off = 0
    i = 0
    while (i < n) {
      val b = elems(i)
      System.arraycopy(b, 0, out, off, b.length)
      off += b.length
      out(off) = sep
      off += 1
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** (device int64, ts_secs int64, samples array<int64>[7]) → 24-byte frame.
  *
  * The frame format's domain is int32 for device/ts_secs and int16 for
  * samples (main.py's struct codes). Values outside those ranges can't
  * round-trip, so they yield NULL rather than silently wrapping — a
  * post-2038 timestamp or an out-of-range sample is a quarantinable
  * record, not a corrupted frame. */
case class PackFrame(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](LongType, LongType, ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(d: Any, t: Any, s: Any): Any = {
    val dv = d.asInstanceOf[Long]
    val tv = t.asInstanceOf[Long]
    val arr = s.asInstanceOf[ArrayData]
    if (dv < Int.MinValue || dv > Int.MaxValue ||
        tv < Int.MinValue || tv > Int.MaxValue) return null
    var i = 0
    val nElems = math.min(Frame.NumSamples, arr.numElements())
    while (i < nElems) {
      // a null sample can't round-trip either — quarantine the frame
      // (matching BinJoin's null-element rule) instead of packing 0
      if (arr.isNullAt(i)) return null
      val sv = arr.getLong(i)
      if (sv < Short.MinValue || sv > Short.MaxValue) return null
      i += 1
    }
    val out = new Array[Byte](Frame.FrameLen)
    out(0) = Frame.Magic0
    out(1) = Frame.Magic1
    putIntLE(out, 2, dv.toInt)
    putIntLE(out, 6, tv.toInt)
    i = 0
    while (i < nElems) {
      putShortLE(out, 10 + 2 * i, arr.getLong(i).toShort)
      i += 1
    }
    out
  }

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def putShortLE(b: Array[Byte], off: Int, v: Short): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** 24-byte frame → struct(device int, ts_secs int, samples array<int>).
  *
  * Malformed input (short buffer or wrong magic) yields NULL instead
  * of throwing: at 100 TB one corrupt frame must quarantine as a null
  * row countable in a side aggregate, not abort the whole job stage. */
case class UnpackFrame(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("device", IntegerType, nullable = false),
    StructField("ts_secs", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    if (b.length < Frame.FrameLen || b(0) != Frame.Magic0 || b(1) != Frame.Magic1)
      return null
    val device = getIntLE(b, 2)
    val ts = getIntLE(b, 6)
    val samples = new Array[Int](Frame.NumSamples)
    var i = 0
    while (i < Frame.NumSamples) {
      samples(i) = getShortLE(b, 10 + 2 * i)
      i += 1
    }
    InternalRow(device, ts, new GenericArrayData(samples))
  }

  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getShortLE(b: Array[Byte], off: Int): Int =
    (((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort).toInt

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Sum of the first n bytes (unsigned) of a binary column — the
  * deterministic stand-in "decode" for multimodal blobs. */
case class ByteSum(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType, LongType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any, n: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val lim = math.min(b.length, n.asInstanceOf[Long].toInt)
    var s = 0L
    var i = 0
    while (i < lim) { s += (b(i) & 0xff); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
