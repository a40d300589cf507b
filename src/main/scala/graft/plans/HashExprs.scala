package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass implementations of the arithmetic hash families
  * in [[graft.functions.HashFns]].
  *
  * Semantics are IDENTICAL to the higher-order-function definitions
  * (same fold order, same moduli) — the DuckDB oracle keeps
  * evaluating the HOF-shaped SQL and results stay bit-equal — but
  * eval is a tight char loop instead of an interpreted expression
  * tree per element, which removes the dominant cost in the dedup
  * operators (measured 3-5× at sf0.1).
  */
object HashExprs {
  val P: Long = 1000000007L
  val P31: Long = 2147483647L

  /** h = fold(code points)(h*mul + cp) mod `mod`. CODE POINTS, not
    * UTF-16 units: DuckDB's string_split('')+ascii() iterates code
    * points (one element per code point, ascii = the code point), and
    * Spark's own split/ascii builtins do too — a charAt loop would
    * silently diverge on any non-BMP character (surrogate pairs). */
  @inline def polyHash(s: UTF8String, mul: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * mul + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  def polyHashCol(c: Column, mul: Long = 31L, mod: Long = P): Column =
    ColumnBridge.column(PolyHashStr(ColumnBridge.expression(c), mul, mod))
  def minHashCol(shingles: Column): Column =
    ColumnBridge.column(MinHashArr(ColumnBridge.expression(shingles)))
  def simHashCol(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def sigAgreeCol(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreeCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Static body for SigAgreeCount (also called from generated code):
    * number of positions (over the shorter length) where the two long
    * signatures agree. */
  def sigAgree(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Static body for MinHashArr (also called from generated code). */
  def minHashes(arr: ArrayData): ArrayData = {
    val K = 16
    val mins = Array.fill(K)(Long.MaxValue)
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      val base = polyHash(arr.getUTF8String(s), 31L, P)
      var j = 0
      while (j < K) {
        val h = ((37L + 101L * j) * base + (1000003L * j + 12345L)) % P31
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  /** Static body for SimHash64 (also called from generated code). */
  def simHash(arr: ArrayData): Long = {
    val votes = new Array[Int](62)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val str = arr.getUTF8String(t).toString
      var h1 = 0L
      var h2 = 0L
      var i = 0
      while (i < str.length) {          // code points (see polyHash)
        val c = str.codePointAt(i)
        h1 = (h1 * 31 + c) % P31
        h2 = (h2 * 37 + c) % P31
        i += Character.charCount(c)
      }
      val th = h1 + h2 * 2147483648L
      var b = 0
      while (b < 62) {
        votes(b) += (if (((th >> b) & 1L) != 0L) 1 else -1)
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 62) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Polynomial string hash (HashFns.polyHash / polyHashMul).
  * Codegen emits a call to the static loop, keeping whole-stage
  * codegen alive for surrounding operators. */
case class PolyHashStr(child: Expression, mul: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashExprs.polyHash(v.asInstanceOf[UTF8String], mul, mod)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExprs.polyHash($c, ${mul}L, ${mod}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** array<string> shingles → 16 MinHash values (HashFns.minHashes ∘
  * polyHash): base = polyhash31(shingle); m_j = min over shingles of
  * (a_j·base + b_j) mod P31, a_j = 37+101j, b_j = 1000003j+12345. */
case class MinHashArr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashExprs.minHashes(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExprs.minHashes($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Component-agreement count of two MinHash signatures — the
  * estimated-Jaccard numerator of Dedup.minhashEstimate as one native
  * comparison loop instead of interpreted zip_with + filter + size. */
case class SigAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashExprs.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.HashExprs.sigAgree($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** array<string> tokens → 62-bit SimHash (HashFns.simHash): token
  * hash = poly31 + poly37·2^31 (both mod P31); each bit votes ±1;
  * bit set when votes > 0. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(StringType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashExprs.simHash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExprs.simHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
