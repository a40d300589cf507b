package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native fold-exact vector math (graft.functions.VecFns).
  *
  * Left-fold summation order is preserved exactly — float products
  * widen to double, accumulated left-to-right — so results remain
  * bit-identical to both the HOF definitions and the DuckDB oracle.
  */
object VecExprs {
  def dotCol(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def lshSigCol(v: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    ColumnBridge.column(LshSig(ColumnBridge.expression(v), nPlanes, planeOffset))
  def sqDistFFCol(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistFF(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sqDistLDCol(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistLD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  @inline def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Static body for SqDistFF: left-fold of (double(a[i]) −
    * double(b[i]))², the order/widening of the HOF definition
    * (elements cast BEFORE the subtraction). Lengths must agree —
    * a mismatch fails loudly rather than silently diverging from the
    * zip_with null semantics it replaces. */
  def sqDistFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"sqdist over unequal lengths: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Static body for SqDistLD: quantized-long vs double-centroid
    * squared L2, same fold order as the HOF form. */
  def sqDistLD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"sqdist over unequal lengths: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getLong(i).toDouble - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Static body for LshSig: per plane p, left-fold over d = 0..63 of
    * v[d] · coef(p,d), coef = ((1 + (p·64+d)·2654435761) mod 1000003)
    * − 500001 — identical arithmetic and order to VecFns.lshSignature
    * and the oracle's sigs CTE. */
  def lshSig(v: ArrayData, nPlanes: Int): Long = lshSig(v, nPlanes, 0)

  /** planeOffset selects an independent hyperplane TABLE: plane p of
    * table t draws its coefficients at global plane index
    * t·nPlanes + p, so tables never share a hyperplane. */
  def lshSig(v: ArrayData, nPlanes: Int, planeOffset: Int): Long = {
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var d = 0
      while (d < 64) {
        val coef = ((1L + ((planeOffset + p).toLong * 64 + d) * 2654435761L) % 1000003L) - 500001L
        proj += v.getFloat(d).toDouble * coef.toDouble
        d += 1
      }
      if (proj > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** nPlanes-bit random-hyperplane signature of a float vector. */
case class LshSig(child: Expression, nPlanes: Int, planeOffset: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(FloatType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VecExprs.lshSig(v.asInstanceOf[ArrayData], nPlanes, planeOffset)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VecExprs.lshSig($c, $nPlanes, $planeOffset)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Fold-exact squared L2 between two float arrays (the ANN-PQ
  * sub-space distance), in double. Codegen calls the static loop so
  * whole-stage codegen stays alive. */
case class SqDistFF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.sqDistFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecExprs.sqDistFF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Fold-exact squared L2 between a quantized long vector and a
  * double centroid (the k-means assignment distance). */
case class SqDistLD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(LongType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.sqDistLD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecExprs.sqDistLD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Fixed-order dot product of two float arrays, in double. Codegen
  * calls the static loop so whole-stage codegen stays alive. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecExprs.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
