package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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
  def topCentroidsCol(emb: Column, nrm: Column, cids: Array[Long],
      cvecs: Array[Array[Float]], cnrms: Array[Double], p: Int): Column =
    ColumnBridge.column(TopCentroids(ColumnBridge.expression(emb),
      ColumnBridge.expression(nrm), cids, cvecs, cnrms, p))

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

/** Scan-local top-P centroid assignment of one vector against a
  * plan-embedded codebook: returns `array<struct<cid, ccos>>` of the
  * P best centroids ordered (ccos DESC NULLS LAST, cid ASC) — the
  * native replacement for the N×nc crossJoin + per-vector row_number
  * window every IVF-family index build paid (the window sorted the
  * whole scored relation; this is one pass over the scan with a
  * P-cell insertion heap, inside whole-stage codegen).
  *
  * Arithmetic is the window spelling's exactly: ccos =
  * dot(emb, cvec) / (nrm · cnrm) with the fold-exact [[VecExprs.dot]]
  * left-fold, NULL when the vector, its norm, the centroid vector, or
  * the centroid norm is NULL (NaN stands for NULL in `cnrms`) — NULL
  * cosines rank LAST with ties by cid ASC, matching DESC-NULLS-LAST
  * + cid ASC. The codebook rides in the expression (the same
  * driver-collected rows `broadcast(cents)` shipped before);
  * at 10⁹ vectors the ~3.3M-entry codebook is where a deployment
  * goes hierarchical — documented at every call site. */
case class TopCentroids(emb: Expression, nrm: Expression,
    cids: Array[Long], cvecs: Array[Array[Float]], cnrms: Array[Double],
    p: Int) extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = emb
  override def right: Expression = nrm
  override def inputTypes: Seq[DataType] =
    Seq[DataType](ArrayType(FloatType), DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = true))), containsNull = false)

  // null inputs still assign (the window ranked their all-NULL
  // cosines by cid) — bypass the null-short-circuiting default eval
  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    val nv = nrm.eval(input)
    topP(if (e == null) null else e.asInstanceOf[ArrayData],
      if (nv == null) Double.NaN else nv.asInstanceOf[Double])
  }

  def topP(v: ArrayData, vnrm: Double): ArrayData = {
    val nC = cids.length
    val keep = math.min(p, nC)
    val hCos = new Array[Double](keep) // NaN slot = NULL ccos
    val hCid = new Array[Long](keep)
    var filled = 0
    var ci = 0
    while (ci < nC) {
      val cv = cvecs(ci)
      val cn = cnrms(ci)
      val cos =
        if (v == null || cv == null || java.lang.Double.isNaN(vnrm) ||
          java.lang.Double.isNaN(cn)) Double.NaN
        else {
          var s = 0.0
          var i = 0
          val n = math.min(v.numElements(), cv.length)
          while (i < n) { s += v.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
          s / (vnrm * cn)
        }
      val cid = cids(ci)
      // better(a, b): non-NULL beats NULL, higher cos beats lower,
      // lower cid breaks ties (incl. the all-NULL tie)
      @inline def better(cos2: Double, cid2: Long, cos1: Double, cid1: Long): Boolean = {
        val n2 = java.lang.Double.isNaN(cos2)
        val n1 = java.lang.Double.isNaN(cos1)
        if (n2 != n1) n1
        else if (!n2 && cos2 != cos1) cos2 > cos1
        else cid2 < cid1
      }
      if (filled < keep || better(cos, cid, hCos(keep - 1), hCid(keep - 1))) {
        var q = if (filled < keep) filled else keep - 1
        while (q > 0 && better(cos, cid, hCos(q - 1), hCid(q - 1))) {
          hCos(q) = hCos(q - 1); hCid(q) = hCid(q - 1); q -= 1
        }
        hCos(q) = cos; hCid(q) = cid
        if (filled < keep) filled += 1
      }
      ci += 1
    }
    val out = new Array[Any](filled)
    var q = 0
    while (q < filled) {
      out(q) = InternalRow(hCid(q),
        if (java.lang.Double.isNaN(hCos(q))) null else hCos(q))
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("topCentroids", this,
      classOf[TopCentroids].getName)
    val embCode = emb.genCode(ctx)
    val nrmCode = nrm.genCode(ctx)
    val adCls = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        |${embCode.code}
        |${nrmCode.code}
        |$adCls ${ev.value} = $self.topP(
        |  ${embCode.isNull} ? null : ($adCls) ${embCode.value},
        |  ${nrmCode.isNull} ? Double.NaN : ${nrmCode.value});
      """.stripMargin,
      isNull = codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(emb = l, nrm = r)
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
