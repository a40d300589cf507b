package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass builders for the dedup operators' candidate
  * sets. Semantics mirror the composed definitions exactly:
  *
  *  - ShingleSet(text, w)  == array_distinct(tokenShingles(text, w))
  *    with tokens = lower(text) split on \s+ (Java regex, limit -1 —
  *    Spark's split semantics), shingles joined by single spaces,
  *    whole token string when fewer than w tokens.
  *  - CharNGramSet(text, n) == TextFns.charNGrams(text, n)
  *    (distinct n-grams of lower(text); the whole string when
  *    shorter than n).
  *
  * Distinct keeps first-occurrence order (array_distinct's rule);
  * all downstream uses are order-free (min / set sizes / explode).
  */
object TextExprs {
  def shingleSetCol(text: Column, w: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), w))
  def charNGramSetCol(text: Column, n: Int): Column =
    ColumnBridge.column(CharNGramSet(ColumnBridge.expression(text), n))
  def winnowMinsCol(text: Column, k: Int, w: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(WinnowMins(ColumnBridge.expression(text), k, w, distinct))

  /** Static body for WinnowMins (also called from generated code):
    * the windowed-minimum sequence of the k-gram polyhashes of an
    * ALREADY-LOWERCASED string — identical, element for element, to
    * the HOF pipeline it replaces
    * (transform(sequence) ∘ polyHash(substr) ∘ array_min(slice),
    * TextAnalysis.winnowArrays) and to the DuckDB oracle's
    * list_transform shape, but one tight code-point pass: direct
    * O(k) gram hashing (k is 8 — rolling buys nothing at that width)
    * and a monotonic-deque sliding min, zero intermediate arrays.
    * The interpreted HOF tree was the single most expensive scan in
    * the engine (~6 s for 5k docs at sf0.1 — HOFs don't codegen);
    * this is the same numbers at scan speed.
    *
    * Window minima use the LEFTMOST-min tie rule implicitly: ties
    * are value-equal so which position wins is unobservable (the
    * output is the VALUE sequence). Grams count < w degrades to one
    * global min; no grams (len < k) yields an empty array — both
    * exactly the HOF when() branches.
    *
    * `distinct = true` fuses array_distinct in (first-occurrence
    * order, array_distinct's rule) so the ~(w+1)/2-fold repeated
    * window minima never materialize — every consumer of the
    * distinct form is a set function (explode→join, size, sum, min),
    * so order is unobservable there too. */
  def winnowMins(v: UTF8String, k: Int, w: Int, distinct: Boolean): ArrayData = {
    val cps = v.toString.codePoints().toArray
    val n = cps.length
    val g = n - k + 1
    if (g <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](g)
    val P = HashExprs.P
    var i = 0
    while (i < g) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31L + cps(i + j)) % P; j += 1 }
      hs(i) = h
      i += 1
    }
    if (g < w) {
      var m = hs(0); i = 1
      while (i < g) { if (hs(i) < m) m = hs(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    val out = new Array[Long](g - w + 1)
    val deque = new Array[Int](g) // indices, increasing hs values
    var head = 0; var tail = 0    // [head, tail)
    i = 0
    while (i < g) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = hs(deque(head))
      i += 1
    }
    if (!distinct) return new GenericArrayData(out)
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    val ded = new Array[Long](out.length)
    var d = 0
    i = 0
    while (i < out.length) {
      if (seen.add(out(i))) { ded(d) = out(i); d += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ded, d))
  }

  /** Static body for ShingleSet (also called from generated code). */
  def shingles(v: UTF8String, w: Int): ArrayData = {
    val toks = v.toString.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val out = new mutable.LinkedHashSet[String]
    if (toks.length >= w) {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + w <= toks.length) {
        sb.setLength(0)
        var k = 0
        while (k < w) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        out += sb.toString
        i += 1
      }
    } else out += toks.mkString(" ")
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** Static body for CharNGramSet (also called from generated code).
    * Windows are CODE-POINT indexed: Spark's length()/substring() and
    * DuckDB's length()/substr() both count code points, so a UTF-16
    * window would shift every gram after the first non-BMP char. */
  def ngrams(v: UTF8String, n: Int): ArrayData = {
    val s = v.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new mutable.LinkedHashSet[String]
    val cps = s.codePoints().toArray
    if (cps.length >= n) {
      var i = 0
      while (i + n <= cps.length) { out += new String(cps, i, n); i += 1 }
    } else out += s
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }
}

case class WinnowMins(child: Expression, k: Int, w: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextExprs.winnowMins(v.asInstanceOf[UTF8String], k, w, distinct)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextExprs.winnowMins($c, $k, $w, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class ShingleSet(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextExprs.shingles(v.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextExprs.shingles($c, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class CharNGramSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextExprs.ngrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextExprs.ngrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
