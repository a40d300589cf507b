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
