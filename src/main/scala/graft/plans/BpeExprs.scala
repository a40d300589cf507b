package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE pair-merge rewrite — the per-word inner loop of a BPE
  * tokenizer trainer. Greedy left-to-right: scanning the symbol array
  * once, every occurrence of the adjacent pair (a, b) whose left
  * symbol was not already consumed by the previous merge collapses to
  * the concatenated symbol (so "aaa" under (a,a) becomes ["aa","a"],
  * never ["a","aa"]).
  *
  * Greedy-equivalence note (the oracle contract): within a maximal
  * run of consecutive match positions, greedy left-to-right merges
  * exactly the EVEN offsets of the run — merging position i consumes
  * i+1, so the next mergeable position is i+2. The DuckDB oracle
  * replays the rewrite with that run-parity rule (islands + row
  * parity), which is provably the same selection; the spec holds the
  * equivalence on engineered runs.
  */
object Bpe {
  def mergePair(syms: Column, a: Column, b: Column): Column =
    ColumnBridge.column(BpeMergePair(
      ColumnBridge.expression(syms), ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def merge(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (i + 1 < n && a.equals(arr.getUTF8String(i)) &&
          b.equals(arr.getUTF8String(i + 1))) {
        out(m) = UTF8String.concat(a, b)
        i += 2
      } else {
        out(m) = arr.getUTF8String(i)
        i += 1
      }
      m += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** (symbols array<string>, a, b) → symbols with every greedy
  * left-to-right (a, b) adjacency collapsed to a||b. */
case class BpeMergePair(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq[DataType](ArrayType(StringType), StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    Bpe.merge(syms.asInstanceOf[ArrayData], a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression = copy(a, b, c)
}
