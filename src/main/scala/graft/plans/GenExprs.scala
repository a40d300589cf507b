package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating expressions (UDTF coverage): one input row
  * fans out to N output rows through Catalyst's `Generate` operator —
  * the same execution path as `explode`/`posexplode`, so the fan-out
  * is scan-local (zero shuffle) and composes with any downstream
  * plan. A custom Generator is the right tool when the per-row
  * expansion has structure a `sequence`+`transform`+`posexplode`
  * composition would re-materialize per element (here: each window
  * re-slices and re-joins the token array; the generator walks the
  * array once and emits windows as it goes, never building the
  * intermediate array-of-windows at all).
  */
object GenExprs {
  def tokenWindowsCol(tokens: Column, size: Int, stride: Int): Column =
    ColumnBridge.column(TokenWindows(ColumnBridge.expression(tokens), size, stride))
}

/** Sliding token windows with stride — the context-window chunking
  * step of LLM training-sample construction ("split each document
  * into ≤`size`-token windows every `stride` tokens, overlap =
  * size − stride"). Window starts are 0, stride, 2·stride, … while
  * start < nTokens, so the tail window may be short and every token
  * belongs to ≥1 window; a null/empty token array generates no rows
  * (the explode convention — absent, not null-row).
  *
  * Emits (win_idx, win_len, win_text). Deterministic and purely
  * positional, so the DuckDB oracle replays it with range + list
  * slicing.
  */
case class TokenWindows(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback with ExpectsInputTypes {
  require(size >= 1, s"TokenWindows requires size >= 1, got $size")
  require(stride >= 1, s"TokenWindows requires stride >= 1, got $stride")

  override def inputTypes: Seq[DataType] =
    Seq[DataType](ArrayType(StringType, containsNull = false))
  override def elementSchema: StructType = StructType(Seq(
    StructField("win_idx", LongType, nullable = false),
    StructField("win_len", LongType, nullable = false),
    StructField("win_text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // inside the anonymous Iterator, a bare `size` is Iterator.size
      // (which CONSUMES the iterator via next() — infinite recursion),
      // so the window width is pinned to a local first
      val winSize = size
      if (n == 0) Iterator.empty
      else new Iterator[InternalRow] {
        private var idx = 0L
        override def hasNext: Boolean = idx * stride < n
        override def next(): InternalRow = {
          val start = (idx * stride).toInt
          val len = math.min(winSize, n - start)
          val parts = new Array[UTF8String](len)
          var k = 0
          while (k < len) { parts(k) = arr.getUTF8String(start + k); k += 1 }
          val row = InternalRow(idx, len.toLong,
            UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
          idx += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
