package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst
  * aggregate (TypedImperativeAggregate) — the bounded-memory sketch
  * shape a 100 TB pipeline uses where COUNT(DISTINCT) would shuffle
  * every distinct value:
  *
  *  - the aggregation buffer holds at most k distinct hash values
  *    (a capped TreeSet), so partial aggregation buffers are O(k)
  *    regardless of group cardinality — the property the exact
  *    distinct lacks;
  *  - partials merge by set-union-then-trim, so map-side combine
  *    works and the shuffle carries at most k longs per group;
  *  - the result (sorted ascending array of the k smallest distinct
  *    hashes) is fully deterministic, so the DuckDB oracle can
  *    compute the identical sketch with list_sort/list_distinct and
  *    the estimate (k-1)·M/kth stays bit-comparable.
  */
object Sketch {
  def kMinValues(e: Column, k: Int): Column =
    ColumnBridge.column(KMinValues(ColumnBridge.expression(e), k)
      .toAggregateExpression())
}


case class KMinValues(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {

  // k <= 0 would silently produce always-empty sketches (update adds
  // then immediately evicts) and break element_at(kmv, k) consumers —
  // misconfiguration fails loudly at construction instead
  require(k >= 1, s"KMinValues requires k >= 1, got $k")

  override def inputTypes: Seq[DataType] = Seq[DataType](LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()    // keep the k smallest distinct
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)               // ascending (TreeSet order)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong()); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinValues =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValues =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
