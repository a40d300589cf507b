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
  /** Per-group top-k (value desc, key asc) with a bounded buffer —
    * see [[TopKPairs]]. */
  def topKPairs(value: Column, key: Column, k: Int): Column =
    ColumnBridge.column(TopKPairs(ColumnBridge.expression(value),
      ColumnBridge.expression(key), k).toAggregateExpression())
  def countMin(e: Column, w: Int = CountMin.DefaultW): Column =
    ColumnBridge.column(CountMin(ColumnBridge.expression(e), w)
      .toAggregateExpression())
  /** Weighted updates: counters advance by `weight` per row — the
    * grid equals per-occurrence updates when weight is that item's
    * occurrence count, which lets a pre-aggregated relation feed the
    * sketch without re-scanning the raw data. */
  def countMinWeighted(e: Column, weight: Column, w: Int = CountMin.DefaultW): Column =
    ColumnBridge.column(CountMin(ColumnBridge.expression(e), w,
      weight = ColumnBridge.expression(weight)).toAggregateExpression())
  /** Upper-triangle Gram accumulation over quantized integer vectors —
    * see [[VecOuterSum]]. */
  def vecOuterSum(vec: Column): Column =
    ColumnBridge.column(VecOuterSum(ColumnBridge.expression(vec))
      .toAggregateExpression())
}

object CountMin {
  /** Rows (independent hash functions) and default bucket width. */
  val D = 4
  val DefaultW = 1024
  /** Pairwise-independent-hash parameters ((h·A + B) mod P31 mod w):
    * fixed integer constants so the DuckDB oracle evaluates the SAME
    * functions. The input is reduced mod P31 BEFORE the multiply, so
    * both factors stay < 2^31 and the product fits a 64-bit signed
    * integer for ANY Long input — without the reduction an |h| ≥ 2^31
    * would silently wrap here while the oracle's BIGINT multiply
    * raises (Spark-wraps vs DuckDB-raises split). For the canonical
    * callers (polynomial hashes in [0, 1e9+7)) the reduction is the
    * identity, so replayed oracle SQL needs no mod on its side; a
    * general caller feeding h outside [0, 2^31) must mirror the
    * floorMod(h, P31) reduction in its oracle. */
  val A: Array[Long] = Array(506952114L, 1013904228L, 1520856342L, 2027808456L)
  val B: Array[Long] = Array(12345L, 52848L, 93351L, 133854L)
  val P31 = 2147483647L

  def bucket(j: Int, h: Long, w: Int): Int = {
    val hr = Math.floorMod(h, P31)
    (Math.floorMod(Math.floorMod(hr * A(j) + B(j), P31), w.toLong)).toInt
  }
}


/** Count-Min frequency sketch as a custom Catalyst aggregate — the
  * frequency-estimation twin of [[KMinValues]]: a fixed D×w counter
  * grid regardless of how many distinct items stream through, so
  * heavy-hitter frequencies come out of O(D·w) memory where an exact
  * groupBy shuffles every distinct key. Partials merge by elementwise
  * addition (map-side combine works); estimates (min over the D
  * counters an item hashes to) only ever OVER-count, and the whole
  * grid is deterministic integer arithmetic the oracle replays. */
case class CountMin(child: Expression, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0,
    weight: Expression = Literal(1L))
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(w >= 1, s"CountMin requires bucket width >= 1, got $w")
  private val d = CountMin.D

  override def children: Seq[Expression] = Seq(child, weight)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0), weight = cs(1))
  override def inputTypes: Seq[DataType] = Seq[DataType](LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    val wt = weight.eval(input)
    if (v != null && wt != null) {
      val h = v.asInstanceOf[Long]
      val inc = wt.asInstanceOf[Long]
      var j = 0
      while (j < d) { buf(j * w + CountMin.bucket(j, h, w)) += inc; j += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMin =
    copy(inputAggBufferOffset = offset)
}

/** Per-group top-k as a custom Catalyst aggregate — the ranking twin
  * of [[KMinValues]]: a bounded heap of at most k (value, key) pairs
  * per aggregation buffer, so electing "top k per group" partial-
  * aggregates map-side and the shuffle carries AT MOST k structs per
  * group — where the window-function formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC)` then
  * `rn <= k`) must shuffle EVERY row and sort every group just to
  * throw all but k rows away. At 100 TB that is the difference
  * between a shuffle sized by groups·k and one sized by the fact
  * table. Extends q_argmax's max(struct) trick (k = 1) to any k.
  *
  * Ordering is total and deterministic: value DESC, key ASC on ties.
  * CONTRACT: (value, key) pairs are distinct within a group (true
  * whenever key is unique, e.g. a primary key) — the buffer is a
  * sorted set, so a duplicated pair would collapse to one entry.
  * Result is the rank-ordered array of (key, value) structs, so
  * posexplode yields rank = pos + 1 and the whole output is
  * bit-comparable with the oracle's ROW_NUMBER formulation. */
case class TopKPairs(value: Expression, key: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
    with ExpectsInputTypes {

  require(k >= 1, s"TopKPairs requires k >= 1, got $k")

  override def children: Seq[Expression] = Seq(value, key)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(value = cs(0), key = cs(1))
  override def inputTypes: Seq[DataType] = Seq[DataType](DoubleType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  /** Best-first total order: larger value first, smaller key first. */
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val v = value.eval(input)
    val ky = key.eval(input)
    if (v != null && ky != null) {
      buf.add((v.asInstanceOf[Double], ky.asInstanceOf[Long]))
      if (buf.size > k) buf.pollLast()      // evict the current worst
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[(Double, Long)],
      b2: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (v, ky) = it.next()
      out(i) = InternalRow(ky, v)           // rank order (best first)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (v, ky) = it.next(); bb.putDouble(v); bb.putLong(ky) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val set = new java.util.TreeSet[(Double, Long)](ord)
    var i = 0
    while (i < n) { set.add((bb.getDouble(), bb.getLong())); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
}

/** Upper-triangle Gram-matrix accumulator as a custom Catalyst
  * aggregate: input is a d-length quantized integer vector; the
  * buffer is the d·(d+1)/2 running cell sums plus the vector count,
  * updated IN PLACE with d·(d+1)/2 multiply-adds per row. The
  * explode-then-groupBy formulation materializes one struct per cell
  * per vector (corpus×2080 rows for d=64) before the hash aggregate —
  * this buffer does the same arithmetic with ZERO per-cell
  * materialization and partials that merge by elementwise addition,
  * so the shuffle carries one O(d²) buffer per map split at any
  * corpus size. Dimension is learned from the first vector; a
  * mismatched dimension fails loudly (a silent resize would corrupt
  * cell indices). Result: the (i, j, n, p) cell structs in row-major
  * upper-triangle order, bit-identical to the exploded formulation. */
case class VecOuterSum(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq[DataType](ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("p", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  // slot 0 = vector count; slots 1.. = upper-triangle cell sums.
  // Empty until the first vector fixes the dimension.
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    val cells = d * (d + 1) / 2
    val b = if (buf.length == 0) new Array[Long](1 + cells) else buf
    require(b.length == 1 + cells,
      s"VecOuterSum dimension mismatch: buffer has ${b.length - 1} cells, vector dim $d needs $cells")
    b(0) += 1L
    var idx = 1
    var i = 0
    while (i < d) {
      val xi = arr.getLong(i)
      var j = i
      while (j < d) { b(idx) += xi * arr.getLong(j); idx += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length,
      s"VecOuterSum dimension mismatch in merge: ${b1.length} vs ${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf.length == 0) return new GenericArrayData(Array.empty[Any])
    val cells = buf.length - 1
    // d(d+1)/2 = cells ⇒ d = (√(8·cells+1) − 1) / 2, exact for valid buffers
    val d = ((Math.sqrt(8.0 * cells + 1) - 1) / 2).round.toInt
    val n = buf(0)
    val out = new Array[Any](cells)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(idx) = InternalRow(i.toLong, j.toLong, n, buf(1 + idx))
        idx += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecOuterSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecOuterSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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
