package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary heap with the WORST kept element at the
  * root (lowest score, then largest id), so a better candidate evicts in
  * O(log k) and everything below the current top-k is rejected in O(1).
  * "Better" = higher score, ties broken by smaller id — the same total
  * order as `ORDER BY score DESC, id` in the oracles.
  */
final class TopKHeap(val k: Int) {
  private[graft] var n = 0
  private[graft] val scores = new Array[Double](k)
  private[graft] val ids = new Array[Long](k)

  // a strictly worse than b (heap property: parent worse than children)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def insert(s0: Double, id: Long): Unit = {
    // normalize -0.0 to 0.0 on entry: the heap's IEEE comparator treats
    // the two as equal (id tie-break) while sortedDesc's total ordering
    // ranks 0.0 above -0.0 — at the top-k boundary the kept id could
    // then diverge from the `ORDER BY score DESC, id` oracle order.
    // Spark itself normalizes -0.0 for sort/group keys
    // (NormalizeFloatingNumbers), so this matches the engine contract.
    val s = if (s0 == 0.0) 0.0 else s0
    if (n < k) {
      var i = n; scores(i) = s; ids(i) = id; n += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // index of worst among i and its children
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  def absorb(o: TopKHeap): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
  }

  /** (score, id) pairs best-first. */
  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortBy { case (s, i) => (-s, i) }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(k).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // stored elements already satisfy the heap property positionally
    while (i < n) { h.scores(i) = bb.getDouble(); h.ids(i) = bb.getLong(); i += 1 }
    h.n = n
    h
  }
}

/** Partial-aggregatable exact top-k: `topk_by_score(score, id, k)` returns
  * the k (score, id) pairs with the highest scores per group, as
  * `array<struct<score double, id bigint>>` sorted best-first.
  *
  * This is the shuffle shape a window `row_number() <= k` cannot have:
  * the window moves EVERY candidate row through an exchange and a sort;
  * this aggregate's map-side partial keeps at most k rows per (partition,
  * group), so the exchange carries O(groups x partitions x k) rows no
  * matter how large the scored candidate set is — the difference between
  * a 100 TB scan and a 100 TB shuffle. (Beyond-reference: the reference's
  * native agg surface is SUM/MIN/MAX/COUNT only, FunctionType.java:31-37;
  * its front-end computes top-k via sort+limit.)
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  require(k > 0, "topk_by_score requires k > 0")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType()
      .add("score", DoubleType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN never compares "worse" under IEEE <, so a NaN admitted while the
    // heap is under capacity could never be evicted and would permanently
    // displace a real result — non-finite scores are unrankable, skip them
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.absorb(other); buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map {
      case (s, i) => InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAggregate {
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKByScore(
      ExpressionUtils.expression(score),
      ExpressionUtils.expression(id), k).toAggregateExpression())

  def vec_sum_count(v: Column): Column =
    ExpressionUtils.column(
      VecSumCount(ExpressionUtils.expression(v)).toAggregateExpression())
}

/** Elementwise-sum + count buffer for [[VecSumCount]]: one double per
  * dimension plus the number of well-formed rows absorbed. */
final class VecSumBuf {
  private[graft] var sums: Array[Double] = null
  private[graft] var n = 0L

  def add(v: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val m = v.numElements()
    if (sums == null) sums = new Array[Double](m)
    if (m == sums.length) {
      // reject rows carrying null elements WITHOUT partial mutation
      var i = 0
      var ok = true
      while (ok && i < m) { if (v.isNullAt(i)) ok = false; i += 1 }
      if (ok) {
        i = 0
        while (i < m) { sums(i) += v.getDouble(i); i += 1 }
        n += 1
      }
    }
  }

  def absorb(o: VecSumBuf): Unit =
    if (o.sums != null) {
      if (sums == null) { sums = o.sums; n = o.n }
      else if (o.sums.length == sums.length) {
        var i = 0
        while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
        n += o.n
      }
    }

  def toBytes: Array[Byte] = {
    val len = if (sums == null) 0 else sums.length
    val bb = ByteBuffer.allocate(12 + 8 * len)
    bb.putLong(n).putInt(len)
    var i = 0
    while (i < len) { bb.putDouble(sums(i)); i += 1 }
    bb.array()
  }
}

object VecSumBuf {
  def fromBytes(bytes: Array[Byte]): VecSumBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new VecSumBuf
    b.n = bb.getLong()
    val len = bb.getInt()
    if (len > 0 || b.n > 0) {
      b.sums = new Array[Double](len)
      var i = 0
      while (i < len) { b.sums(i) = bb.getDouble(); i += 1 }
    }
    b
  }
}

/** Partial-aggregatable elementwise vector sum with row count:
  * `vec_sum_count(v)` returns `struct<sums array<double>, n bigint>` —
  * the per-cluster mean numerator/denominator of the IVF k-means step in
  * ONE aggregate. The posexplode formulation this replaces multiplies the
  * assignment output by the embedding dimension and pays two extra
  * exchanges per training iteration (groupBy(cid, i) then groupBy(cid));
  * this map-side partial keeps one dim-length buffer per (partition,
  * cluster), so the exchange carries O(clusters x partitions) rows of one
  * array each. Rows that are null, dimension-mismatched (vs the first row
  * absorbed), or carry null elements are skipped — the trainer's inputs
  * are fixed-dimension by construction. Null when no row was absorbed. */
case class VecSumCount(
    v: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def children: Seq[Expression] = Seq(v)
  override def nullable: Boolean = true
  override def dataType: DataType = new StructType()
    .add("sums", ArrayType(DoubleType, containsNull = false), nullable = false)
    .add("n", LongType, nullable = false)
  override def prettyName: String = "vec_sum_count"

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf

  override def update(buffer: VecSumBuf, input: InternalRow): VecSumBuf = {
    val a = v.eval(input)
    if (a != null)
      buffer.add(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    buffer
  }

  override def merge(buffer: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    buffer.absorb(other); buffer
  }

  override def eval(buffer: VecSumBuf): Any =
    if (buffer.n == 0L) null
    else InternalRow(new GenericArrayData(buffer.sums), buffer.n)

  override def serialize(buffer: VecSumBuf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): VecSumBuf =
    VecSumBuf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumCount =
    copy(v = newChildren(0))
}
