package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values aggregate: the k smallest DISTINCT double
  * inputs per group, as an ascending array — the KMV sketch state
  * (Bar-Yossef et al. RANDOM'02 / Beyer et al. SIGMOD'07) as a
  * first-class partial-aggregable state, replacing the
  * dense_rank-window form whose exchange carried k rows per (group ×
  * input partition) per group (the round-10 SCALE.md note: the
  * sketch family's highest 10x exponent). As a
  * TypedImperativeAggregate the k-bounded buffer combines MAP-SIDE —
  * the exchange carries at most ONE ≤k-element array per (group,
  * partition), the same partial-fold shape as the HLL register
  * aggregate — and merge is a bounded sorted-set union, so the result
  * is identical for ANY partitioning or arrival order (min-k
  * selection over exact dyadic doubles is order-free; no float-fold
  * hazard).
  *
  * The inputs are [[graft.llm.Sketches.hashUniform]] values: exact
  * dyadic rationals (v+0.5)/2^52, so set-distinctness on the doubles
  * is distinctness on the underlying 52-bit hashes. Serialization is
  * the raw little-endian double array (≤ 8k+4 bytes).
  */
case class KmvMinsAgg(child: Expression, k: Int,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]]
    with UnaryLike[Expression] {

  require(k > 0, s"kmv_mins: k must be positive, got $k")

  override def prettyName: String = "kmv_mins"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  private def insert(buf: java.util.TreeSet[java.lang.Double], v: Double): Unit = {
    // keep the set ≤ k: skip values no smaller than the current max
    // once full (TreeSet.add dedups re-inserts for free)
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Double],
                      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Double],
                     other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) {
      val v = it.next()
      // ascending iteration: once v can't enter, nothing later can
      if (buf.size() == k && v >= buf.last()) return buf
      insert(buf, v)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().doubleValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next().doubleValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinsAgg =
    copy(child = newChild)
}

/** [[KmvMinsAgg]]'s carrying form: the k smallest (hash, payload)
  * Long pairs per group by lexicographic (hash, payload) order,
  * evaluating to the PAYLOADS in that order — a bounded uniform
  * sample that carries a value column with it (the KMV trick applied
  * to sampling rather than distinct-counting: the k min-hash rows ARE
  * a uniform-without-replacement sample of the group, so order
  * statistics over their payloads estimate the group's quantiles).
  * Same map-side-combining TypedImperativeAggregate shape: the
  * exchange carries one ≤k-element buffer per (group, partition),
  * state is O(k), and min-k selection over exact integers is
  * arrival-order-free for any partitioning. Identical (hash, payload)
  * pairs dedup (the TreeSet) — callers hash a row-unique key so this
  * is unreachable short of an md5 collision inside one group.
  */
case class KmvPairsAgg(left: Expression, right: Expression, k: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, s"kmv_pairs: k must be positive, got $k")

  override def prettyName: String = "kmv_pairs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  private def cmp: java.util.Comparator[(Long, Long)] =
    new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](cmp)

  private def insert(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size() < k) { buf.add(p); () }
    else if (cmp.compare(p, buf.last()) < 0) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      insert(buf, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
                     other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      val p = it.next()
      if (buf.size() == k && cmp.compare(p, buf.last()) >= 0) return buf
      insert(buf, p)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvPairsAgg =
    copy(left = newLeft, right = newRight)
}

object KmvAgg {
  /** Aggregate Column: ascending array of the k smallest distinct
    * values of `u` in the group (fewer if the group has fewer
    * distinct values).
    */
  def kmvMins(u: Column, k: Int): Column =
    GraftBridge.column(
      KmvMinsAgg(GraftBridge.expression(u), k).toAggregateExpression())

  /** Aggregate Column: the payloads of the group's k lexicographically
    * smallest (hash, payload) Long pairs, in that pair order — a
    * bounded deterministic uniform sample carrying `v`.
    */
  def kmvPairs(h: Column, v: Column, k: Int): Column =
    GraftBridge.column(
      KmvPairsAgg(GraftBridge.expression(h), GraftBridge.expression(v), k)
        .toAggregateExpression())
}
