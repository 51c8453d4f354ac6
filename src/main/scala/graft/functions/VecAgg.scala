package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise mean of array<double> vectors per group — the centroid
  * recompute of Lloyd's k-means as ONE map-side-combined aggregate.
  *
  * The previous form (posexplode → groupBy(cell, pos) avg → re-sort +
  * re-assemble) paid a dim× row explosion plus TWO exchanges per
  * k-means iteration; this buffer carries (per-position sum, count)
  * pairs, so the exchange is one ≤(k × partitions) set of dim-length
  * partials and the assemble is free. Measured on the kMeansFit family
  * (KmeansFitProbe): the fit loop's per-iteration job drops from 3
  * stages over N·dim exploded rows to 2 stages over N rows.
  *
  * Numerics: per-position partials fold in partition row order —
  * the SAME order the exploded avg() folded them (posexplode preserves
  * row order), and partial merge order is arrival order in both forms,
  * so this stays in the exact fixture-stability class documented on
  * [[graft.llm.Similarity.kMeansFit]] (avg() centroids are
  * summation-order-dependent; assignments only diverge on <1e-12
  * near-ties, absent in the fixtures).
  *
  * Ragged/null handling mirrors the exploded form: null arrays
  * contribute nothing, a null element at position p contributes
  * nothing to p, the result length is the max input length, and a
  * position with no non-null contributions evaluates to null. A group
  * with no non-null arrays evaluates to an empty array (the exploded
  * form dropped the group row entirely — callers group on cells that
  * exist because a vector does, so the case is unreachable there).
  */
case class VecMeanAgg(child: Expression,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMeanAgg.Buf]
    with UnaryLike[Expression] {

  override def prettyName: String = "vec_mean"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false

  // getDouble(i) on a 4-byte-stride float array reads garbage, not an
  // error — refuse anything but array<double> at analysis (callers
  // cast; the VecDot/VecL2Sq checkVec discipline).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_mean: argument must be ARRAY<DOUBLE> (cast first), got ${other.sql}")
    }

  override def createAggregationBuffer(): VecMeanAgg.Buf = new VecMeanAgg.Buf

  override def update(buf: VecMeanAgg.Buf, input: InternalRow): VecMeanAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.grow(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf.sums(i) += arr.getDouble(i)
          buf.counts(i) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VecMeanAgg.Buf, other: VecMeanAgg.Buf): VecMeanAgg.Buf = {
    buf.grow(other.len)
    var i = 0
    while (i < other.len) {
      buf.sums(i) += other.sums(i)
      buf.counts(i) += other.counts(i)
      i += 1
    }
    buf
  }

  override def eval(buf: VecMeanAgg.Buf): Any = {
    val out = new Array[Any](buf.len)
    var i = 0
    while (i < buf.len) {
      out(i) = if (buf.counts(i) > 0L) buf.sums(i) / buf.counts(i) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VecMeanAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.len)
    bb.putInt(buf.len)
    var i = 0
    while (i < buf.len) { bb.putDouble(buf.sums(i)); bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new VecMeanAgg.Buf
    buf.grow(n)
    var i = 0
    while (i < n) { buf.sums(i) = bb.getDouble; buf.counts(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMeanAgg =
    copy(child = newChild)
}

object VecMeanAgg {
  /** Growable (sums, counts) pair; `len` is the max input length seen. */
  final class Buf {
    var len: Int = 0
    var sums: Array[Double] = Array.emptyDoubleArray
    var counts: Array[Long] = Array.emptyLongArray
    def grow(n: Int): Unit = if (n > len) {
      if (n > sums.length) {
        val ns = new Array[Double](n); System.arraycopy(sums, 0, ns, 0, len); sums = ns
        val nc = new Array[Long](n); System.arraycopy(counts, 0, nc, 0, len); counts = nc
      }
      len = n
    }
  }
}

object VecAgg {
  /** Aggregate Column: elementwise mean of `vec` (cast to
    * array<double> by the caller if needed) over the group.
    */
  def vecMean(vec: Column): Column =
    GraftBridge.column(
      VecMeanAgg(GraftBridge.expression(vec)).toAggregateExpression())
}
