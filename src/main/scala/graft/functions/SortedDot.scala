package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Sparse integer dot product over two KEY-SORTED term vectors, each
  * a STRUCT of three aligned ARRAY<BIGINT> fields (k1, k2, w): 128-bit
  * feature digests split into two longs plus the quantized weight,
  * sorted ascending by (k1, k2). One two-pointer merge per row over
  * primitive `getLong` reads — zero per-element allocation.
  *
  * Why this shape (measured on `llm_allpairs_sim`'s 635 k candidate
  * verifications, 81 M element visits, at sf0.1): a struct-per-element
  * merge pays an UnsafeRow + UTF8String allocation per visit (3.4 s);
  * `map_zip_with` + `aggregate` builds an interpreted hash map per row
  * (4.9 s); the exploded token join shuffles candidates × doc-length
  * intermediate rows (32 M rows, the original 14 s plan). The
  * primitive merge does the same order-free integer sum in one
  * compiled call.
  *
  * Key contract: (k1, k2) come from two independent 64-bit hashes of
  * the feature string (xxhash64 under two seeds) — a cross-feature
  * collision needs both to collide (~2⁻¹²⁸, the md5-digest-key
  * standard the dedup operators already rely on). Arrays must be
  * aligned, sorted ascending by (k1, k2), keys unique per vector; the
  * integer sum is order-free so the result is engine-portable.
  */
object SortedDot {

  /** Σ over keys present in both vectors of wa·wb (two-pointer merge). */
  def dot(a: InternalRow, b: InternalRow): Long = {
    val k1a = a.getArray(0); val k2a = a.getArray(1); val wa = a.getArray(2)
    val k1b = b.getArray(0); val k2b = b.getArray(1); val wb = b.getArray(2)
    val n = k1a.numElements()
    val m = k1b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      val a1 = k1a.getLong(i)
      val b1 = k1b.getLong(j)
      if (a1 == b1) {
        val a2 = k2a.getLong(i)
        val b2 = k2b.getLong(j)
        if (a2 == b2) {
          acc += wa.getLong(i) * wb.getLong(j)
          i += 1; j += 1
        } else if (a2 < b2) i += 1
        else j += 1
      } else if (a1 < b1) i += 1
      else j += 1
    }
    acc
  }

  private def checkArg(e: Expression): TypeCheckResult = e.dataType match {
    case StructType(fs) if fs.length == 3 &&
      fs.forall(_.dataType.isInstanceOf[ArrayType]) &&
      fs.forall(_.dataType.asInstanceOf[ArrayType].elementType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_dot: argument must be STRUCT<ARRAY<BIGINT> ×3>, got ${other.sql}")
  }

  case class SortedDotExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkArg(left)
      if (l.isFailure) l else checkArg(right)
    }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dot(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.SortedDot.dot($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column API: both sides `struct(k1, k2, w)` of aligned sorted
    * ARRAY<BIGINT> columns.
    */
  def sortedDot(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedDotExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
