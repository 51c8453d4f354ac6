package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The k-min-hash signature of a shingle array as ONE native pass —
  * the `Dedup.minHashDigests`/`minHashAggs` scheme (md5x2-slice32:
  * per shingle, md5("0|"+s) and md5("1|"+s), each hex digest cut into
  * four 8-hex/32-bit slices; signature component j is the minimum of
  * slice j%4 of digest j/4 over all shingles) collapsed from
  * `explode → 2×md5 → groupBy(doc).agg(8×min)` — per-shingle row
  * materialization plus a doc-keyed hash aggregate — into a
  * scan-local expression. The signature is per-document, so no stage
  * of it ever needed a shuffle; the mins track as unsigned 32-bit
  * ints (numeric unsigned order ≡ lexicographic order of fixed-width
  * lowercase hex, which is what the SQL `min(substring(md5 ...))`
  * formulation compares) and hex-encode once per document, not once
  * per shingle.
  *
  * VALUE-IDENTICAL to the aggregate path — the DuckDB oracles replay
  * the same md5 slices digit for digit, and persisted IncrementalDedup
  * state stays comparable: this is the SAME hash family under
  * [[graft.llm.Dedup.MinHashScheme]] ("md5x2-slice32"), not a new
  * scheme. MinHashSigSpec pins component-for-component equality
  * against the explode+agg form; if this expression's values ever
  * diverge, that spec — and every minhash oracle — fails loudly.
  *
  * Null semantics match `explode_outer` + min-over-nulls: a null or
  * EMPTY shingle array (doc too short to shingle) returns NULL, so
  * `sig[j]` is null exactly where the aggregate's m_j was; null array
  * elements are skipped like md5(null) rows under min().
  */
@ExpressionDescription(
  usage = "minhash_sig(shingles, k) - k-component minhash signature (md5x2-slice32 scheme).")
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 8,
    s"md5x2-slice32 carries 2 digests = 8 slices, got k=$k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(
        s"minhash_sig: argument must be ARRAY<STRING>, got ${t.sql}")
    }
  }

  override protected def nullSafeEval(in: Any): Any =
    MinHashSig.compute(in.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($a, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
    code
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".getBytes
  private val SEED0 = "0|".getBytes
  private val SEED1 = "1|".getBytes

  /** 8-char lowercase hex of an unsigned 32-bit value. */
  private def hex8(v: Long): UTF8String = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      out(i) = HEX(((v >>> (28 - 4 * i)) & 0xfL).toInt)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    // per-slice unsigned mins; Long.MaxValue = "no shingle seen"
    val mins = Array.fill(8)(Long.MaxValue)
    val md = md5.get()
    val scratch = new Array[Byte](16)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val sb = arr.getUTF8String(i).getBytes
        var seed = 0
        while (seed < 2) {
          md.reset()
          md.update(if (seed == 0) SEED0 else SEED1)
          md.update(sb)
          md.digest(scratch, 0, 16)
          var s = 0
          while (s < 4) {
            val v = ((scratch(4 * s) & 0xffL) << 24) |
              ((scratch(4 * s + 1) & 0xffL) << 16) |
              ((scratch(4 * s + 2) & 0xffL) << 8) |
              (scratch(4 * s + 3) & 0xffL)
            val j = seed * 4 + s
            if (v < mins(j)) mins(j) = v
            s += 1
          }
          seed += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = hex8(mins(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** Column API. */
  def minHashSig(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), k))
}
