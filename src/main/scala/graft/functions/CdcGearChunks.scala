package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gear-hash content-defined chunking as one native pass — the
  * production-throughput form of [[graft.llm.TextOps.cdcChunks]]'
  * boundary predicate (whose md5-per-position form exists for the
  * cross-engine oracle). Gear hashing (Xia et al., "Ddelta: A
  * deduplication-inspired fast delta compression approach", and
  * FastCDC, USENIX ATC'16) rolls `h = (h << 1) + gear(byte)` —
  * O(1) per byte with an implicit 64-byte window (each byte's
  * influence shifts out after 64 steps) — where the md5 window pays
  * a full digest per POSITION. CdcGearProbe measures the kernels
  * head-to-head on 20 M chars: 3.8 ns/char gear vs ~1 µs/char even
  * for the bounded-reference md5 expression form — the gap that
  * makes gear the only chunker to point at a 100 TB corpus.
  *
  * Boundary rule (FastCDC's normalized form simplified to the LBFS
  * contract): after ≥ `minLen` chars, cut where `(h & mask) == 0`
  * with `mask = (1 << maskBits) − 1` (expected chunk ≈ 2^maskBits
  * chars + minLen); force a cut at `maxLen`. The gear table is 256
  * splitmix64 values (Steele/Lea/Flood SPLASH'14 mixer — public,
  * seed-free, engine-portable). The hash is NOT reset at cuts —
  * gear's finite window makes boundaries content-local anyway, which
  * is what yields the insertion-robustness CDC exists for.
  *
  * Boundaries are tested at CHARACTER ends (multi-byte UTF-8 feeds
  * every byte to the hash but can never be split), so chunks always
  * reassemble to the input. Scan-local: array out, no shuffle, no
  * allocation beyond the output strings.
  */
@ExpressionDescription(
  usage = "cdc_gear_chunks(text, minLen, maxLen, maskBits) - gear-hash content-defined chunks.")
case class CdcGearChunks(child: Expression, minLen: Int, maxLen: Int,
                         maskBits: Int) extends UnaryExpression {
  require(minLen >= 1 && maxLen > minLen && maskBits >= 1 && maskBits <= 48,
    s"degenerate CDC minLen=$minLen maxLen=$maxLen maskBits=$maskBits")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"cdc_gear_chunks: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckSuccess
  }

  override protected def nullSafeEval(in: Any): Any =
    CdcGearChunks.compute(in.asInstanceOf[UTF8String], minLen, maxLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CdcGearChunks.compute($t, $minLen, $maxLen, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcGearChunks {

  /** splitmix64 finalizer (Steele/Lea/Flood, public domain reference
    * implementation) over the byte value — a fixed, seedless,
    * portable 256-entry gear table.
    */
  private[functions] val GEAR: Array[Long] = Array.tabulate(256) { b =>
    var z = b.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(text: UTF8String, minLen: Int, maxLen: Int,
              maskBits: Int): GenericArrayData = {
    val numChars = text.numChars()
    if (numChars == 0) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Any](numChars / (1 << maskBits) + 2)
    var h = 0L
    var chunkStartB = 0 // byte offset of current chunk start
    var chunkLenC = 0   // chars in current chunk
    var b = 0
    while (b < bytes.length) {
      val charBytes = UTF8String.numBytesForFirstByte(bytes(b))
      var j = 0
      while (j < charBytes) {
        h = (h << 1) + GEAR(bytes(b + j) & 0xff)
        j += 1
      }
      b += charBytes
      chunkLenC += 1
      if ((chunkLenC >= minLen && (h & mask) == 0L) || chunkLenC >= maxLen) {
        out.add(UTF8String.fromBytes(bytes, chunkStartB, b - chunkStartB))
        chunkStartB = b
        chunkLenC = 0
      }
    }
    if (b > chunkStartB)
      out.add(UTF8String.fromBytes(bytes, chunkStartB, b - chunkStartB))
    new GenericArrayData(out.toArray)
  }

  /** Column API. */
  def cdcGearChunks(text: Column, minLen: Int, maxLen: Int,
                    maskBits: Int): Column =
    GraftBridge.column(CdcGearChunks(GraftBridge.expression(text), minLen, maxLen, maskBits))
}
