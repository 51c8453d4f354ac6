package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD'03) as ONE
  * native pass: hash every char `k`-gram (md5), slide a window of `w`
  * consecutive gram hashes, collect the distinct window minima as
  * lowercase hex strings.
  *
  * This collapses the whole
  * `posexplode(grams) → md5 → window-min → filter → distinct`
  * pipeline — ~len rows per document through a shuffle plus a per-doc
  * window sort — into a scan-local expression: the selected-value set
  * is per-document, so no stage of it ever needed a shuffle. The
  * sliding minimum is a monotonic deque (amortized O(1) per gram;
  * total O(len) comparisons), digests are compared as unsigned bytes
  * (identical order to comparing their lowercase-hex forms, which is
  * what the SQL formulation compares), and hex encoding happens only
  * when the window minimum *changes* — expected 2·len/(w+1) times,
  * not once per window.
  *
  * Multi-byte UTF-8 is sliced through a char→byte offset table like
  * [[CharNgramSet]], so char-position semantics match SQL `substr`.
  * Docs shorter than one window (numChars < k + w − 1) yield [].
  * Result order is first-selection order — deterministic for a given
  * input; callers (explode→pair-join, size/min/max summaries) are
  * order-insensitive.
  */
@ExpressionDescription(
  usage = "winnow_set(text, k, w) - distinct winnowing-selected md5 k-gram hashes, window w.")
case class WinnowSet(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 2, s"degenerate winnow k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"winnow_set: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckSuccess
  }

  override protected def nullSafeEval(in: Any): Any =
    WinnowSet.compute(in.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowSet.compute($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSet {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val numChars = text.numChars()
    if (numChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    // char -> byte offset table (ASCII degenerates to identity)
    val offsets = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (c < numChars) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(numChars) = bytes.length

    val md = md5.get()
    val grams = numChars - k + 1
    // monotonic deque over (pos, digest): entries ascend by digest, so
    // the head is always the current window minimum
    val cap = w + 1
    val qpos = new Array[Int](cap)
    // per-slot digest buffers, reused for the whole document: the
    // 3-arg digest() + a 16-byte copy into the slot avoids the
    // per-gram Array[Byte] allocation md.digest() would make — ~1
    // allocation per CHARACTER of corpus text, pure GC pressure.
    // Slot qt is dead at write time (popped or never filled) and
    // `seen` copies to hex on selection, so no live digest is ever
    // overwritten.
    val qdig = Array.fill(cap)(new Array[Byte](16))
    val scratch = new Array[Byte](16)
    var qh = 0
    var qt = 0 // exclusive; qh == qt means empty
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var lastSelPos = -1
    var i = 0
    while (i < grams) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      md.digest(scratch, 0, 16)
      while (qh != qt &&
          java.util.Arrays.compareUnsigned(qdig((qt - 1 + cap) % cap), scratch) >= 0) {
        qt = (qt - 1 + cap) % cap
      }
      qpos(qt) = i
      System.arraycopy(scratch, 0, qdig(qt), 0, 16)
      qt = (qt + 1) % cap
      val winStart = i - w + 1
      if (winStart >= 0) {
        while (qpos(qh) < winStart) qh = (qh + 1) % cap
        if (qpos(qh) != lastSelPos) { // min changed -> (maybe) new value
          lastSelPos = qpos(qh)
          seen.add(hex(qdig(qh)))
        }
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column API. */
  def winnowSet(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowSet(GraftBridge.expression(text), k, w))
}
