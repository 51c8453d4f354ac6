package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string as `array<string>`, one pass,
  * as a native expression. The builtin composition
  * `array_distinct(transform(sequence(...), i -> substr(text, i, n)))`
  * walks the text through three interpreted higher-order evaluations
  * and re-scans from the string head on every `substr` call; exploding
  * offsets instead forces the `Generate` to copy the whole document
  * into every offset row. This expression emits the gram set directly
  * (byte-sliced through a char→byte offset table, so multi-byte UTF-8
  * stays correct without quadratic rescans), keeping the shingling
  * stage codegen'd and the downstream explode rows gram-sized. The
  * dedup/similarity shingle path (SURVEY §2 LLM ops; reference
  * semantics per-document distinct shingles) is the sole caller shape.
  *
  * Set order is first-occurrence, deterministic for a given input —
  * but callers (min-hash, size, intersect) are order-insensitive.
  */
@ExpressionDescription(
  usage = "char_ngram_set(text, n) - distinct character n-grams, [] when shorter than n.")
case class CharNgramSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngram_set: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"char_ngram_set: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckSuccess
  }

  override protected def nullSafeEval(in: Any): Any =
    CharNgramSet.compute(in.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharNgramSet.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramSet {

  /** One pass over the UTF-8 bytes: offsets[c] = byte offset of char c,
    * then each gram is a byte slice [offsets(i), offsets(i+n)). ASCII
    * text degenerates to identity offsets with no rescanning.
    */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val numChars = text.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offsets = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (c < numChars) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(numChars) = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String](numChars * 2)
    var i = 0
    val last = numChars - n
    while (i <= last) {
      val start = offsets(i)
      seen.add(UTF8String.fromBytes(bytes, start, offsets(i + n) - start))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column API. */
  def charNgramSet(text: Column, n: Int): Column =
    GraftBridge.column(CharNgramSet(GraftBridge.expression(text), n))
}
