package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression (SURVEY §2.10; the
  * text-cleaning step every LLM corpus pipeline runs before hashing or
  * deduplicating — decomposed sequences like `e` + U+0301 and their
  * precomposed forms must fingerprint identically or the same document
  * dodges exact-dedup across sources).
  *
  * Backed by `java.text.Normalizer` (ICU-grade, the JDK's Unicode
  * implementation — identical NFC results to DuckDB's utf8proc, which
  * the oracle uses). The expression stays inside WholeStageCodegen via
  * a static helper call; an already-normalized row (all ASCII
  * trivially is) passes one `Normalizer.isNormalized` scan and returns
  * the input buffer unchanged — no second string is built.
  */
@ExpressionDescription(
  usage = "nfc_normalize(text) - Unicode NFC (canonical composition) of text.")
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"nfc_normalize: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckSuccess
  }

  override protected def nullSafeEval(in: Any): Any =
    NfcNormalize.compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize one UTF8String. Fast path: already-normalized input
    * (all ASCII trivially is) returns the input object unchanged — no
    * String round-trip, no copy.
    */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def nfc(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
