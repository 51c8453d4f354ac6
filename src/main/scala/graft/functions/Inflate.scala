package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** DEFLATE decompression as a native expression — the decode step of
  * Bittrex SignalR WS frames, which arrive base64-encoded and
  * raw-deflate-compressed (reference fetchers/ws/bittrex.py:324-336:
  * `decompress(b64decode(msg), -MAX_WBITS)` with a plain-zlib
  * fallback). Raw (headerless) inflate is tried first, then
  * zlib-headered; a frame that decodes under neither yields NULL
  * instead of killing the stream — the same contract as the try_-safe
  * parsers in [[graft.ingest.ExchangeFormats]].
  *
  * Codegen emits a single static call, so frame decode stays inside
  * WholeStageCodegen (the inflate itself dominates; the point is not
  * to break the stage's pipeline into an interpreted boundary).
  */
@ExpressionDescription(
  usage = "graft_inflate(bin) - DEFLATE-decompress (raw, then zlib), NULL if undecodable.")
case class Inflate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != BinaryType)
      TypeCheckFailure(s"graft_inflate: argument must be BINARY, got ${child.dataType.sql}")
    else TypeCheckSuccess
  }

  override protected def nullSafeEval(in: Any): Any =
    Inflate.tryInflate(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.functions.Inflate.tryInflate($b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Inflate {
  /** Decompression bomb guard: a WS candle frame inflates to a few KB;
    * anything past this bound is hostile or corrupt and degrades to
    * NULL like any other undecodable frame. (The reference inflates
    * unbounded — bittrex.py:331-335 — which a crafted capture could
    * use to OOM the process; an engine executor can do better.)
    */
  val MaxOutputBytes: Int = 8 << 20

  /** Raw-deflate inflate, zlib-headered fallback, null on failure or
    * past `maxBytes` of output. Mirrors the reference's try order
    * (bittrex.py:331-335).
    */
  def tryInflate(in: Array[Byte]): Array[Byte] = tryInflate(in, MaxOutputBytes)

  def tryInflate(in: Array[Byte], maxBytes: Int): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(in)
        val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 4))
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            throw new java.util.zip.DataFormatException("truncated or dictionary frame")
          if (out.size().toLong + n > maxBytes)
            throw new java.util.zip.DataFormatException(
              s"inflated output exceeds $maxBytes bytes (deflate bomb?)")
          out.write(buf, 0, n)
        }
        out.toByteArray
      } finally inf.end()
    }
    try run(true)
    catch {
      case _: Exception =>
        try run(false)
        catch { case _: Exception => null }
    }
  }

  /** Column API. */
  def inflate(c: Column): Column =
    GraftBridge.column(Inflate(GraftBridge.expression(c)))
}
