package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Multi-pattern substring matching (Aho & Corasick, "Efficient String
  * Matching: An Aid to Bibliographic Search", CACM 1975) as a native
  * expression — the dictionary-scan primitive behind C4-style
  * banned-wordlist filtering, where the dictionary is thousands of
  * terms and a regex alternation (`(?:t1|t2|…|tN)`) degrades to
  * per-position linear scans over the alternatives. The automaton
  * walks each document ONCE: O(bytes + matches) regardless of
  * dictionary size.
  *
  * Counting semantics are the AC classic: every (pattern, end
  * position) match counts, INCLUDING overlaps — "batch batch batch"
  * contains "batch batch" twice, which `replace`-based counting
  * silently undercounts. Patterns match as raw substrings (no word
  * boundaries); callers compose case folding (`lower(text)`) and
  * tokenization upstream when they want word-level semantics.
  *
  * The automaton matches over UTF-8 BYTES: UTF-8 is self-synchronizing,
  * so a valid UTF-8 pattern can only match at character boundaries —
  * byte-level matching is exactly character-level matching, without
  * decoding. Transitions are per-state sorted byte arrays + binary
  * search (bounded by log 256 = 8 probes) — a dense 256-way table
  * would cost ~1 KiB/state, which at a 10k-term dictionary is the
  * difference between an L2-resident automaton and a cache-thrashing
  * one. Built once per plan on the driver, shipped as a codegen
  * reference object, rebuilt lazily per executor after deserialization.
  */
final class AcAutomaton private (
    private val transBytes: Array[Array[Byte]],
    private val transNext: Array[Array[Int]],
    private val fail: Array[Int],
    private val hits: Array[Long]) extends Serializable {

  private def step(from: Int, b: Byte): Int = {
    var s = from
    while (true) {
      val keys = transBytes(s)
      var lo = 0
      var hi = keys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys(mid)
        if (k == b) return transNext(s)(mid)
        else if (k < b) lo = mid + 1
        else hi = mid - 1
      }
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Total (pattern, end-position) matches in `text`, overlaps included. */
  def countMatches(text: UTF8String): Long = {
    val bytes = text.getBytes
    var s = 0
    var total = 0L
    var i = 0
    while (i < bytes.length) {
      s = step(s, bytes(i))
      total += hits(s)
      i += 1
    }
    total
  }
}

object AcAutomaton {

  /** BFS trie construction with failure links; `hits(s)` pre-folds the
    * suffix-link chain (endCount(s) + hits(fail(s))), so matching never
    * walks output links at scan time.
    */
  def build(patterns: Seq[String]): AcAutomaton = {
    require(patterns.nonEmpty, "ac automaton: empty dictionary")
    require(patterns.forall(_.nonEmpty), "ac automaton: empty pattern")
    val trie = mutable.ArrayBuffer(mutable.TreeMap.empty[Byte, Int])
    val endCount = mutable.ArrayBuffer(0L)
    patterns.distinct.foreach { p =>
      var s = 0
      p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        s = trie(s).getOrElseUpdate(b, {
          trie += mutable.TreeMap.empty[Byte, Int]
          endCount += 0L
          trie.length - 1
        })
      }
      endCount(s) += 1L
    }
    val n = trie.length
    val fail = new Array[Int](n)
    val hits = endCount.toArray
    val queue = mutable.Queue.empty[Int]
    trie(0).foreach { case (_, child) => fail(child) = 0; queue += child }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      hits(s) += hits(fail(s))
      trie(s).foreach { case (b, child) =>
        // resolve the child's failure state by walking s's fail chain
        var f = fail(s)
        var resolved = -1
        while (resolved == -1) {
          trie(f).get(b) match {
            case Some(t) => resolved = t
            case None if f == 0 => resolved = 0
            case None => f = fail(f)
          }
        }
        fail(child) = resolved
        queue += child
      }
    }
    new AcAutomaton(
      trie.map(_.keysIterator.toArray).toArray,
      trie.map(_.valuesIterator.toArray).toArray,
      fail, hits)
  }
}

/** `ac_count(text, dictionary)`: total dictionary-term occurrences in
  * `text` (overlapping, per pattern, per end position). The dictionary
  * is a plan-time literal — the automaton builds once and rides the
  * generated code as a reference object, never per row.
  */
@ExpressionDescription(
  usage = "ac_count(text, array('t1','t2',…)) - total Aho-Corasick dictionary matches, overlaps included.")
case class AcCount(child: Expression, patterns: Seq[String]) extends UnaryExpression {
  require(patterns.nonEmpty, "ac_count: empty dictionary")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"ac_count: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckSuccess
  }

  @transient private lazy val automaton: AcAutomaton = AcAutomaton.build(patterns)

  override protected def nullSafeEval(in: Any): Any =
    automaton.countMatches(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.countMatches($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AcCount {
  /** Column API. */
  def acCount(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(AcCount(GraftBridge.expression(text), patterns))
}
