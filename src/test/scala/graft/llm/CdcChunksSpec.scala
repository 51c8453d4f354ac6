package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextOps.cdcChunks]] — LBFS content-defined chunking. */
class CdcChunksSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // deterministic ~600-char pseudo-text (no RNG — repeatable plans)
  private val text: String =
    (1 to 120).map(i => ((i * 7919) % 26 + 'a').toChar.toString * (i % 4 + 1))
      .mkString(" ")

  private def chunksOf(ts: (Long, String)*): Map[Long, Seq[String]] =
    ts.toSeq.toDF("id", "t")
      .select(col("id"), TextOps.cdcChunks(col("t"), 16, "03").as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("chunks reassemble to the original text, in order, no empties") {
    val c = chunksOf(1L -> text)(1L)
    assert(c.mkString === text)
    assert(c.forall(_.nonEmpty))
    assert(c.size > 3) // the fixture is long enough to actually split
  }

  test("a prefix insertion preserves every chunk after the touched span") {
    val m = chunksOf(1L -> text, 2L -> ("XYZ " + text))
    val (a, b) = (m(1L), m(2L))
    // boundaries depend only on window content: once past the 16-char
    // window spanning the insertion, the cut positions coincide, so at
    // most the first chunk of each differs
    assert(a.tail.toSet.subsetOf(b.toSet))
    // contrast: fixed-width chunking shares nothing after a shift
    val fixedA = text.grouped(64).toSeq
    val fixedB = ("XYZ " + text).grouped(64).toSeq
    assert(fixedA.toSet.intersect(fixedB.toSet).isEmpty)
  }

  test("short and empty texts: one chunk / no chunks") {
    val m = chunksOf(1L -> "tiny", 2L -> "")
    assert(m(1L) === Seq("tiny"))
    assert(m(2L) === Seq.empty)
  }

  test("mean chunk length tracks the 1/64 boundary odds") {
    val long = (text + " ") * 20 // ~12k chars
    val c = chunksOf(1L -> long)(1L)
    val mean = long.length.toDouble / c.size
    assert(mean > 20 && mean < 200, s"mean chunk $mean")
  }
}
