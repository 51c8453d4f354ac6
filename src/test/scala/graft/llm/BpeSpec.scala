package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bpe]] against the classic in-memory BPE reference (Sennrich
  * ACL'16 fig. 1 algorithm over a word-frequency dict).
  */
class BpeSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  /** Straightforward reference: greedy leftmost merge per word. */
  private def referenceBpe(wf: Map[String, Long],
                           merges: Int): Seq[(String, String, Long)] = {
    var words = wf.map { case (w, c) => (w.map(_.toString).toList, c) }.toList
    val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    for (_ <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, c) =>
        sym.zip(sym.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        words = words.map { case (sym, wc) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < sym.length) {
            if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += sym(i); i += 1 }
          }
          (merged.toList, wc)
        }
      }
    }
    out.toSeq
  }

  private val fixture = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
    "widest" -> 3L, "lowest" -> 1L)

  test("merge table matches the classic reference on the paper-style fixture") {
    val wf = fixture.toSeq.toDF("w", "wc")
    val got = Bpe.train(wf, merges = 6)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq === referenceBpe(fixture, 6))
  }

  test("greedy leftmost: aaa merges to [aa, a], so (a,a) counts pairs non-overlapping") {
    val wf = Seq(("aaa", 1L)).toDF("w", "wc")
    val got = Bpe.train(wf, merges = 2)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // step 1: pair (a,a) has TWO raw occurrences but the reference
    // counts both; after merging, "aa|a|" leaves (aa, a)
    assert(got(0) === ((1, "aa", 2L)))
    assert(got(1) === ((2, "aaa", 1L)))
  }

  test("wordFreq + train end-to-end; tokenStats compresses without changing chars") {
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran the")).toDF("id", "text")
    val wf = Bpe.wordFreq(docs, col("text"))
    assert(wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L, "ran" -> 1L))
    val mt = Bpe.train(wf, merges = 3)
    val stats = Bpe.tokenStats(wf, mt).collect().head
    val chars = 3 * "the".length + 2 * "cat".length + "sat".length + "ran".length
    assert(stats.getLong(1) === chars.toLong)   // chars invariant
    assert(stats.getLong(0) < chars.toLong)     // tokens compressed
  }

  test("encodeWords agrees with the reference segmentation per word") {
    val wf = fixture.toSeq.toDF("w", "wc")
    val mt = Bpe.train(wf, merges = 6)
    val got = Bpe.encodeWords(wf.select(col("w")), mt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the reference merges over each word
    var words = fixture.keys.map(w => w -> w.map(_.toString).toList).toMap
    referenceBpe(fixture, 6).foreach { case (a, b, _) =>
      words = words.map { case (w, sym) =>
        val merged = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += sym(i); i += 1 }
        }
        w -> merged.toList
      }
    }
    assert(got === words.map { case (w, sym) => w -> sym.length.toLong })
  }

  test("encodeWords with zero merges is character count") {
    val wf = Seq(("abc", 1L), ("de", 1L)).toDF("w", "wc")
    val empty = Bpe.train(wf, merges = 1).limit(0)
    val got = Bpe.encodeWords(wf.select(col("w")), empty)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("abc" -> 3L, "de" -> 2L))
  }
}
