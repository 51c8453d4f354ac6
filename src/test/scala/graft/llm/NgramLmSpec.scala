package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[NgramLm]] against hand-computed add-one bigram probabilities. */
class NgramLmSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // corpus: "ababa" -> ab,ba,ab,ba ; "abb" -> ab,bb
  // counts: ab=3 ba=2 bb=1 ; prefixes a=3 b=3 ; V=2
  // P(ab)=(3+1)/(3+2)=0.8  P(ba)=0.6  P(bb)=0.4
  private val qAb = math.floor(math.log(0.8) * 1e6).toLong // -223144
  private val qBa = math.floor(math.log(0.6) * 1e6).toLong // -510826
  private val qBb = math.floor(math.log(0.4) * 1e6).toLong // -916291

  private def scoreAll(parts: Int) = {
    val docs = Seq((1L, "ababa"), (2L, "abb"), (3L, "x")).toDF("doc_id", "text")
      .repartition(parts)
    val bg = NgramLm.bigrams(docs, col("doc_id"), col("text"))
    val m = NgramLm.model(bg)
    NgramLm.score(bg, m, NgramLm.prefixCounts(m))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("hand-computed smoothed scores; sub-bigram docs drop out") {
    val got = scoreAll(2)
    assert(got === Map(
      1L -> (4L, 2 * qAb + 2 * qBa),
      2L -> (2L, qAb + qBb)))
    // "x" has no bigram: it neither scores nor pollutes the model
    // ("x" as a prefix would have changed V to 3)
    assert(!got.contains(3L))
  }

  test("integer quantization makes the score partition-layout-invariant") {
    assert(scoreAll(1) === scoreAll(7))
  }

  test("bigrams carry multiplicity and preserve overlaps") {
    val bg = NgramLm.bigrams(Seq((1L, "aaa")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect().map(_.getString(1))
    assert(bg.toSeq === Seq("aa", "aa"))
  }

  // ---- Kneser-Ney word bigrams ----
  // corpus: doc1 "a b a b" -> (a,b)×2,(b,a); doc2 "a c" -> (a,c)
  // c(a,b)=2 c(b,a)=1 c(a,c)=1 ; cw1: a=3 b=1 ; n1f: a=2 b=1
  // n1b: a=1 b=1 c=1 ; T=3 ; D=0.75
  private def knP(c: Long, cw1: Long, n1f: Long, n1b: Long, t: Long): Double =
    math.max(c - 0.75, 0.0) / cw1.toDouble +
      (0.75 * n1f.toDouble / cw1.toDouble) * (n1b.toDouble / t.toDouble)
  private def knQ(p: Double): Long = math.floor(math.log(p) * 1e6).toLong

  private def knAll(parts: Int) = {
    val docs = Seq((1L, Seq("a", "b", "a", "b")), (2L, Seq("a", "c")),
        (3L, Seq("x")))
      .toDF("doc_id", "ws").repartition(parts)
    val bg = NgramLm.wordBigrams(docs, col("doc_id"), col("ws"))
    NgramLm.knScore(bg, NgramLm.knModel(bg))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("KN: hand-computed discount + continuation terms; 1-word docs drop") {
    val got = knAll(2)
    val qAB = knQ(knP(2, 3, 2, 1, 3)) // P(b|a)=1.25/3+0.5/3
    val qBA = knQ(knP(1, 1, 1, 1, 3)) // P(a|b)=0.25+0.25
    val qAC = knQ(knP(1, 3, 2, 1, 3)) // P(c|a)=0.25/3+0.5/3
    assert(got === Map(1L -> (3L, 2 * qAB + qBA), 2L -> (1L, qAC)))
    assert(!got.contains(3L))
  }

  test("KN: seen mass beats pure continuation mass for a repeated bigram") {
    // P(b|a) carries discount-adjusted count mass; P(c|a) only 0.25/3
    // of it — the discount transfer is what KN is for
    assert(knP(2, 3, 2, 1, 3) > knP(1, 3, 2, 1, 3))
  }

  test("KN: quantized scores are partition-layout-invariant") {
    assert(knAll(1) === knAll(5))
  }
}
