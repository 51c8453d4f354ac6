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
}
