package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def flags(text: String): Map[String, Boolean] = {
    val ws = TextOps.words(col("text"))
    val ls = QualityRules.lines(col("text"))
    val row = Seq(text).toDF("text")
      .select(col("text"), ws.as("ws"), ls.as("ls"),
        size(ws).cast("long").as("n"))
      .select(
        QualityRules.okWordCount(col("n")).as("words"),
        QualityRules.okMeanWordLen(col("n"), QualityRules.sumWordLen(col("ws"))).as("wordlen"),
        QualityRules.okSymbolRatio(col("text"), col("n")).as("symbol"),
        QualityRules.okBulletLines(col("ls")).as("bullet"),
        QualityRules.okEllipsisLines(col("ls")).as("ellipsis"),
        QualityRules.okAlphaWords(col("ws"), col("n")).as("alpha"),
        QualityRules.okStopwords(col("ws")).as("stop"))
      .head()
    row.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> row.getBoolean(i) }.toMap
  }

  private val goodDoc =
    (("the quick brown fox jumps over and rests with " * 7) + "calm of that ridge").trim

  test("a well-formed document passes every rule") {
    val f = flags(goodDoc)
    assert(f.values.forall(identity), s"expected all-pass, got $f")
  }

  test("word-count bounds") {
    assert(!flags("too few words here")("words"))
    assert(flags(goodDoc)("words"))
  }

  test("mean word length: single-char spam fails, normal prose passes") {
    assert(!flags(Seq.fill(60)("a").mkString(" "))("wordlen"))
    assert(flags(goodDoc)("wordlen"))
  }

  test("symbol ratio boundary is the exact integer cut 10·sym < n") {
    // 10 words, 1 symbol: 10·1 < 10 false → fails; 11 words passes.
    val ten = (Seq.fill(9)("word") :+ "#").mkString(" ")
    val eleven = (Seq.fill(10)("word") :+ "#").mkString(" ")
    assert(!flags(ten)("symbol"))
    assert(flags(eleven)("symbol"))
  }

  test("bullet and ellipsis line ratios") {
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(!flags(bullets)("bullet"))
    val ell = (1 to 10).map(i => s"line $i...").mkString("\n")
    assert(!flags(ell)("ellipsis"))
    assert(flags(goodDoc)("bullet") && flags(goodDoc)("ellipsis"))
  }

  test("alpha-word ratio: numeric tables fail") {
    val numeric = (Seq.fill(30)("123 456") :+ "total sum").mkString(" ")
    assert(!flags(numeric)("alpha"))
  }

  test("stopword rule needs two distinct hits") {
    assert(!flags(Seq.fill(60)("the").mkString(" "))("stop"), "one distinct stopword")
    assert(flags(("the and " * 30).trim)("stop"))
  }
}
