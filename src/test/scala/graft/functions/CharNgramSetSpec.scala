package graft.functions

import graft.SparkSpec
import graft.llm.TextOps
import org.apache.spark.sql.functions._

class CharNgramSetSpec extends SparkSpec {
  import CharNgramSet.charNgramSet

  test("matches the builtin transform+array_distinct composition on real docs") {
    import graft.SparkSpec.spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val mismatches = docs
      .select(col("doc_id"),
        array_sort(charNgramSet(col("text"), 5)).as("native"),
        array_sort(array_distinct(TextOps.charNgrams(col("text"), 5))).as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(mismatches == 0)
  }

  test("dedups repeats, keeps first occurrence, [] below n, null in null out") {
    import graft.SparkSpec.spark.implicits._
    val rows = Seq("ababab", "abc", null).toDF("t")
      .select(charNgramSet(col("t"), 3).as("g"))
      .collect()
    assert(rows(0).getSeq[String](0) == Seq("aba", "bab"))
    assert(rows(1).getSeq[String](0) == Seq("abc"))
    assert(rows(2).isNullAt(0))
  }

  test("multi-byte UTF-8 slices on char boundaries") {
    import graft.SparkSpec.spark.implicits._
    // 2- and 3-byte chars: grams must be per-character, not per-byte
    val got = Seq("héllo wörld", "日本語です").toDF("t")
      .select(charNgramSet(col("t"), 3).as("g"), TextOps.charNgrams(col("t"), 3).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1).distinct)
    }
  }

  test("registered SQL function agrees with the Column API") {
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT char_ngram_set('abcabc', 4) AS g")
      .collect()(0).getSeq[String](0)
    assert(viaSql == Seq("abca", "bcab", "cabc"))
  }
}
