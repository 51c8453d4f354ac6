package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[AcCount]] — Aho-Corasick dictionary matching. Pins the CACM'75
  * classic example, overlap counting (where replace-based counting
  * undercounts), multi-byte UTF-8 boundary safety, null/empty
  * behavior, SQL-registration ≡ Column API, and agreement with a
  * brute-force per-pattern scan on a generated dictionary.
  */
class AcCountSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def count(text: String, dict: Seq[String]): Long =
    Seq(text).toDF("t")
      .select(AcCount.acCount(col("t"), dict).as("c"))
      .collect().head.getLong(0)

  test("classic AC example: he/she/his/hers over 'ushers'") {
    assert(count("ushers", Seq("he", "she", "his", "hers")) == 3L)
  }

  test("overlapping matches count per end position") {
    // "batch batch batch" contains "batch batch" at offsets 0 and 6 —
    // replace-based counting collapses them to one
    assert(count("batch batch batch", Seq("batch batch")) == 2L)
    assert(count("aaaa", Seq("aa")) == 3L)
  }

  test("a pattern that is a suffix of another is found inside it") {
    assert(count("table scan", Seq("table scan", "scan")) == 2L)
  }

  test("multi-byte UTF-8 patterns match at character boundaries") {
    assert(count("héllo héllo wörld", Seq("héllo", "wörld")) == 3L)
    // the continuation bytes of 'é' can never start a false match
    assert(count("héllo", Seq("llo")) == 1L)
  }

  test("no matches and empty text give 0; null text gives null") {
    assert(count("nothing here", Seq("zzz")) == 0L)
    assert(count("", Seq("zzz")) == 0L)
    val r = Seq((1, Option.empty[String])).toDF("id", "t")
      .select(AcCount.acCount(col("t"), Seq("x")).as("c")).collect().head
    assert(r.isNullAt(0))
  }

  test("duplicate dictionary entries collapse") {
    assert(count("scan scan", Seq("scan", "scan")) == 2L)
  }

  test("SQL registration agrees with the Column API") {
    graft.GraftExtensions.register(spark)
    Seq("the batch batch pipeline scans a table scan").toDF("t")
      .createOrReplaceTempView("ac_probe")
    val sql = spark.sql(
      "SELECT ac_count(t, array('batch batch', 'scan', 'table scan')) AS c FROM ac_probe")
      .collect().head.getLong(0)
    val api = count("the batch batch pipeline scans a table scan",
      Seq("batch batch", "scan", "table scan"))
    assert(sql == api)
  }

  test("agrees with brute-force scan on a generated 500-term dictionary") {
    val dict = (0 until 500).map(i => f"term$i%03d")
    val text = (0 until 200).map(i => f"term${i % 37}%03d").mkString(" ") +
      " term001term002 noise term999x"
    def brute(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
    val expected = dict.map(brute(text, _)).sum
    assert(count(text, dict) == expected)
  }
}
