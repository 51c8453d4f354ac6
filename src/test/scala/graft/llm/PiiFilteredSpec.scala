package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextOps.scrubPii]] redaction semantics and
  * [[Similarity.filteredTopK]] predicate behavior.
  */
class PiiFilteredSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextOps.scrubPii(col("t"))).head().getString(0)

  test("scrubPii redacts emails, IPv4s, and phones to typed placeholders") {
    assert(scrub("mail a.b+c@ex-1.org, ip 192.168.0.1, call +1-555-0199 now")
      === "mail <EMAIL>, ip <IP>, call <PHONE> now")
  }

  test("scrubPii: email-first ordering protects numeric domains from the IP pass") {
    // the domain contains an IP-shaped substring; it must vanish as
    // part of the email, not be clipped to user@<IP>.com
    assert(scrub("x user@10.0.0.7.com y") === "x <EMAIL> y")
    // a bare IP right next to an email still gets its own placeholder
    assert(scrub("a@b.co 10.0.0.7") === "<EMAIL> <IP>")
  }

  test("scrubPii leaves near-misses alone") {
    val s = "v1.2.3 semver, 1.2.3.4.5 not an ip boundary test 300-555-0199"
    // 1.2.3.4.5: the first 4 octets still form a \b-delimited match in
    // both engines (the 5th dot is not a word char) — document the
    // shared behavior rather than pretend otherwise
    assert(scrub(s) === "v1.2.3 semver, <IP>.5 not an ip boundary test 300-555-0199")
    assert(scrub("no pii here at all") === "no pii here at all")
  }

  test("filteredTopK: predicate prunes candidates; query may fail the predicate") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), "q"),   // query row, tag excluded from candidates
      (1L, Array(1.0f, 0.1f), "a"),
      (2L, Array(1.0f, 0.0f), "b"),   // best sim but wrong tag
      (3L, Array(0.9f, 0.1f), "a"),
      (4L, Array(-1.0f, 0.0f), "a")
    ).toDF("id", "vec", "tag")
    val got = Similarity.filteredTopK(df, col("id"), col("vec"),
        col("id") === 0L, col("tag") === "a", 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq(1L, 3L))
    assert(got.forall(_._2 > 0.9))
  }

  test("filteredTopK returns fewer than k when the filter leaves fewer candidates") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), "q"), (1L, Array(0.5f, 0.5f), "a"),
      (2L, Array(1.0f, 0.2f), "z")
    ).toDF("id", "vec", "tag")
    val got = Similarity.filteredTopK(df, col("id"), col("vec"),
      col("id") === 0L, col("tag") === "a", 10)
    assert(got.count() === 1L)
  }
}
/** Multi-probe IVF recall semantics on the real embeddings fixture. */
class MultiProbeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  private lazy val emb = graft.core.Tables.embeddings(spark, sfDir)

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("nprobe=1 degenerates to single-probe ivfTopK") {
    val single = Similarity.ivfTopK(emb, col("vec_id"), col("label"),
      col("embedding"), col("vec_id") === 0L, 5)
    val multi = Similarity.ivfTopKMultiProbe(emb, col("vec_id"), col("label"),
      col("embedding"), col("vec_id") === 0L, 5, 1)
    assert(ids(single) === ids(multi))
  }

  test("nprobe=all cells equals exact brute force (recall 1)") {
    val brute = Similarity.bruteForceTopK(emb, col("vec_id"),
      col("embedding"), col("vec_id") === 0L, 5)
    val multi = Similarity.ivfTopKMultiProbe(emb, col("vec_id"), col("label"),
      col("embedding"), col("vec_id") === 0L, 5, 10)
    assert(ids(multi) === ids(brute))
  }

  test("probe set grows monotonically with nprobe") {
    def cand(n: Int) = Similarity.ivfTopKMultiProbe(emb, col("vec_id"),
      col("label"), col("embedding"), col("vec_id") === 0L, 500, n)
    assert(cand(1).count() < cand(3).count())
    assert(cand(3).count() < cand(10).count())
  }
}
