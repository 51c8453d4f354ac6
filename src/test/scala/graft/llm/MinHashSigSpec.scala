package graft.llm

import graft.SparkSpec
import graft.functions.MinHashSig
import org.apache.spark.sql.functions._

/** SCHEME-CONTRACT pin for [[MinHashSig]]: the native single-pass
  * signature must be component-for-component identical to the
  * explode + md5 + 8×min aggregate formulation of md5x2-slice32
  * ([[Dedup.minHashDigests]]/`minHashAggs`) — persisted
  * IncrementalDedup state and every DuckDB minhash oracle replay that
  * exact scheme, so a divergence here must fail loudly.
  */
class MinHashSigSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def aggForm(docs: org.apache.spark.sql.DataFrame, k: Int) = {
    val hashed = docs.select(col("id"),
        explode_outer(col("sh")).as("s"))
      .select(col("id") +: Dedup.minHashDigests(col("s")): _*)
    hashed.groupBy(col("id")).agg(Dedup.minHashAggs(k).head,
      Dedup.minHashAggs(k).tail: _*)
  }

  test("minhash_sig ≡ explode+md5+min aggregate, all 8 components") {
    val docs = Seq(
      (1L, Seq("the quick brown", "quick brown fox", "brown fox jumps")),
      (2L, Seq("a b c")), // single shingle
      (3L, Seq.empty[String]), // too short to shingle -> null sig
      (4L, Seq("naïve café über", "café über señor")), // multi-byte UTF-8
      (5L, Seq("dup dup dup", "dup dup dup", "other gram here")), // duplicates
      (6L, (1 to 200).map(i => s"w$i w${i + 1} w${i + 2}")) // larger set
    ).toDF("id", "sh")
    val k = 8
    val native = docs.select(col("id"),
        MinHashSig.minHashSig(col("sh"), k).as("sig"))
      .select(col("id") +: (0 until k).map(j => col("sig").getItem(j).as(s"m$j")): _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getString)).toMap
    val agg = aggForm(docs, k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getString)).toMap
    assert(native.keySet === agg.keySet)
    for (id <- agg.keySet; j <- 0 until k)
      assert(native(id)(j) === agg(id)(j),
        s"doc $id component m$j: native ${native(id)(j)} vs agg ${agg(id)(j)}")
    // shingle-less doc: every component null in BOTH forms
    assert(native(3L).forall(_ == null) && agg(3L).forall(_ == null))
  }

  test("null array, null elements, and k<8 prefixes") {
    val docs = Seq(
      (1L, Some(Seq(Some("x y z"), None, Some("y z w")))),
      (2L, None: Option[Seq[Option[String]]])
    ).toDF("id", "sh")
    val out = docs.select(col("id"),
        MinHashSig.minHashSig(col("sh"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    // null elements are skipped like md5(null) under min()
    val expect = docs.filter(col("id") === 1L)
      .select(col("id"), explode_outer(col("sh")).as("s"))
      .select(col("id") +: Dedup.minHashDigests(col("s")): _*)
      .groupBy(col("id")).agg(Dedup.minHashAggs(4).head,
        Dedup.minHashAggs(4).tail: _*)
      .collect().map(r => (1 to 4).map(r.getString)).head
    assert(out(1L).get === expect)
    assert(out(2L).isEmpty) // null array -> null signature
  }
}
