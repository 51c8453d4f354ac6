package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dsir]] — hashed-n-gram importance weights against closed-form
  * bucket models.
  */
class DsirSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("features: unigram+bigram bucket counts, grams hashing together accumulate") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    // grams: a, b, a, "a b", "b a" — 5 total
    val feats = Dsir.features(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(feats.map(_._2).sum === 5L)
    // bucket of "a" holds its two occurrences in one row
    val aBucket = java.security.MessageDigest.getInstance("MD5")
      .digest("dsir|a".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    assert(feats.filter(_._1 == aBucket).map(_._2).sum >= 2L)
  }

  test("logWeights: doc made of target-only grams outscores doc of raw-only grams") {
    // target corpus repeats "alpha beta", raw corpus repeats "gamma
    // delta"; two raw-side probes: one target-like, one raw-like.
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (10L, "gamma delta gamma delta gamma delta", false),
      (11L, "gamma delta gamma delta", false),
      (20L, "alpha beta", false), // target-like probe
      (21L, "gamma delta", false) // raw-like probe
    ).toDF("doc_id", "text", "is_t")
    val got = Dsir.logWeights(docs, col("doc_id"), col("text"), col("is_t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // only non-target docs are scored
    assert(got.keySet === Set(10L, 11L, 20L, 21L))
    assert(got(20L)._2 > got(21L)._2,
      s"target-like probe must outscore raw-like: $got")
    // the target-like probe's grams are rare in raw, common in target
    assert(got(20L)._2 > 0.0)
    assert(got(21L)._2 < 0.0)
    // n_grams: "alpha beta" → 2 unigrams + 1 bigram
    assert(got(20L)._1 === 3L)
  }

  test("logWeights matches the closed-form bucket model on a tiny corpus") {
    val docs = Seq(
      (1L, "x y", true),
      (2L, "z w", false),
      (3L, "x y", false)
    ).toDF("doc_id", "text", "is_t")
    def bucket(g: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(("dsir|" + g).getBytes("UTF-8"))
      .take(1).map("%02x".format(_)).mkString
    // target grams: x, y, "x y" (Ct=3); raw grams: z, w, "z w", x, y,
    // "x y" (Cr=6)
    val ct = Seq("x", "y", "x y").groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val cr = Seq("z", "w", "z w", "x", "y", "x y").groupBy(bucket).view.mapValues(_.size.toLong).toMap
    def llr(b: String): Double =
      math.log((ct.getOrElse(b, 0L) + 1).toDouble / (3 + 256).toDouble) -
        math.log((cr.getOrElse(b, 0L) + 1).toDouble / (6 + 256).toDouble)
    val exp3 = Seq("x", "y", "x y").groupBy(bucket).map { case (b, gs) => gs.size * llr(b) }.sum
    val got = Dsir.logWeights(docs, col("doc_id"), col("text"), col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(3L) - exp3) < 1e-12, s"doc 3: got ${got(3L)}, want $exp3")
  }

  test("docs with no tokens produce no weight row") {
    val docs = Seq((1L, "a b", true), (2L, "   ", false), (3L, "c", false))
      .toDF("doc_id", "text", "is_t")
    val got = Dsir.logWeights(docs, col("doc_id"), col("text"), col("is_t"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L))
  }
}
