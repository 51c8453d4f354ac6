package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[NbClassifier]] — hand-computed multinomial NB on a two-class
  * fixture: smoothed likelihoods, prior-only empty docs, unseen-token
  * handling, and partition-order determinism.
  */
class NbClassifierSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // en: 2 docs, tokens {the:3, cat:2, sat:1}; es: 1 doc {el:2, gato:1}.
  // Vocab V = 5, en total = 6, es total = 3.
  private val train = Seq(
    (1L, "en", "the cat sat"),
    (2L, "en", "the the cat"),
    (3L, "es", "el el gato")).toDF("id", "label", "text")

  private def fitModel() =
    NbClassifier.fit(train, col("label"), TextOps.words(col("text")))

  private def predict(test: Seq[(Long, String)]) =
    NbClassifier.predict(fitModel(), test.toDF("id", "text"), col("id"),
        TextOps.words(col("text")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  private def q(x: Double): Long = math.floor(math.log(x) * 1e6).toLong

  test("hand-computed scores and argmax") {
    val m = predict(Seq((10L, "the cat"), (11L, "el gato")))
    // doc 10 under en: ln(2/3) + q((3+1)/(6+5)) + q((2+1)/(6+5))
    val en10 = q(2.0 / 3) + q(4.0 / 11) + q(3.0 / 11)
    val es10 = q(1.0 / 3) + q(1.0 / 8) + q(1.0 / 8) // both unseen in es
    assert(en10 > es10)
    assert(m(10L) === (("en", en10)))
    val es11 = q(1.0 / 3) + q(3.0 / 8) + q(2.0 / 8)
    assert(m(11L) === (("es", es11)))
  }

  test("empty document scores prior-only and is classified to the majority class") {
    val m = predict(Seq((20L, "")))
    assert(m(20L) === (("en", q(2.0 / 3))))
  }

  test("null text counts toward priors in fit and scores prior-only in predict") {
    // a labeled null-text doc is evidence for its class (the SQL
    // oracle's priors count ALL docs) — the null words array must not
    // silently drop it from the one-pass fit's doc counts
    val withNull = (train.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq :+
      ((4L, "es", null.asInstanceOf[String]))).toDF("id", "label", "text")
    val model = NbClassifier.fit(withNull, col("label"), TextOps.words(col("text")))
    val stats = model.classStats.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(stats === Map("en" -> 2L, "es" -> 2L))
    val scored = NbClassifier.predict(model,
        Seq((30L, null.asInstanceOf[String])).toDF("id", "text"),
        col("id"), TextOps.words(col("text")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // priors now tie 2/2 -> argmax tie-break to the smaller label
    assert(scored(30L) === (("en", q(2.0 / 4))))
  }

  test("fully unseen tokens still score under every class (smoothing, no drop)") {
    val m = predict(Seq((30L, "zzz qqq")))
    // en: ln(2/3) + 2·q(1/11); es: ln(1/3) + 2·q(1/8) — likelihoods
    // favor the smaller es vocabulary, priors favor en; either way the
    // doc MUST be present with the exact integer score.
    val en = q(2.0 / 3) + 2 * q(1.0 / 11)
    val es = q(1.0 / 3) + 2 * q(1.0 / 8)
    val expected = if (en >= es) ("en", en) else ("es", es)
    assert(m(30L) === expected)
  }

  test("carry columns ride through without changing predictions") {
    val test = Seq((10L, "en", "the cat"), (11L, "es", "el gato"))
      .toDF("id", "tag", "text")
    val got = NbClassifier.predict(fitModel(), test, col("id"),
        TextOps.words(col("text")), carry = Seq("tag" -> col("tag")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(got(10L)._1 === "en" && got(10L)._2 === "en")
    assert(got(11L)._1 === "es" && got(11L)._2 === "es")
    // scores identical to the no-carry path
    val plain = predict(Seq((10L, "the cat"), (11L, "el gato")))
    assert(got(10L)._3 === plain(10L)._2 && got(11L)._3 === plain(11L)._2)
  }

  test("deterministic across input partitioning") {
    val test = Seq((10L, "the cat"), (11L, "el gato"), (30L, "zzz qqq"))
    val a = predict(test)
    val model = NbClassifier.fit(train.repartition(7), col("label"),
      TextOps.words(col("text")))
    val b = NbClassifier.predict(model, test.toDF("id", "text").repartition(5),
        col("id"), TextOps.words(col("text")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(a === b)
  }
}
