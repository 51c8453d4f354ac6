package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test: [[NbClassifier]] vs an in-memory
  * reference over random labeled corpora — counts, smoothing, priors,
  * micro-nat quantization, and the (q desc, label asc) argmax must
  * all agree. The JVM computes both sides' ln, so the comparison is
  * exact, not approximate. Fixed seeds → reproducible failures.
  */
class NbClassifierPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val word = Gen.oneOf((1 to 15).map(i => s"w$i"))
  private val labeledDoc = for {
    id <- Gen.choose(0L, 500L)
    label <- Gen.oneOf("en", "es", "de")
    ws <- Gen.listOf(word) // may be empty → prior-only path
  } yield (id, label, ws)

  private def q(x: Double): Long = math.floor(math.log(x) * 1e6).toLong

  test("distributed NB equals the sequential reference") {
    for (seed <- 1L to 4L) {
      val all = Gen.listOfN(80, labeledDoc)
        .apply(Gen.Parameters.default, Seed(seed)).get
        .groupBy(_._1).map(_._2.head).toSeq
      val (trainDocs, testDocs) = all.partition(_._1 % 3 != 0)
      if (trainDocs.nonEmpty && testDocs.nonEmpty &&
          trainDocs.exists(_._3.nonEmpty)) {
        // ---- sequential reference
        val counts = trainDocs.flatMap(d => d._3.map(w => (d._2, w)))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val tots = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
        val vocab = counts.keys.map(_._2).toSet.size.toLong
        val labels = trainDocs.map(_._2).distinct.sorted
        val nTotal = trainDocs.size.toLong
        val priors = labels.map(l =>
          l -> q(trainDocs.count(_._2 == l).toDouble / nTotal)).toMap
        val want = testDocs.map { case (id, _, ws) =>
          val scores = labels.map { l =>
            val tot = tots.getOrElse(l, 0L)
            val s = priors(l) + ws.map(w =>
              q((counts.getOrElse((l, w), 0L) + 1).toDouble / (tot + vocab))).sum
            (l, s)
          }
          val (pred, score) = scores.minBy { case (l, s) => (-s, l) }
          id -> ((pred, score))
        }.toMap

        // ---- distributed
        val train = trainDocs.map(d => (d._1, d._2, d._3.mkString(" ")))
          .toDF("id", "label", "text")
        val test = testDocs.map(d => (d._1, d._3.mkString(" ")))
          .toDF("id", "text")
        val model = NbClassifier.fit(train.repartition(5), col("label"),
          TextOps.words(col("text")))
        val got = NbClassifier.predict(model, test.repartition(3), col("id"),
            TextOps.words(col("text")))
          .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
          .toMap
        assert(got === want, s"seed=$seed diverged from the sequential NB")
      }
    }
  }
}
