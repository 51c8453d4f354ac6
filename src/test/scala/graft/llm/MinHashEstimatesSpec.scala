package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.minHashEstimates]] — sketch calibration: the estimate is
  * the matching-component fraction, the exact Jaccard matches set
  * algebra, and the candidate set is precisely [[Dedup.minHashNearDups]]'
  * at threshold 0.
  */
class MinHashEstimatesSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val docs = Seq(
    (1L, Seq("a", "b", "c", "d")),
    (2L, Seq("a", "b", "c", "d")),   // identical to 1
    (3L, Seq("a", "b", "x", "y")),   // J(1,3) = 2/6
    (4L, Seq("p", "q", "r", "s"))    // disjoint from all
  ).toDF("id", "sh")

  private def estimates(df: org.apache.spark.sql.DataFrame) =
    Dedup.minHashEstimates(df, col("id"), col("sh"), 8, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  private val sets = Map(1L -> Set("a", "b", "c", "d"), 2L -> Set("a", "b", "c", "d"),
    3L -> Set("a", "b", "x", "y"), 4L -> Set("p", "q", "r", "s"))

  test("identical documents: every component matches, est = jaccard = 1") {
    val m = estimates(docs)
    assert(m((1L, 2L)) === ((8L, 1.0, 1.0)))
  }

  test("est is the matching fraction; exact jaccard matches set algebra") {
    estimates(docs).foreach { case ((a, b), (nm, est, j)) =>
      assert(est === nm / 8.0)
      assert(nm >= 1L && nm <= 8L) // a candidate shares ≥1 band = ≥2 components
      val expect = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      assert(math.abs(j - expect) < 1e-12, s"pair ($a,$b)")
    }
  }

  test("candidate set and exact jaccard agree with minHashNearDups at threshold 0") {
    val viaPipeline = Dedup.minHashNearDups(docs, col("id"), col("sh"), 8, 2, 0.0d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaEst = estimates(docs).map { case (k, v) => k -> v._3 }
    assert(viaEst.keySet === viaPipeline.keySet)
    viaEst.foreach { case (k, j) => assert(math.abs(j - viaPipeline(k)) < 1e-12) }
  }

  test("deterministic across input partitioning") {
    assert(estimates(docs) === estimates(docs.repartition(7)))
  }
}
