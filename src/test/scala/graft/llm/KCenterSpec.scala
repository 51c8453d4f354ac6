package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Similarity.kCenterSample]] — greedy farthest-point traversal.
  * Pins: seed = smallest id, greedy argmax-of-min-distance agreement
  * with a local brute-force run, the null-radius seed row, ties to
  * the lowest id, and k > N termination.
  */
class KCenterSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def bruteKCenter(pts: Map[Long, Seq[Double]], k: Int): Seq[(Long, Option[Double])] = {
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var sel = Vector[(Long, Option[Double])]((pts.keys.min, None))
    while (sel.size < k && sel.size < pts.size) {
      val cand = pts.filterNot(p => sel.exists(_._1 == p._1))
        .map { case (i, v) => (i, sel.map(s => l2(v, pts(s._1))).min) }
      val (i, d) = cand.minBy { case (i, d) => (-d, i) }
      sel :+= ((i, Some(d)))
    }
    sel
  }

  private val pts = Seq(
    (3L, Seq(0.0, 0.0)), (7L, Seq(10.0, 0.0)), (9L, Seq(0.0, 10.0)),
    (11L, Seq(5.0, 5.0)), (20L, Seq(10.0, 10.0)), (21L, Seq(1.0, 0.0)))

  test("matches local brute-force greedy on a small set") {
    val got = Similarity.kCenterSample(pts.toDF("id", "v"), $"id", $"v", 4)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == bruteKCenter(pts.toMap, 4))
  }

  test("seed is the smallest id with null radius") {
    val r = Similarity.kCenterSample(pts.toDF("id", "v"), $"id", $"v", 1).collect()
    assert(r.length == 1 && r.head.getLong(1) == 3L && r.head.isNullAt(2))
  }

  test("distance ties break to the lowest id") {
    // 2 and 5 are mirror images of each other around the seed 1
    val sym = Seq((1L, Seq(0.0)), (5L, Seq(1.0)), (2L, Seq(-1.0)))
    val got = Similarity.kCenterSample(sym.toDF("id", "v"), $"id", $"v", 3)
      .orderBy($"rank").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 2L, 5L))
  }

  test("k > N stops at N selections") {
    val got = Similarity.kCenterSample(pts.take(2).toDF("id", "v"), $"id", $"v", 10)
    assert(got.count() == 2)
  }
}
