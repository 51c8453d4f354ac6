package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test: [[TimeSeries.asofJoin]] vs an
  * in-memory Scala reference over random keyed event streams — the
  * window-union formulation must agree with the definition ("greatest
  * right time ≤ left time, per key") on every generated case,
  * including heavy timestamp collisions and keys with no right rows.
  * Fixed seeds → reproducible failures.
  */
class AsofJoinPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val leftGen = for {
    k <- Gen.choose(0L, 4L)
    t <- Gen.choose(0L, 40L) // small domain -> many exact ties
  } yield (k, t)

  private val rightGen = for {
    k <- Gen.choose(0L, 5L) // key 5 never appears on the left
    t <- Gen.choose(0L, 40L)
    v <- Gen.choose(1.0, 100.0)
  } yield (k, t, v)

  test("asofJoin equals the in-memory reference on random streams") {
    for (seed <- 1L to 5L) {
      val ls = Gen.listOfN(120, leftGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rs = Gen.listOfN(60, rightGen)
        .apply(Gen.Parameters.default, Seed(seed * 31)).get
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, t)

      val left = ls.toDF("event_id", "k", "t")
      val right = rs.toDF("k", "t", "v")
      val got = TimeSeries.asofJoin(left, right, Seq("k"), "t", Seq("v"))
        .collect()
        .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap

      val byKey = rs.groupBy(_._1)
      val want = ls.map { case (id, k, t) =>
        val m = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        id -> (if (m.isEmpty) (None, None)
               else { val b = m.maxBy(_._2); (Some(b._3), Some(b._2)) })
      }.toMap

      assert(got === want, s"seed $seed")
    }
  }
}
