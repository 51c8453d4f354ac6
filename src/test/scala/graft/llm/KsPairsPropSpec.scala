package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test: [[CorpusStats.ksPairs]] vs the
  * sequential textbook definition (evaluate |F_a − F_b| at every
  * distinct merged value) over random integer samples with heavy
  * ties — the RANGE-frame distributed form must agree on the exact
  * numerator D·n_a·n_b for every generated case, and D must sit in
  * [0, 1]. Fixed seeds → reproducible failures.
  */
class KsPairsPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // tiny value domain → dense ties within and across groups, the
  // regime where a peer-counting bug would actually show
  private val rowGen = for {
    g <- Gen.oneOf("a", "b", "c")
    x <- Gen.choose(0L, 9L)
  } yield (g, x)

  private def brute(rows: Seq[(String, Long)], ga: String, gb: String): Long = {
    val as = rows.filter(_._1 == ga).map(_._2)
    val bs = rows.filter(_._1 == gb).map(_._2)
    val support = (as ++ bs).distinct
    support.map { x =>
      math.abs(as.count(_ <= x).toLong * bs.size - bs.count(_ <= x).toLong * as.size)
    }.max
  }

  test("distributed exact KS numerator equals the sequential ECDF definition") {
    for (seed <- 1L to 5L) {
      val rows = Gen.listOfN(80, rowGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
      // every group must be non-empty for the pair to exist
      val present = rows.map(_._1).toSet
      val got = CorpusStats.ksPairs(rows.toDF("g", "x").repartition(7), $"g", $"x")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      val pairs = present.toSeq.sorted.combinations(2).toSeq
      assert(got.size === pairs.size, s"seed $seed: pair count")
      pairs.foreach { case Seq(ga, gb) =>
        val (na, nb, dnum, d) = got((ga, gb))
        assert(na === rows.count(_._1 == ga).toLong, s"seed $seed $ga size")
        assert(nb === rows.count(_._1 == gb).toLong, s"seed $seed $gb size")
        assert(dnum === brute(rows, ga, gb), s"seed $seed pair ($ga,$gb)")
        assert(d >= 0.0 && d <= 1.0, s"seed $seed D out of range: $d")
      }
    }
  }
}
