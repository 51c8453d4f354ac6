package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for [[Sampling.neymanAlloc]]: over random corpora
  * and budgets, allocations are non-negative integers summing EXACTLY
  * to the budget whenever any stratum carries variance (and to zero
  * when none does), every allocation is floor(share) or floor+1
  * (largest-remainder), and weights match a by-hand N_h·s_h
  * recomputation. Fixed seeds → reproducible failures.
  */
class NeymanAllocPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val rowGen = for {
    g <- Gen.oneOf("s1", "s2", "s3", "s4")
    x <- Gen.choose(0L, 500L)
  } yield (g, x)

  test("exact-sum, bounds, and by-hand weight agreement on random corpora") {
    for (seed <- 1L to 5L) {
      val rows = Gen.listOfN(50, rowGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
      val budget = 37L + seed * 11L
      val got = Sampling.neymanAlloc(rows.toDF("g", "x").repartition(5),
          $"g", $"x", budget)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      // by-hand weights
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val xs = rs.map(_._2)
        val n = xs.size
        val wq = if (n < 2) 0L else {
          val sx = xs.sum
          val sxx = xs.map(v => BigInt(v) * BigInt(v)).sum
          val num = (BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble
          math.floor(n.toDouble *
            math.sqrt(num / (n.toDouble * (n - 1).toDouble)) * 1e6).toLong
        }
        g -> (n.toLong, wq)
      }
      want.foreach { case (g, (n, wq)) =>
        assert(got(g)._1 === n, s"seed $seed $g n")
        assert(got(g)._2 === wq, s"seed $seed $g weight")
      }
      val sumW = want.values.map(_._2).sum
      val total = got.values.map(_._3).sum
      if (sumW > 0L) {
        assert(total === budget, s"seed $seed total $total != $budget")
        got.foreach { case (g, (_, wq, alloc)) =>
          val raw = budget.toDouble * wq.toDouble / sumW.toDouble
          assert(alloc === math.floor(raw).toLong ||
            alloc === math.floor(raw).toLong + 1, s"seed $seed $g alloc $alloc")
        }
      } else assert(total === 0L, s"seed $seed degenerate corpus must allocate 0")
    }
  }
}
