package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Sampling.neymanAlloc]] — variance-optimal stratified budget.
  * Pins: allocations sum EXACTLY to the budget; a higher-variance
  * stratum of equal size gets the larger share; zero-variance and
  * single-row strata get weight 0 (budget only via remainders); the
  * degenerate all-zero-weight corpus allocates nothing; and the
  * weights match a by-hand N_h·s_h computation.
  */
class NeymanAllocSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def df = Seq(
    // stratum a: n=4, sd 0 (constant) -> weight 0
    ("a", 10L), ("a", 10L), ("a", 10L), ("a", 10L),
    // stratum b: n=4, modest spread
    ("b", 8L), ("b", 10L), ("b", 12L), ("b", 10L),
    // stratum c: n=4, wide spread -> dominates
    ("c", 0L), ("c", 100L), ("c", 0L), ("c", 100L),
    // stratum d: single row -> no variance evidence, weight 0
    ("d", 50L)).toDF("g", "x")

  test("allocations sum to the budget; variance dominates; degenerate strata zero") {
    val got = Sampling.neymanAlloc(df, $"g", $"x", budget = 100L)
      .orderBy($"stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._4).sum === 100L)
    val byG = got.map(t => t._1 -> t).toMap
    assert(byG("a")._3 === 0L && byG("d")._3 === 0L)
    assert(byG("c")._4 > byG("b")._4)
    // hand computation: s_b = sd(8,10,12,10) = sqrt(8/3), w_b = 4*s_b
    val wb = math.floor(4.0 * math.sqrt(8.0 / 3.0) * 1e6).toLong
    assert(byG("b")._3 === wb)
    val wc = math.floor(4.0 * math.sqrt(40000.0 / 12.0) * 1e6).toLong
    assert(byG("c")._3 === wc)
    // largest-remainder: per-stratum allocs are floor(share) or +1
    got.foreach { case (_, _, wq, alloc) =>
      val raw = 100.0 * wq / (wb + wc)
      assert(alloc === math.floor(raw).toLong || alloc === math.floor(raw).toLong + 1)
    }
  }

  test("all-degenerate corpus allocates nothing rather than dividing by zero") {
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 7L)).toDF("g", "x")
    val got = Sampling.neymanAlloc(flat, $"g", $"x", budget = 10L)
      .select($"alloc").as[Long].collect()
    assert(got.forall(_ === 0L))
  }
}
