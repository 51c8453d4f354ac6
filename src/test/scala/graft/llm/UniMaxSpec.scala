package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.uniMaxAlloc]] — water-filling against hand-computed
  * allocations, the all-capped and none-capped boundary cases, and
  * the invariants the paper's sequential loop guarantees.
  */
class UniMaxSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // groups with token totals a=10, b=20, c=100 (one row per token
  // chunk to exercise the aggregation, not just the window)
  private val rows = Seq.fill(2)(("a", 5L)) ++ Seq.fill(4)(("b", 5L)) ++
    Seq.fill(10)(("c", 10L))
  private val df = rows.toDF("g", "w")

  private def alloc(budget: Long, e: Int): Map[String, (Long, Long, Double)] =
    Sampling.uniMaxAlloc(df, col("g"), col("w"), budget, e)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

  test("hand-computed mixed case: small groups capped, big one takes the rest") {
    // caps at e=2: a=20, b=40, c=200; budget 120.
    // i=1 (a): 0 + 20·3 = 60 ≤ 120 capped; i=2 (b): 20 + 40·2 = 100 ≤ 120
    // capped; i=3 (c): 60 + 200·1 = 260 > 120 → c gets 120−60 = 60.
    val m = alloc(120L, 2)
    assert(m("a") === ((10L, 20L, 20.0)))
    assert(m("b") === ((20L, 40L, 40.0)))
    assert(m("c") === ((100L, 200L, 60.0)))
    // allocations exhaust the budget exactly when someone is uncapped
    assert(m.values.map(_._3).sum === 120.0)
  }

  test("budget above total cap: everyone capped at maxEpochs, budget unspent") {
    val m = alloc(1000L, 2)
    assert(m.values.forall { case (n, cap, a) => cap === n * 2 && a === cap.toDouble })
  }

  test("budget below the smallest cap·L: pure even split") {
    // caps at e=1: 10, 20, 100; budget 24 → f(1) = 10·3 = 30 > 24, K=0,
    // everyone gets 8 — below every cap
    val m = alloc(24L, 1)
    assert(m.values.forall(_._3 === 8.0))
  }

  test("invariants: alloc ≤ cap, monotone in group size, deterministic across partitions") {
    val m = alloc(120L, 2)
    m.values.foreach { case (_, cap, a) => assert(a <= cap.toDouble + 1e-9) }
    assert(m("a")._3 <= m("b")._3 + 1e-9 && m("b")._3 <= m("c")._3 + 1e-9)
    val m2 = Sampling.uniMaxAlloc(df.repartition(7), col("g"), col("w"), 120L, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(m.map { case (k, v) => k -> v._3 } === m2)
  }
}
