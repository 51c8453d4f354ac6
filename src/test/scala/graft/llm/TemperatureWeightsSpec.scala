package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.temperatureWeights]] — τ-sampling shares: hand-computed
  * values, the τ=1 proportional identity, flattening toward uniform as
  * τ falls, and normalization.
  */
class TemperatureWeightsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // sources with 10 / 40 / 50 tokens (multiple rows per group so the
  // aggregation, not just the window, is exercised)
  private val df = (Seq.fill(2)(("a", 5L)) ++ Seq.fill(4)(("b", 10L)) ++
    Seq.fill(5)(("c", 10L))).toDF("g", "w")

  private def weights(tau: Double): Map[String, (Long, Double, Double)] =
    Sampling.temperatureWeights(df, col("g"), col("w"), tau)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

  test("tau=1 reproduces raw proportional shares") {
    val m = weights(1.0)
    assert(m("a")._1 === 10L && m("b")._1 === 40L && m("c")._1 === 50L)
    m.values.foreach { case (_, p, w) => assert(math.abs(p - w) < 1e-12) }
  }

  test("hand-computed tau=0.5 shares") {
    val m = weights(0.5)
    val z = math.sqrt(0.1) + math.sqrt(0.4) + math.sqrt(0.5)
    assert(math.abs(m("a")._3 - math.sqrt(0.1) / z) < 1e-12)
    assert(math.abs(m("c")._3 - math.sqrt(0.5) / z) < 1e-12)
  }

  test("lower tau flattens: tail share rises, head share falls, order preserved") {
    val (m1, m5) = (weights(1.0), weights(0.5))
    assert(m5("a")._3 > m1("a")._3 && m5("c")._3 < m1("c")._3)
    assert(m5("a")._3 < m5("b")._3 && m5("b")._3 < m5("c")._3)
  }

  test("weights sum to 1 and are partition-order deterministic under r4") {
    val m = weights(0.5)
    assert(math.abs(m.values.map(_._3).sum - 1.0) < 1e-12)
    val m2 = Sampling.temperatureWeights(df.repartition(7), col("g"), col("w"), 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    m.foreach { case (k, (_, _, w)) => assert(math.abs(w - m2(k)) < 1e-9) }
  }
}
