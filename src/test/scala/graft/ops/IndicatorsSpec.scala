package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the indicator operators. */
class IndicatorsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def series(vals: Seq[Long]) =
    vals.zipWithIndex.map { case (c, i) => ("k", i.toLong, c) }
      .toDF("key", "t", "c")

  test("rsi: warm-up nulls, flat frame = 50, hand-checked value") {
    // 15 closes: deltas alternate +10/-5 → 7 gains of 10 and 7 losses
    // of 5 in the first full 14-delta frame.
    val vals = (0 until 15).scanLeft(100L) {
      case (acc, i) => acc + (if (i % 2 == 0) 10L else -5L)
    }.take(15)
    val out = Indicators.rsi(series(vals), Seq(col("key")), col("t"), col("c"), 14)
      .orderBy("t").select("rsi").as[Option[Double]].collect()
    assert(out.take(14).forall(_.isEmpty), "first 14 rows are warm-up")
    // frame at row 14: deltas rows 1..14 = 7×(+10), 7×(−5)
    val exp = 100.0 * 70 / (70 + 35)
    assert(math.abs(out(14).get - exp) < 1e-12)

    val flat = Indicators.rsi(series(Seq.fill(20)(42L)), Seq(col("key")),
      col("t"), col("c"), 14).orderBy("t").select("rsi")
      .as[Option[Double]].collect()
    assert(flat(19).contains(50.0d), "all-flat frame pins RSI to 50")
  }

  test("bollinger: constant series has zero-width bands; variance matches") {
    val out = Indicators.bollinger(series(Seq.fill(25)(200L)), Seq(col("key")),
      col("t"), col("c"), n = 20, k = 2.0)
      .orderBy("t").select("mid", "upper", "lower")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(out(18)._1.isEmpty, "warm-up row emits null")
    assert(out(24) == ((Some(2.0), Some(2.0), Some(2.0))))

    // two-value alternation 100/300 cents: mean 200c = 2.0, population
    // sd = 100c = 1.0 ⇒ bands at 2 ± 2·1
    val alt = Indicators.bollinger(series(Seq.tabulate(24)(i => if (i % 2 == 0) 100L else 300L)),
      Seq(col("key")), col("t"), col("c"), n = 20, k = 2.0)
      .orderBy("t").select("mid", "upper", "lower")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(alt(23) == ((Some(2.0), Some(4.0), Some(0.0))))
  }

  test("ema: recursion matches a driver-side fold; full-history window is exact") {
    val vals = Seq(100L, 200L, 300L, 250L, 150L, 400L)
    val out = Indicators.emaTruncated(series(vals), Seq(col("key")), col("t"),
      col("c"), alphaNum = 2, alphaDen = 11, window = 40)
      .orderBy("t").select("ema").as[Double].collect()
    val a = 2.0 / 11.0
    val exp = vals.map(_.toDouble).reduceLeft((acc, x) => a * x + (1.0 - a) * acc) / 100.0
    assert(math.abs(out.last - exp) < 1e-12)
    assert(out.head == 1.0, "seed = first close")
  }

  test("vwap: hand-checked weighted means, zero-qty buckets dropped") {
    val df = Seq(
      ("k", 0L, 1000L, 2L), ("k", 0L, 2000L, 2L), // bucket 0: (2000+4000)/4c
      ("k", 1L, 500L, 0L),                        // bucket 1: qty 0 → dropped
      ("k", 2L, 300L, 5L)
    ).toDF("key", "b", "pc", "q")
    val out = Indicators.vwap(df, Seq(col("key")), col("b").as("bucket"),
        col("pc"), col("q"))
      .orderBy("bucket").select("bucket", "qty", "vwap")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 4L, 15.0), (2L, 5L, 3.0)))
  }
}
