package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test: CandleOps.rollup vs an independent
  * in-memory Scala reference over random candle batches (SURVEY §5
  * rebuild plan: property tests for rollup invariants). Fixed seeds →
  * reproducible failures.
  */
case class Row1m(minute: Int, exchange: String, pair: Int,
                 open: Double, high: Double, low: Double, close: Double,
                 volume: Double)

class CandleRollupPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val rowGen: Gen[Row1m] = for {
    minute <- Gen.choose(0, 600)
    ex <- Gen.oneOf("bitfinex", "binance")
    pair <- Gen.choose(0, 2)
    mid <- Gen.choose(1.0, 1000.0)
    spread <- Gen.choose(0.0, 10.0)
    o <- Gen.choose(mid - spread, mid + spread)
    c <- Gen.choose(mid - spread, mid + spread)
    v <- Gen.choose(0.0, 50.0)
  } yield Row1m(minute, ex, pair, o, math.max(o, c) + spread, math.min(o, c) - spread, c, v)

  private val base = 1600002000L // hour-aligned epoch

  test("rollup matches an in-memory reference on random batches") {
    for (seed <- 1L to 5L) {
      val rows = Gen.listOfN(300, rowGen)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"gen failed for seed $seed"))
      val uniq = rows.groupBy(r => (r.exchange, r.pair, r.minute))
        .map(_._2.last).toSeq

      val df = uniq.toDF()
        .select(
          timestamp_seconds(lit(base) + col("minute") * 60).as("time"),
          col("exchange"), concat(lit("B"), col("pair")).as("base_id"),
          lit("USD").as("quote_id"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))

      val got = CandleOps.rollup(df, 3600L).collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getAs[java.sql.Timestamp]("bucket").getTime) ->
          (r.getAs[Double]("open"), r.getAs[Double]("high"),
           r.getAs[Double]("low"), r.getAs[Double]("close"),
           r.getAs[Double]("volume"))).toMap

      val want = uniq.groupBy(r => (r.exchange, s"B${r.pair}", r.minute / 60))
        .map { case ((ex, b, hr), rs) =>
          val sorted = rs.toSeq.sortBy(_.minute)
          (ex, b, (base + hr.toLong * 3600) * 1000) ->
            (sorted.head.open, rs.map(_.high).max, rs.map(_.low).min,
             sorted.last.close, rs.map(_.volume).sum)
        }

      assert(got.keySet == want.keySet, s"seed $seed: bucket keys differ")
      got.foreach { case (k, (o, h, l, c, v)) =>
        val (wo, wh, wl, wc, wv) = want(k)
        assert(o == wo && h == wh && l == wl && c == wc,
          s"seed $seed key $k: ohlc mismatch")
        assert(math.abs(v - wv) < 1e-6, s"seed $seed key $k: volume $v vs $wv")
      }
    }
  }
}
