package graft.streaming

import graft.SparkSpec
import graft.ops.Indicators
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[IndicatorStream.emaOf]] — the untruncated streaming EMA, driven
  * end-to-end through RocksDB and checked against both a driver-side
  * fold and the batch [[Indicators.emaTruncated]] on the same series.
  */
class IndicatorStreamSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._
  import ExactCandleState.Closed

  private val t0 = 1629294300000L

  private def closed(off: Long, c: Double, key: String = "BTC"): Closed =
    Closed(t0 + off, "bitfinex", key, "USD", c, c + 1, c - 1, c, 1.0)

  private def withRocks(body: => Unit): Unit = {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prior match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming EMA ≡ driver fold; redelivered and stale candles are no-ops") {
    withRocks {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[Closed]
      val q = IndicatorStream.emaOf(in.toDS(), 2, 11)
        .writeStream.format("memory").queryName("ema_pts")
        .outputMode("append").start()
      try {
        in.addData(closed(0, 100.0), closed(60000, 200.0),
          closed(0, 50.0, key = "ETH"))
        q.processAllAvailable()
        // redelivery of the last candle + a stale out-of-order one +
        // genuine progress, across a batch boundary
        in.addData(closed(60000, 200.0), closed(0, 100.0), closed(120000, 300.0))
        q.processAllAvailable()

        val a = 2.0 / 11.0
        val closes = Seq(100.0, 200.0, 300.0)
        val expected = closes.tail.scanLeft(closes.head)((acc, x) => a * x + (1 - a) * acc)
        val btc = spark.table("ema_pts").filter($"base_id" === "BTC")
          .orderBy("time_ms").select("close", "ema")
          .as[(Double, Double)].collect().toSeq
        assert(btc.map(_._1) == closes, "each candle emitted exactly once")
        btc.map(_._2).zip(expected).foreach { case (got, exp) =>
          assert(got == exp, s"exact recursion: $got vs $exp")
        }
        val eth = spark.table("ema_pts").filter($"base_id" === "ETH")
          .select("ema").as[Double].collect().toSeq
        assert(eth == Seq(50.0), "keys fold independently")
      } finally q.stop()
    }
  }

  test("streaming EMA matches batch emaTruncated on a full-history window") {
    withRocks {
      implicit val sc = spark.sqlContext
      val closes = Seq(100.0, 140.0, 90.0, 210.0, 180.0, 160.0)
      val in = MemoryStream[Closed]
      val q = IndicatorStream.emaOf(in.toDS(), 2, 11)
        .writeStream.format("memory").queryName("ema_vs_batch")
        .outputMode("append").start()
      try {
        closes.zipWithIndex.foreach { case (c, i) =>
          in.addData(closed(i * 60000L, c))
        }
        q.processAllAvailable()
        val stream = spark.table("ema_vs_batch")
          .orderBy("time_ms").select("ema").as[Double].collect().toSeq
        // batch form on the same series: cents-lifted closes, window
        // covering the whole history ⇒ same recursion, same seed
        val batch = Indicators.emaTruncated(
            closes.zipWithIndex.map { case (c, i) =>
              ("k", i.toLong, (c * 100).toLong)
            }.toDF("key", "t", "c"),
            Seq(col("key")), col("t"), col("c"), 2, 11, window = closes.size)
          .orderBy("t").select("ema").as[Double].collect().toSeq
        stream.zip(batch).foreach { case (s, b) =>
          assert(math.abs(s - b) < 1e-12, s"stream $s vs batch $b")
        }
      } finally q.stop()
    }
  }
}
