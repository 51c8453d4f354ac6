package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExchangeFormatsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  val symExch = Seq(
    ("bitfinex", "ETH", "USD", "ETHUSD", true),
    ("binance", "ETH", "BTC", "ETHBTC", true)
  ).toDF("exchange", "base_id", "quote_id", "symbol", "is_trading")

  test("Bitfinex array frames parse with the close/high swap") {
    val raw = Seq("""[17, [1629294300000, 2619.4, 2621.0, 2625.0, 2618.0, 0.05]]""").toDF("j")
    val chans = Seq((17, "ETHUSD")).toDF("chan_id", "symbol")
    val r = ExchangeFormats.parseBitfinex(raw, "j", chans, symExch).first()
    assert(r.getAs[Long]("ts_ms") == 1629294300000L)
    assert(r.getAs[String]("base_id") == "ETH" && r.getAs[String]("quote_id") == "USD")
    assert(r.getAs[Double]("close") == 2621.0) // index 2
    assert(r.getAs[Double]("high") == 2625.0)  // index 3
    assert(r.getAs[Double]("low") == 2618.0)
  }

  test("Binance kline JSON parses (numeric strings on the wire)") {
    val raw = Seq(
      """{"s":"ETHBTC","k":{"t":1629294300000,"o":"0.061","h":"0.062","l":"0.060","c":"0.0615","v":"12.5"}}"""
    ).toDF("j")
    val r = ExchangeFormats.parseBinance(raw, "j", symExch).first()
    assert(r.getAs[String]("exchange") == "binance")
    assert(r.getAs[String]("base_id") == "ETH" && r.getAs[String]("quote_id") == "BTC")
    assert(r.getAs[Double]("open") == 0.061 && r.getAs[Double]("volume") == 12.5)
  }

  test("Bittrex delta JSON parses ISO timestamps and BASE-QUOTE symbols") {
    val raw = Seq(
      """{"marketSymbol":"ETH-BTC","delta":{"startsAt":"2021-08-18T13:45:00+00:00","open":0.061,"high":0.062,"low":0.060,"close":0.0615,"volume":3.25}}"""
    ).toDF("j")
    val r = ExchangeFormats.parseBittrex(raw, "j").first()
    assert(r.getAs[Long]("ts_ms") == 1629294300000L)
    assert(r.getAs[String]("base_id") == "ETH" && r.getAs[String]("quote_id") == "BTC")
    assert(r.getAs[Double]("close") == 0.0615)
  }

  test("non-candle frames (heartbeats, garbage) are dropped by default, kept on request") {
    val raw = Seq("""not json at all""", """[17, "hb"]""").toDF("j")
    val chans = Seq((17, "ETHUSD")).toDF("chan_id", "symbol")
    assert(ExchangeFormats.parseBitfinex(raw, "j", chans, symExch).count() == 0)
    assert(ExchangeFormats.parseBittrex(raw, "j").count() == 0)
    val kept = ExchangeFormats.parseBitfinex(raw, "j", chans, symExch, keepMalformed = true)
    assert(kept.count() == 2 && kept.filter(col("ts_ms").isNull).count() == 2)
  }
}
