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

  test("Bitfinex raw capture replays end-to-end: acks build the chanId dim") {
    // a realistic mixed capture: subscribe acks, info banner, heartbeat,
    // candle frames (one for a channel whose ack is for another symbol),
    // and garbage — no hand-built chanSymbols anywhere
    val raw = Seq(
      """{"event":"info","version":2}""",
      """{"event":"subscribed","channel":"candles","chanId":17,"key":"trade:1m:tETHUSD"}""",
      """{"event":"subscribed","channel":"candles","chanId":23,"key":"trade:1m:tBTCUSD"}""",
      """[17,"hb"]""",
      """[17, [1629294300000, 2619.4, 2621.0, 2625.0, 2618.0, 0.05]]""",
      """[23, [1629294300000, 45000.0, 45100.0, 45200.0, 44900.0, 1.25]]""",
      """not json at all"""
    ).toDF("j")
    val subs = ExchangeFormats.bitfinexSubscriptions(raw, "j")
    assert(subs.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((17, "ETHUSD"), (23, "BTCUSD")))
    val candles = ExchangeFormats.parseBitfinexCapture(raw, "j", symExch)
    // BTCUSD has no symbol_exchange row -> dim-miss dropped; ETHUSD lands
    val r = candles.collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("base_id") == "ETH" && r.head.getAs[Double]("close") == 2621.0)
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

  /** Build a reference-shaped SignalR frame: JSON → DEFLATE → base64
    * (the inverse of fetchers/ws/bittrex.py:324-336's
    * decompress(b64decode(msg), -MAX_WBITS)).
    */
  private def signalRFrame(json: String, raw: Boolean = true): String = {
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
    defl.setInput(json.getBytes("UTF-8")); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  test("Bittrex SignalR frames: base64+deflate round-trips to the same candle rows") {
    val json = """{"marketSymbol":"ETH-BTC","delta":{"startsAt":"2021-08-18T13:45:00+00:00","open":0.061,"high":0.062,"low":0.060,"close":0.0615,"volume":3.25}}"""
    // raw-deflate (the real wire shape) and zlib-headered (the
    // reference's fallback branch) must both decode
    for (rawMode <- Seq(true, false)) {
      val frames = Seq(signalRFrame(json, rawMode)).toDF("f")
      val r = ExchangeFormats.parseBittrexFrames(frames, "f").first()
      assert(r.getAs[Long]("ts_ms") == 1629294300000L)
      assert(r.getAs[String]("base_id") == "ETH" && r.getAs[String]("quote_id") == "BTC")
      assert(r.getAs[Double]("close") == 0.0615 && r.getAs[Double]("volume") == 3.25)
    }
    // identical rows to feeding the clean JSON through parseBittrex
    val viaFrames = ExchangeFormats.parseBittrexFrames(
      Seq(signalRFrame(json)).toDF("f"), "f").collect().toSeq
    val viaJson = ExchangeFormats.parseBittrex(Seq(json).toDF("j"), "j").collect().toSeq
    assert(viaFrames == viaJson)
    // undecodable frames follow the malformed policy instead of throwing
    val garbage = Seq("!!!not-base64!!!", signalRFrame(json).dropRight(8)).toDF("f")
    assert(ExchangeFormats.parseBittrexFrames(garbage, "f").count() == 0)
  }

  test("dim-join misses (unknown symbol/chan) are dropped with the non-candle frames") {
    // well-formed candle but chan 99 has no symbol mapping -> null keys
    val raw = Seq("""[99, [1629294300000, 1.0, 1.0, 1.0, 1.0, 1.0]]""").toDF("j")
    val chans = Seq((17, "ETHUSD")).toDF("chan_id", "symbol")
    assert(ExchangeFormats.parseBitfinex(raw, "j", chans, symExch).count() == 0)
    val kept = ExchangeFormats.parseBitfinex(raw, "j", chans, symExch, keepMalformed = true)
    assert(kept.count() == 1 && kept.filter(col("base_id").isNull).count() == 1)
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
