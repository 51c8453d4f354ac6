package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parsers for the three exchange-native WS payload shapes
  * (FIXTURES.md §3) into the canonical stream row
  * (ts_ms, exchange, base_id, quote_id, open, high, low, close,
  * volume). All pure expressions with try_-safe casts: one malformed
  * message nulls out instead of killing the stream.
  *
  * Symbol→(base, quote) resolution needs the per-exchange dim table
  * (symbol_exchange); parsers take it as a broadcastable DataFrame
  * with (symbol, base_id, quote_id) — the reference resolves symbols
  * the same way via its dim table.
  */
object ExchangeFormats {

  /** Bitfinex: `[chanId, [ts_ms, open, CLOSE, HIGH, low, volume]]` —
    * note index 2 = close, 3 = high (reference
    * fetchers/ws/bitfinex.py:145-156). `chanSymbols` maps chanId →
    * symbol (per-connection subscription state in the reference).
    */
  def parseBitfinex(raw: DataFrame, jsonCol: String,
                    chanSymbols: DataFrame, symExch: DataFrame,
                    keepMalformed: Boolean = false): DataFrame = {
    val inner = expr(s"from_json(get_json_object($jsonCol, '$$[1]'), 'array<double>')")
    val parsed = raw
      .withColumn("chan_id", expr(s"try_cast(get_json_object($jsonCol, '$$[0]') AS int)"))
      .withColumn("c", inner)
      .select(col("chan_id"),
        expr("try_cast(try_element_at(c, 1) AS bigint)").as("ts_ms"),
        expr("try_element_at(c, 2)").as("open"),
        expr("try_element_at(c, 3)").as("close"),
        expr("try_element_at(c, 4)").as("high"),
        expr("try_element_at(c, 5)").as("low"),
        expr("try_element_at(c, 6)").as("volume"))
    parsed
      .join(broadcast(chanSymbols), Seq("chan_id"), "left")
      .join(broadcast(symExch.filter(col("exchange") === "bitfinex")), Seq("symbol"), "left")
      .select(col("ts_ms"), lit("bitfinex").as("exchange"),
        col("base_id"), col("quote_id"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .transform(dropNonCandles(keepMalformed))
  }

  /** Subscription-state builder: derive the chanId→symbol dim from the
    * subscribe-ack frames inside the capture itself, the way the
    * reference's WS loop does (`wssymbol_mapping[respj['key']]` on
    * `event == "subscribed"` then `chanid_mapping[respj['chanId']]`,
    * fetchers/ws/bitfinex.py:107-143). The ack's key is
    * `trade:<tf>:t<symbol>` (subscribe_one builds it with
    * make_tsymbol = 't'+symbol — bitfinex.py:101-106, rest/bitfinex
    * .py:112-120), so the symbol is the key minus that prefix.
    *
    * Like the reference's per-connection dict, one mapping per
    * chanId is assumed within a capture; replaying captures that
    * re-use a chanId across reconnects should split per connection
    * first (the reference never faces this — it rebuilds the dict on
    * reconnect).
    */
  def bitfinexSubscriptions(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(
        expr(s"try_cast(get_json_object($jsonCol, '$$.chanId') AS int)").as("chan_id"),
        expr(s"get_json_object($jsonCol, '$$.event')").as("event"),
        expr(s"get_json_object($jsonCol, '$$.key')").as("key"))
      .filter(col("event") === "subscribed" && col("chan_id").isNotNull)
      .select(col("chan_id"),
        regexp_extract(col("key"), "^trade:[^:]+:t(.+)$", 1).as("symbol"))
      .filter(col("symbol") =!= "")
      .distinct()

  /** End-to-end Bitfinex capture replay: no hand-built chanSymbols —
    * the subscription state comes from the capture's own ack frames
    * ([[bitfinexSubscriptions]]), candle frames then resolve through
    * it exactly as in [[parseBitfinex]].
    */
  def parseBitfinexCapture(raw: DataFrame, jsonCol: String, symExch: DataFrame,
                           keepMalformed: Boolean = false): DataFrame =
    parseBitfinex(raw, jsonCol, bitfinexSubscriptions(raw, jsonCol),
      symExch, keepMalformed)

  /** Non-candle frames (heartbeats like `[chanId,"hb"]`, subscription
    * acks, malformed JSON) parse to null ts_ms, and a well-formed
    * candle whose chan_id/symbol misses the dim join has null
    * base_id/quote_id; by default both are dropped so they cannot
    * create null-key groups in streaming state or land in a
    * __HIVE_DEFAULT_PARTITION__. `keepMalformed=true` keeps them for
    * routing to an error sink.
    */
  private def dropNonCandles(keep: Boolean)(df: DataFrame): DataFrame =
    if (keep) df
    else df.filter(col("ts_ms").isNotNull &&
      col("base_id").isNotNull && col("quote_id").isNotNull)

  private val binanceSchema = StructType(Seq(
    StructField("s", StringType),
    StructField("k", StructType(Seq(
      StructField("t", LongType), StructField("o", StringType),
      StructField("h", StringType), StructField("l", StringType),
      StructField("c", StringType), StructField("v", StringType))))))

  /** Binance: `{"s":"ETHBTC","k":{"t":..,"o":..,"h":..,"l":..,"c":..,"v":..}}`
    * (reference fetchers/ws/binance.py:105-112; numeric fields are
    * JSON strings on the Binance wire).
    */
  def parseBinance(raw: DataFrame, jsonCol: String, symExch: DataFrame,
                   keepMalformed: Boolean = false): DataFrame = {
    val j = from_json(col(jsonCol), binanceSchema)
    raw.select(
        j.getField("s").as("symbol"),
        j.getField("k").getField("t").as("ts_ms"),
        j.getField("k").getField("o").cast("double").as("open"),
        j.getField("k").getField("h").cast("double").as("high"),
        j.getField("k").getField("l").cast("double").as("low"),
        j.getField("k").getField("c").cast("double").as("close"),
        j.getField("k").getField("v").cast("double").as("volume"))
      .join(broadcast(symExch.filter(col("exchange") === "binance")), Seq("symbol"), "left")
      .select(col("ts_ms"), lit("binance").as("exchange"),
        col("base_id"), col("quote_id"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .transform(dropNonCandles(keepMalformed))
  }

  private val bittrexSchema = StructType(Seq(
    StructField("marketSymbol", StringType),
    StructField("delta", StructType(Seq(
      StructField("startsAt", StringType), StructField("open", DoubleType),
      StructField("high", DoubleType), StructField("low", DoubleType),
      StructField("close", DoubleType), StructField("volume", DoubleType))))))

  /** Bittrex: `{"marketSymbol":"ETH-BTC","delta":{"startsAt":"<ISO>",...}}`
    * (reference fetchers/ws/bittrex.py:236-246); ISO timestamp → ms,
    * symbol is "BASE-QUOTE".
    */
  def parseBittrex(raw: DataFrame, jsonCol: String,
                   keepMalformed: Boolean = false): DataFrame = {
    val raw2 = raw.withColumn("__bx", from_json(col(jsonCol), bittrexSchema))
    val j = col("__bx")
    val sym = split(j.getField("marketSymbol"), "-")
    raw2.select(
      // startsAt comes from the single from_json pass; try_-style
      // safety via try_cast keeps malformed timestamps as nulls
      unix_millis(expr("try_cast(__bx.delta.startsAt AS timestamp)")).as("ts_ms"),
      lit("bittrex").as("exchange"),
      element_at(sym, 1).as("base_id"),
      element_at(sym, 2).as("quote_id"),
      j.getField("delta").getField("open").as("open"),
      j.getField("delta").getField("high").as("high"),
      j.getField("delta").getField("low").as("low"),
      j.getField("delta").getField("close").as("close"),
      j.getField("delta").getField("volume").as("volume"))
      .transform(dropNonCandles(keepMalformed))
  }

  /** Bittrex SignalR wire frames: base64 text wrapping a raw-deflate
    * compressed JSON payload (reference fetchers/ws/bittrex.py:324-336).
    * unbase64 → [[graft.functions.Inflate]] (raw, then zlib-headered
    * fallback) → UTF-8 → the plain-JSON [[parseBittrex]]. Undecodable
    * frames become null rows and follow the keepMalformed policy —
    * replaying a real Bittrex capture needs no pre-processing.
    */
  def parseBittrexFrames(raw: DataFrame, frameCol: String,
                         keepMalformed: Boolean = false): DataFrame = {
    // try_to_binary: ANSI unbase64 throws on invalid base64; a bad
    // frame must become a null row, not kill the stream
    val decoded = raw.withColumn("__frame_json",
      graft.functions.Inflate.inflate(
        expr(s"try_to_binary(trim($frameCol), 'base64')")).cast("string"))
    parseBittrex(decoded, "__frame_json", keepMalformed)
  }
}
