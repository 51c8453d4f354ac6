package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's `;;`-delimited wire formats (SURVEY F10; reference
  * fetchers/helpers/ws.py:6-17, fetchers/config/constants.py:36-44):
  *
  *   value: "{t};;{o};;{h};;{l};;{c};;{v}"  (Redis hash value)
  *   key:   "ws_sub_{exchange};;{base};;{quote}"
  *
  * Needed to replay reference-produced data into the Spark pipeline
  * (and to emit data a reference deployment could consume). Pure
  * Column expressions — codegen-friendly.
  */
object WireFormat {

  /** Serialize candle columns to the reference wire value. */
  def toWire(tsMs: Column, o: Column, h: Column, l: Column, c: Column,
             v: Column): Column =
    concat_ws(";;", tsMs, o, h, l, c, v)

  def toWireKey(exchange: Column, base: Column, quote: Column): Column =
    concat(lit("ws_sub_"), concat_ws(";;", exchange, base, quote))

  /** Parse a (key, value) wire pair into the canonical stream row
    * (ts_ms, exchange, base_id, quote_id, open, high, low, close,
    * volume). Malformed rows yield nulls rather than failing the job.
    */
  def parseWire(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    // try_cast, not cast: under ANSI mode (Spark 4 default) a plain
    // cast would fail the whole job on one malformed wire row.
    def num(arr: String, i: Int, t: String) =
      expr(s"try_cast(try_element_at($arr, $i) AS $t)")
    df
      .withColumn("__k", split(regexp_replace(col(keyCol), "^ws_sub_", ""), ";;"))
      .withColumn("__p", split(col(valueCol), ";;"))
      .select(
        num("__p", 1, "bigint").as("ts_ms"),
        expr("try_element_at(__k, 1)").as("exchange"),
        expr("try_element_at(__k, 2)").as("base_id"),
        expr("try_element_at(__k, 3)").as("quote_id"),
        num("__p", 2, "double").as("open"),
        num("__p", 3, "double").as("high"),
        num("__p", 4, "double").as("low"),
        num("__p", 5, "double").as("close"),
        num("__p", 6, "double").as("volume"))
  }
}

/** Bitfinex symbol → (base, quote) parsing (SURVEY F11; reference
  * fetchers/rest/bitfinex.py:58-109): symbols are either
  * "{BASE}{QUOTE}" with no separator (longest-known-currency match,
  * e.g. "ETHBTC", "DOGEBTC") or "{BASE}:{QUOTE}" (e.g. "1INCH:USD").
  * Pure function used at ingest — not a query operator.
  */
object SymbolParse {
  /** @param knownCurrencies the exchange's currency list, as fetched
    *        from its conf endpoint (longest-match disambiguation)
    */
  def parseBitfinex(symbol: String, knownCurrencies: Set[String]): Option[(String, String)] = {
    if (symbol.contains(":")) {
      symbol.split(":") match {
        case Array(b, q) if b.nonEmpty && q.nonEmpty => Some((b, q))
        case _ => None
      }
    } else {
      // longest known base prefix whose remainder is also known
      val candidates = knownCurrencies
        .filter(c => symbol.startsWith(c) && knownCurrencies.contains(symbol.drop(c.length)))
      if (candidates.isEmpty) None
      else {
        val base = candidates.maxBy(_.length)
        Some((base, symbol.drop(base.length)))
      }
    }
  }
}
