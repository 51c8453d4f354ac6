package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WireFormatSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("wire roundtrip: serialize then parse recovers the row") {
    val df = Seq((1629294300000L, "bitfinex", "ETH", "USD", 2619.4, 2620.0, 2618.0, 2619.4, 0.0223))
      .toDF("ts_ms", "exchange", "base_id", "quote_id", "open", "high", "low", "close", "volume")
    val wired = df.select(
      WireFormat.toWireKey($"exchange", $"base_id", $"quote_id").as("k"),
      WireFormat.toWire($"ts_ms", $"open", $"high", $"low", $"close", $"volume").as("v"))
    val k = wired.first()
    assert(k.getString(0) == "ws_sub_bitfinex;;ETH;;USD")
    assert(k.getString(1) == "1629294300000;;2619.4;;2620.0;;2618.0;;2619.4;;0.0223")
    val back = WireFormat.parseWire(wired, "k", "v").first()
    assert(back.getLong(0) == 1629294300000L)
    assert(back.getString(1) == "bitfinex" && back.getString(2) == "ETH")
    assert(back.getDouble(4) == 2619.4 && back.getDouble(8) == 0.0223)
  }

  test("malformed wire rows yield nulls, not failures") {
    val bad = Seq(("ws_sub_x;;A;;B", "garbage")).toDF("k", "v")
    val r = WireFormat.parseWire(bad, "k", "v").first()
    assert(r.isNullAt(0)) // ts_ms not parseable
    assert(r.getString(1) == "x")
  }

  test("Bitfinex symbol parsing: longest-currency match and colon form") {
    val known = Set("ETH", "BTC", "USD", "DOGE", "EUR", "B", "TC")
    assert(SymbolParse.parseBitfinex("ETHBTC", known).contains(("ETH", "BTC")))
    assert(SymbolParse.parseBitfinex("DOGEBTC", known).contains(("DOGE", "BTC")))
    assert(SymbolParse.parseBitfinex("1INCH:USD", known).contains(("1INCH", "USD")))
    // ambiguous "BTC" -> "B"+"TC" only if both known; longest base wins
    assert(SymbolParse.parseBitfinex("BTCEUR", known).contains(("BTC", "EUR")))
    assert(SymbolParse.parseBitfinex("XXXYYY", known).isEmpty)
  }
}
