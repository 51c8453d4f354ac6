package graft.maintenance

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** J8: deleting a symbol_exchange row must remove its fact rows from
  * the base table, every rollup, and the error sink — the orchestrated
  * form of the reference's ON DELETE CASCADE FK
  * (schemas/create_tables.sql:66-70).
  */
class CascadeDeleteSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val symExch = Seq(
    ("bitfinex", "BTC", "USD", "BTCUSD", true),
    ("bitfinex", "ETH", "USD", "ETHUSD", true),
    ("binance", "BTC", "USDT", "BTCUSDT", false))
    .toDF("exchange", "base_id", "quote_id", "symbol", "is_trading")

  private val base = Seq(
    ("2021-01-01 00:00:00", "bitfinex", "BTC", "USD", 1d),
    ("2021-01-01 00:01:00", "bitfinex", "BTC", "USD", 2d),
    ("2021-01-01 00:00:00", "bitfinex", "ETH", "USD", 3d),
    ("2021-01-01 00:00:00", "binance", "BTC", "USDT", 4d))
    .toDF("time", "exchange", "base_id", "quote_id", "close")
    .withColumn("time", col("time").cast("timestamp"))
    .select(col("time"), col("exchange"), col("base_id"), col("quote_id"),
      col("close").as("open"), col("close").as("high"), col("close").as("low"),
      col("close"), lit(1.0d).as("volume"))

  private val errors = Seq(
    ("bitfinex", "BTCUSD", "boom"), ("bitfinex", "ETHUSD", "ok-ish"),
    ("binance", "BTCUSDT", "weight"))
    .toDF("exchange", "symbol", "exception_message")

  test("cascadeDeleteSymbols removes dim, facts, rollups, and errors for doomed keys") {
    val rollups = AggregateMaintenance.fullPopulate(base)
    val r = AggregateMaintenance.cascadeDeleteSymbols(
      symExch, col("exchange") === "bitfinex" && col("base_id") === "BTC",
      base, rollups, errors)
    assert(r.symbolExchange.count() == 2)
    assert(r.base.count() == 2)
    assert(r.base.filter(col("exchange") === "bitfinex" && col("base_id") === "BTC").count() == 0)
    // every maintained rollup cascades too
    r.rollups.values.foreach { roll =>
      assert(roll.filter(col("exchange") === "bitfinex" && col("base_id") === "BTC").count() == 0)
      assert(roll.filter(col("base_id") === "ETH").count() > 0)
    }
    // errors cascade by the (exchange, symbol) key the API writes
    assert(r.errors.collect().map(_.getString(1)).toSet == Set("ETHUSD", "BTCUSDT"))
  }

  test("cascadeDelete keeps unrelated keys bit-identical") {
    val (dim, Seq(facts)) = AggregateMaintenance.cascadeDelete(
      symExch, col("exchange") === "nosuch", Seq("exchange", "base_id", "quote_id"),
      Seq(base)) : @unchecked
    assert(dim.count() == 3)
    assert(facts.select(base.columns.map(col).toIndexedSeq: _*)
      .orderBy("time", "exchange").collect().toSeq ==
      base.orderBy("time", "exchange").collect().toSeq)
  }
}
