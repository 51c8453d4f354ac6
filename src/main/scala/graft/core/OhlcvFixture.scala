package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic OHLCV fixture (FIXTURES.md §1): a 1-minute
  * grid with deliberate gaps, multiple exchanges sharing (base, quote)
  * pairs, a handful of close=0 rows (filtered by analytics, reference
  * create.sql:242), and a dimension table with mixed `is_trading`.
  *
  * Generated distributively via spark.range — no driver-side loops —
  * so the same generator scales to arbitrary row counts for load
  * tests. Values are exact 2-dp doubles (hundredths) so aggregate
  * tests can use exact cents arithmetic.
  */
object OhlcvFixture {
  val exchanges = Seq("bitfinex", "binance", "bittrex")
  val startEpochSec = 1629244800L // 2021-08-18T00:00Z

  /** `rows` 1-minute candles per (exchange, pair): pairs 0..nPairs-1,
    * pair p on exchanges [0..(p % 3)] — so pair ids ≡ 2 (mod 3) exist
    * on all three exchanges (drives common-basequote, A2).
    * Every 97th minute is missing (gap detection / fill); every 499th
    * close is 0.
    */
  def ohlcvs(spark: SparkSession, nPairs: Int = 6, rows: Int = 3000): DataFrame = {
    val perPair = exchanges.indices.map(i => (i, exchanges(i)))
    val ex = array(exchanges.map(lit): _*)
    spark.range(nPairs.toLong * rows)
      .select(
        (col("id") % rows).as("minute"),
        (col("id") / rows).cast("long").as("pair"))
      .withColumn("n_ex", (col("pair") % 3 + 1).cast("int"))
      .withColumn("exi", explode(sequence(lit(0), col("n_ex") - 1)))
      .filter(col("minute") % 97 =!= 0)
      .select(
        timestamp_seconds(lit(startEpochSec) + col("minute") * 60).as("time"),
        element_at(ex, col("exi") + 1).as("exchange"),
        concat(lit("BASE"), col("pair")).as("base_id"),
        concat(lit("Q"), col("pair") % 2).as("quote_id"),
        col("minute"), col("pair"), col("exi"))
      .withColumn("seed",
        pmod(col("minute") * 7919 + col("pair") * 104729 + col("exi") * 1299709, lit(10000)))
      .select(
        col("time"), col("exchange"), col("base_id"), col("quote_id"),
        (lit(100.0) + col("seed") / 100.0).as("open"),
        (lit(101.0) + col("seed") / 100.0).as("high"),
        (lit(99.0) + col("seed") / 100.0).as("low"),
        when(col("minute") % 499 === 0, lit(0.0))
          .otherwise(lit(100.5) + col("seed") / 100.0).as("close"),
        (col("seed") / 100.0 + 0.01).as("volume"))
  }

  /** Dimension rows matching [[ohlcvs]]' key universe. */
  def symbolExchange(spark: SparkSession, nPairs: Int = 6): DataFrame = {
    import spark.implicits._
    val rows = for {
      p <- 0 until nPairs
      ei <- 0 to (p % 3)
    } yield (exchanges(ei), s"BASE$p", s"Q${p % 2}",
      s"BASE$p${if (exchanges(ei) == "bittrex") "-" else ""}Q${p % 2}",
      p % 4 != 3)
    rows.toDF("exchange", "base_id", "quote_id", "symbol", "is_trading")
  }
}
