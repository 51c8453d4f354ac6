package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BackfillSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  /** Deterministic fake exchange: one candle per minute; the
    * ("bitfinex","BAD","X") key always fails.
    */
  object FakeExchange extends Backfill.Fetcher {
    override def fetch(t: Backfill.Task) = {
      if (t.baseId == "BAD") throw new RuntimeException("HTTP 429 rate limited")
      (t.startMs until t.endMs by 60000L).map { ts =>
        val p = (ts / 60000 % 100) / 10.0 + 100.0
        (ts, p, p + 1, p - 1, p + 0.5, 1.25)
      }
    }
  }

  test("dayTasks expands keys x days distributively") {
    val tasks = Backfill.dayTasks(spark,
      Seq(("bitfinex", "BTC", "USD"), ("binance", "ETH", "USD")),
      0L, 3 * 86400000L)
    assert(tasks.count() == 2 * 3)
    assert(tasks.agg(max("end_ms")).first().getLong(0) == 3 * 86400000L)
  }

  test("backfill fetches, dedups, appends first-write-wins, and reports errors") {
    val tasks = Backfill.dayTasks(spark,
      Seq(("bitfinex", "BTC", "USD"), ("bitfinex", "BAD", "X")),
      0L, 86400000L)
    // pre-existing row at minute 0 with different values: must survive
    val existing = Seq(("1970-01-01 00:00:00", "bitfinex", "BTC", "USD",
        7.0, 7.0, 7.0, 7.0, 7.0))
      .toDF("time", "exchange", "base_id", "quote_id", "open", "high", "low", "close", "volume")
      .withColumn("time", col("time").cast("timestamp"))

    val (table, errors) = Backfill.backfillInto(existing, tasks, FakeExchange)
    assert(table.count() == 1440) // 1 day of minutes, dup with existing ignored
    assert(table.filter(col("time") === "1970-01-01 00:00:00")
      .first().getAs[Double]("open") == 7.0) // first write wins
    val err = errors.collect()
    assert(err.length == 1)
    assert(err.head.getAs[String]("exchange") == "bitfinex")
    assert(err.head.getAs[String]("symbol") == "BADX")
    assert(err.head.getAs[String]("exception_message").contains("429"))
  }
}
