package graft.catalog

import graft.core.OhlcvFixture
import graft.ops.CandleOps
import graft.catalog.Oracle._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries over the OHLCV domain layer itself. The
  * deterministic fixture ([[OhlcvFixture]]) is pure range arithmetic,
  * so the DuckDB oracle regenerates the identical table in SQL and
  * both engines roll it up independently — an end-to-end check of
  * CandleOps against the reference candle semantics without needing
  * OHLCV data in the testdata directory.
  */
object OhlcvQueries {
  private val N_PAIRS = 4
  private val ROWS = 1500

  /** DuckDB twin of [[OhlcvFixture.ohlcvs]] at `rows` minutes. */
  private def fixtureCteFor(rows: Int): String =
    s"""WITH ids AS (
       |  SELECT i % $rows AS minute, i // $rows AS pair
       |  FROM range(${N_PAIRS.toLong * rows}) t(i)
       |), expanded AS (
       |  SELECT minute, pair, unnest(range(pair % 3 + 1)) AS exi
       |  FROM ids WHERE minute % 97 <> 0
       |), fx AS (
       |  SELECT make_timestamp((1629244800 + minute * 60) * 1000000) AS time,
       |         ['bitfinex', 'binance', 'bittrex'][exi + 1] AS exchange,
       |         'BASE' || pair::VARCHAR AS base_id,
       |         'Q' || (pair % 2)::VARCHAR AS quote_id,
       |         100.0 + s / 100.0 AS open,
       |         101.0 + s / 100.0 AS high,
       |         99.0 + s / 100.0 AS low,
       |         CASE WHEN minute % 499 = 0 THEN 0.0 ELSE 100.5 + s / 100.0 END AS close,
       |         s / 100.0 + 0.01 AS volume
       |  FROM (SELECT *, (minute * 7919 + pair * 104729 + exi * 1299709) % 10000 AS s
       |        FROM expanded)
       |)""".stripMargin

  private val fixtureCte: String = fixtureCteFor(ROWS)

  /** Minutes for the calendar-rollup fixture: ~34.7 days, so the
    * month truncation genuinely splits (Aug/Sep 2021 buckets).
    */
  private val MONTH_ROWS = 50000

  /** The flagship chart read path (SURVEY §3.1) end-to-end through
    * OhlcvReader: interval dispatch to the 1h rollup, key filter, end
    * clamp to asOf-1min, DESC limit then ascending re-sort, epoch-ms
    * output, 4-dp bround (identity on this data — values are exact
    * 2-dp, so the oracle stays bit-exact; the gap-fill variant with
    * its window averages is covered by OhlcvSpec instead).
    */
  private def reader1h(s: SparkSession, d: String): DataFrame = {
    import graft.api.OhlcvReader
    val base = OhlcvFixture.ohlcvs(s, N_PAIRS, ROWS)
    val rollups = Map("1h" -> CandleOps.rollup(base, 3600L))
    OhlcvReader.read(base, rollups, OhlcvReader.Params(
      "bitfinex", "BASE2", "Q0", "1h", limit = 20,
      asOf = java.sql.Timestamp.valueOf("2021-08-19 02:00:00")))
      .select(col("time"), col("open"), col("high"), col("low"), col("close"),
        (round(col("volume") * 100d) / 100d).as("volume"))
  }

  private val reader1hSql: String =
    s"""$fixtureCte, rollup AS (
       |  SELECT exchange, base_id, quote_id,
       |         make_timestamp((epoch(time)::BIGINT // 3600) * 3600 * 1000000) AS bucket,
       |         min_by(open, time) AS open,
       |         max(high) AS high,
       |         min(low) AS low,
       |         max_by(close, time) AS close,
       |         round(SUM(${centsSql("volume")}) * 1.0) / 100.0 AS volume
       |  FROM fx GROUP BY 1, 2, 3, 4
       |), limited AS (
       |  SELECT * FROM rollup
       |  WHERE exchange = 'bitfinex' AND base_id = 'BASE2' AND quote_id = 'Q0'
       |    AND bucket <= TIMESTAMP '2021-08-19 01:59:00'
       |  ORDER BY bucket DESC LIMIT 20
       |)
       |SELECT epoch_ms(bucket) AS time,
       |       round(open, 4) AS open, round(high, 4) AS high,
       |       round(low, 4) AS low, round(close, 4) AS close, volume
       |FROM limited ORDER BY time""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ohlcv_reader_1h" -> reader1h,
    "ohlcv_rollup_1h" -> ((s, _) =>
      CandleOps.rollup(OhlcvFixture.ohlcvs(s, N_PAIRS, ROWS), 3600L)
        .select(col("exchange"), col("base_id"), col("quote_id"), col("bucket"),
          col("open"), col("high"), col("low"), col("close"),
          (round(col("volume") * 100d) / 100d).as("volume"))
        .orderBy(col("exchange"), col("base_id"), col("quote_id"), col("bucket"))),
    "ohlcv_rollup_7d_origin" -> ((s, _) =>
      CandleOps.rollup(OhlcvFixture.ohlcvs(s, N_PAIRS, ROWS), 604800L)
        .select(col("exchange"), col("base_id"), col("quote_id"), col("bucket"),
          col("open"), col("close"))
        .orderBy(col("exchange"), col("base_id"), col("quote_id"), col("bucket"))),
    // the reference's declared 1M interval (create.sql's calendar
    // aggregate; SURVEY §7.4 risk 6) — real calendar months via
    // date_trunc, on a ~35-day fixture so the truncation splits.
    // open/high/low/close are exact min/max/first/last selections;
    // the float volume SUM stays out (its month-long association
    // error is the one non-exact term — OhlcvSpec covers it).
    "ohlcv_rollup_1mo" -> ((s, _) =>
      CandleOps.rollupCalendar(OhlcvFixture.ohlcvs(s, N_PAIRS, MONTH_ROWS), "month")
        .select(col("exchange"), col("base_id"), col("quote_id"), col("bucket"),
          col("open"), col("high"), col("low"), col("close"))
        .orderBy(col("exchange"), col("base_id"), col("quote_id"), col("bucket"))),
  )

  def oracleSql: Map[String, String] = Map(
    "ohlcv_reader_1h" -> reader1hSql,
    "ohlcv_rollup_1h" ->
      s"""$fixtureCte
         |SELECT exchange, base_id, quote_id,
         |       make_timestamp((epoch(time)::BIGINT // 3600) * 3600 * 1000000) AS bucket,
         |       min_by(open, time) AS open,
         |       max(high) AS high,
         |       min(low) AS low,
         |       max_by(close, time) AS close,
         |       round(SUM(${centsSql("volume")}) * 1.0) / 100.0 AS volume
         |FROM fx GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,
    "ohlcv_rollup_7d_origin" ->
      s"""$fixtureCte
         |SELECT exchange, base_id, quote_id,
         |       make_timestamp(((epoch(time)::BIGINT - 946857600) // 604800) * 604800 * 1000000
         |                      + 946857600000000::BIGINT) AS bucket,
         |       min_by(open, time) AS open,
         |       max_by(close, time) AS close
         |FROM fx GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,
    "ohlcv_rollup_1mo" ->
      s"""${fixtureCteFor(50000)}
         |SELECT exchange, base_id, quote_id,
         |       date_trunc('month', time) AS bucket,
         |       min_by(open, time) AS open,
         |       max(high) AS high,
         |       min(low) AS low,
         |       max_by(close, time) AS close
         |FROM fx GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,
  )
}
