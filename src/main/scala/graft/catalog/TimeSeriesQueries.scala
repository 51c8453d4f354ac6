package graft.catalog

import graft.core.Tables
import graft.ops.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries exercising the time-series operator layer on
  * the `events` table, each with a DuckDB oracle (SURVEY §2.4/2.5).
  *
  * Conventions shared by every catalog object:
  *  - output column names match the oracle SQL exactly (driver sorts
  *    columns by name before hashing);
  *  - doubles are rounded to 4 dp on BOTH sides (reference rounds all
  *    served values to 4 dp HALF_EVEN, common/helpers/numbers.py:7-23;
  *    here it also absorbs FP summation-order differences);
  *  - every result carries a deterministic total ORDER BY.
  */
object TimeSeriesQueries {
  /** DuckDB equivalent of [[Tables.eventSeries]]: unique (event_type,
    * µs-truncated ts), latest event_id wins.
    */
  val seriesCte: String =
    """WITH series AS (
      |  SELECT event_type,
      |         epoch_ns(ts) // 1000 AS tus,
      |         max_by(value, event_id) AS value,
      |         max_by(user_id, event_id) AS user_id
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  private def series(s: SparkSession, dir: String): DataFrame =
    Tables.eventSeries(s, dir).withColumn("tus", unix_micros(col("ts")))

  private def rollupQuery(widthSec: Long)(s: SparkSession, dir: String): DataFrame =
    TimeSeries.candleRollup(
        Tables.eventSeries(s, dir), col("ts"), Seq(col("event_type")),
        col("value"), widthSec)
      .select(
        col("event_type"), col("bucket"),
        round(col("open"), 4).as("open"),
        round(col("high"), 4).as("high"),
        round(col("low"), 4).as("low"),
        round(col("close"), 4).as("close"),
        round(col("volume"), 4).as("volume"),
        col("n"))
      .orderBy("event_type", "bucket")

  private def rollupSql(widthSec: Long): String = {
    val w = widthSec * 1000000L
    s"""$seriesCte
       |SELECT event_type,
       |       make_timestamp((tus // $w) * $w) AS bucket,
       |       round(min_by(value, tus), 4) AS open,
       |       round(max(value), 4) AS high,
       |       round(min(value), 4) AS low,
       |       round(max_by(value, tus), 4) AS close,
       |       round(sum(value), 4) AS volume,
       |       count(*) AS n
       |FROM series GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_candle_1h" -> rollupQuery(3600L),
    "ts_candle_1d" -> rollupQuery(86400L),
  )

  def oracleSql: Map[String, String] = Map(
    "ts_candle_1h" -> rollupSql(3600L),
    "ts_candle_1d" -> rollupSql(86400L),
  )
}
