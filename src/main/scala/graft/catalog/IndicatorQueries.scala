package graft.catalog

import graft.core.Tables
import graft.ops.Indicators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.catalog.Oracle._

/** Technical-indicator queries over the hourly close series — the
  * indicator layer a reference user computes downstream of the candle
  * read path (reference chart.js:298-312 ships SMA; RSI / Bollinger /
  * EMA / VWAP are the canonical companions on the same series).
  * Operators in [[graft.ops.Indicators]]; every query is one keyed
  * exchange + streaming window, oracle-checked per the
  * [[Oracle]] determinism discipline.
  */
object IndicatorQueries {

  /** Hourly close series in exact cents: one row per (event_type,
    * hour), latest-in-hour close.
    */
  private def hourly(s: SparkSession, dir: String): DataFrame =
    Tables.eventSeries(s, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        (expr("tus div 3600000000") * 3600000000L).as("bus"))
      .agg(cents(max_by(col("value"), col("tus"))).as("c"))

  private val hourlyCte: String =
    s"""${TimeSeriesQueries.seriesCte}, hourly AS (
       |  SELECT event_type, (tus // 3600000000) * 3600000000 AS bus,
       |         ${centsSql("max_by(value, tus)")} AS c
       |  FROM series GROUP BY 1, 2
       |)""".stripMargin

  // ------------------------------------------------------------- RSI
  private def rsiQ(s: SparkSession, dir: String): DataFrame =
    Indicators.rsi(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"), periods = 14)
      .filter(col("rsi").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("rsi")).as("rsi"))
      .orderBy(col("event_type"), col("bus"))

  private val rsiSql: String =
    s"""$hourlyCte, d AS (
       |  SELECT event_type, bus, c,
       |         c - lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS delta
       |  FROM hourly
       |), g AS (
       |  SELECT event_type, bus, delta,
       |         CASE WHEN delta > 0 THEN delta ELSE 0 END AS gain,
       |         CASE WHEN delta < 0 THEN -delta ELSE 0 END AS loss
       |  FROM d
       |), w AS (
       |  SELECT event_type, bus,
       |         count(delta) OVER fr AS n,
       |         CAST(sum(gain) OVER fr AS BIGINT) AS sg,
       |         CAST(sum(loss) OVER fr AS BIGINT) AS sl
       |  FROM g
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("CASE WHEN sg + sl = 0 THEN 50.0 " +
                        "ELSE 100.0 * sg / CAST(sg + sl AS DOUBLE) END")} AS rsi
       |FROM w WHERE n >= 14 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------- Bollinger bands
  private def bollingerQ(s: SparkSession, dir: String): DataFrame =
    Indicators.bollinger(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"), n = 20, k = 2.0d)
      .filter(col("mid").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("mid")).as("mid"), r4(col("upper")).as("upper"),
        r4(col("lower")).as("lower"))
      .orderBy(col("event_type"), col("bus"))

  private val bollingerSql: String =
    s"""$hourlyCte, w AS (
       |  SELECT event_type, bus,
       |         count(c) OVER fr AS cnt,
       |         CAST(sum(c) OVER fr AS BIGINT) AS sc,
       |         CAST(sum(c * c) OVER fr AS BIGINT) AS sc2
       |  FROM hourly
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("sc / (100.0 * 20.0)")} AS mid,
       |       ${r4Sql("sc / (100.0 * 20.0) + 2.0 * " +
                       "(sqrt(CAST(20 * sc2 - sc * sc AS DOUBLE)) / (100.0 * 20.0))")} AS upper,
       |       ${r4Sql("sc / (100.0 * 20.0) - 2.0 * " +
                       "(sqrt(CAST(20 * sc2 - sc * sc AS DOUBLE)) / (100.0 * 20.0))")} AS lower
       |FROM w WHERE cnt >= 20 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- EMA
  private def emaQ(s: SparkSession, dir: String): DataFrame =
    Indicators.emaTruncated(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"), alphaNum = 2, alphaDen = 11, window = 40)
      .select(col("event_type"), col("bus"), r4(col("ema")).as("ema"))
      .orderBy(col("event_type"), col("bus"))

  private val emaSql: String =
    s"""$hourlyCte, arr AS (
       |  SELECT event_type, bus,
       |         list(CAST(c AS DOUBLE)) OVER (
       |           PARTITION BY event_type ORDER BY bus
       |           ROWS BETWEEN 39 PRECEDING AND CURRENT ROW) AS l
       |  FROM hourly
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("list_reduce(l, (acc, x) -> " +
                       "(2.0/11.0) * x + (1.0 - 2.0/11.0) * acc) / 100.0")} AS ema
       |FROM arr ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ VWAP
  /** Hourly VWAP weighted by the `props.k` quantity — the
    * Σ(price·qty)/Σqty bucket aggregate of the reference's candle
    * volume path, with the JSON payload projected through a declared
    * schema (same discipline as `ts_json_extract`).
    */
  private def vwapQ(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    val ev = Tables.events(s, dir)
      .withColumn("k", from_json(col("props"), schema).getField("k"))
      .filter(col("k").isNotNull)
      .withColumn("tus", unix_micros(col("ts")))
    Indicators.vwap(ev, Seq(col("event_type")),
        (expr("tus div 3600000000") * 3600000000L).as("bus"),
        cents(col("value")), col("k"))
      .filter(col("vwap").isNotNull)
      .select(col("event_type"), col("bus"), col("qty"),
        r4(col("vwap")).as("vwap"))
      .orderBy(col("event_type"), col("bus"))
  }

  private val vwapSql: String =
    s"""WITH ex AS (
       |  SELECT event_type,
       |         ((epoch_ns(ts) // 1000) // 3600000000) * 3600000000 AS bus,
       |         ${centsSql("value")} AS pc,
       |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
       |  FROM events
       |)
       |SELECT event_type, bus,
       |       CAST(sum(k) AS BIGINT) AS qty,
       |       ${r4Sql("CAST(sum(pc * k) AS BIGINT) / (100.0 * CAST(sum(k) AS BIGINT))")} AS vwap
       |FROM ex WHERE k IS NOT NULL
       |GROUP BY 1, 2 HAVING sum(k) > 0
       |ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_rsi"       -> rsiQ,
    "ts_bollinger" -> bollingerQ,
    "ts_ema"       -> emaQ,
    "ts_vwap"      -> vwapQ,
  )

  def oracleSql: Map[String, String] = Map(
    "ts_rsi"       -> rsiSql,
    "ts_bollinger" -> bollingerSql,
    "ts_ema"       -> emaSql,
    "ts_vwap"      -> vwapSql,
  )
}
