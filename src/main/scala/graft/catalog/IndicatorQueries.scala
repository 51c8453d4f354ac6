package graft.catalog

import graft.core.Tables
import graft.ops.Indicators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.expressions.Window
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

  /** One early hash partition on the series key: hash(event_type)
    * satisfies ClusteredDistribution for the (event_type, ts) dedup
    * aggregation, the (event_type, bus) hourly rollup, AND the
    * event_type-partitioned indicator window — so the whole pipeline
    * runs on a single exchange (plus the output sort) instead of one
    * per stage (4 → 2, ExplainAudit). Per-key locality is what the
    * window requires anyway, so this adds no constraint at scale.
    */
  // Numbered column repartition: the bare repartition(col) form is
  // REPARTITION_BY_COL, which AQE's size-based coalescing is allowed
  // to fold to ONE partition on small-byte/heavy-CPU stages
  // (GenFilterScan round 14c: 0.3-0.6 s single-task window stages in
  // the vwap/mfi/obv family). Pinning the number keeps each
  // event_type's series-window work on its own task.
  private def byKey(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism,
      col("event_type"))

  /** Hourly close series in exact cents: one row per (event_type,
    * hour), latest-in-hour close.
    */
  private[graft] def hourly(s: SparkSession, dir: String): DataFrame =
    // fanOut: events.parquet is one row group, so without the fan the
    // bucket/cents map side of the first exchange runs in ONE task
    // (GenFilterScan round 14c: 0.3-0.5 s single-task stages across
    // the whole hourly family — ts_beta, ts_sma10, ts_vwap, ts_mfi…)
    Tables.eventSeriesOver(byKey(Tables.fanOut(Tables.events(s, dir))))
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        (expr("tus div 3600000000") * 3600000000L).as("bus"))
      .agg(cents(max_by(col("value"), col("tus"))).as("c"))

  private[graft] val hourlyCte: String =
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

  /** Hourly OHLC candle series in exact cents ([[byKey]] single-
    * exchange plan, as [[hourly]]).
    */
  private def hourlyOhlc(s: SparkSession, dir: String): DataFrame =
    Tables.eventSeriesOver(byKey(Tables.events(s, dir)))
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        (expr("tus div 3600000000") * 3600000000L).as("bus"))
      .agg(
        cents(max(col("value"))).as("h"),
        cents(min(col("value"))).as("l"),
        cents(max_by(col("value"), col("tus"))).as("c"))

  private val hourlyOhlcCte: String =
    s"""${TimeSeriesQueries.seriesCte}, hourly AS (
       |  SELECT event_type, (tus // 3600000000) * 3600000000 AS bus,
       |         ${centsSql("max(value)")} AS h,
       |         ${centsSql("min(value)")} AS l,
       |         ${centsSql("max_by(value, tus)")} AS c
       |  FROM series GROUP BY 1, 2
       |)""".stripMargin

  // ----------------------------------------------------- Heikin-Ashi
  /** [[Indicators.heikinAshi]] over the hourly OHLC series (open =
    * first-in-hour value rides along for this query; the recursion
    * needs it only at the seed).
    */
  private def heikinAshiQ(s: SparkSession, dir: String): DataFrame = {
    val ohlc = Tables.eventSeriesOver(byKey(Tables.events(s, dir)))
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        (expr("tus div 3600000000") * 3600000000L).as("bus"))
      .agg(
        cents(min_by(col("value"), col("tus"))).as("o"),
        cents(max(col("value"))).as("h"),
        cents(min(col("value"))).as("l"),
        cents(max_by(col("value"), col("tus"))).as("c"))
    Indicators.heikinAshi(ohlc, Seq(col("event_type")), col("bus"),
        col("o"), col("h"), col("l"), col("c"))
      .select(col("event_type"), col("bus"),
        r4(col("ha_open")).as("ha_open"), r4(col("ha_high")).as("ha_high"),
        r4(col("ha_low")).as("ha_low"), r4(col("ha_close")).as("ha_close"))
      .orderBy(col("event_type"), col("bus"))
  }

  private val heikinAshiSql: String =
    s"""${TimeSeriesQueries.seriesCte}, ohlc AS (
       |  SELECT event_type, (tus // 3600000000) * 3600000000 AS bus,
       |         ${centsSql("min_by(value, tus)")} AS o,
       |         ${centsSql("max(value)")} AS h,
       |         ${centsSql("min(value)")} AS l,
       |         ${centsSql("max_by(value, tus)")} AS c
       |  FROM series GROUP BY 1, 2
       |), g AS (
       |  SELECT event_type, bus, o, h, l, c,
       |         CAST(o + h + l + c AS BIGINT) AS hacq,
       |         CASE WHEN row_number() OVER w = 1
       |              THEN CAST(o + c AS DOUBLE) / 2.0
       |              ELSE CAST(lag(o + h + l + c) OVER w AS DOUBLE) / 4.0 END AS gv
       |  FROM ohlc WINDOW w AS (PARTITION BY event_type ORDER BY bus)
       |), f AS (
       |  SELECT event_type, bus, h, l, hacq,
       |         list_reduce(list(gv) OVER fr, (acc, x) -> (x + acc) / 2.0) / 100.0 AS ha_open,
       |         CAST(hacq AS DOUBLE) / 400.0 AS ha_close
       |  FROM g WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                       ROWS BETWEEN 40 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("ha_open")} AS ha_open,
       |       ${r4Sql("greatest(CAST(h AS DOUBLE) / 100.0, ha_open, ha_close)")} AS ha_high,
       |       ${r4Sql("least(CAST(l AS DOUBLE) / 100.0, ha_open, ha_close)")} AS ha_low,
       |       ${r4Sql("ha_close")} AS ha_close
       |FROM f ORDER BY event_type, bus""".stripMargin

  // ------------------------------------------------------ Stochastic
  private def stochasticQ(s: SparkSession, dir: String): DataFrame =
    Indicators.stochastic(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), col("c"), n = 14)
      .filter(col("pct_k").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("pct_k")).as("pct_k"), r4(col("pct_d")).as("pct_d"))
      .orderBy(col("event_type"), col("bus"))

  private val stochasticSql: String =
    s"""$hourlyOhlcCte, w AS (
       |  SELECT event_type, bus, c,
       |         count(c) OVER fr AS cnt,
       |         min(l) OVER fr AS lo,
       |         max(h) OVER fr AS hi
       |  FROM hourly
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |), k AS (
       |  SELECT event_type, bus,
       |         CASE WHEN cnt < 14 THEN NULL
       |              WHEN hi = lo THEN 50.0
       |              ELSE 100.0 * (c - lo) / CAST(hi - lo AS DOUBLE) END AS pct_k
       |  FROM w
       |), d AS (
       |  SELECT event_type, bus, pct_k,
       |         list_filter(list(pct_k) OVER (
       |           PARTITION BY event_type ORDER BY bus
       |           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       |           x -> x IS NOT NULL) AS ks
       |  FROM k
       |)
       |SELECT event_type, bus, ${r4Sql("pct_k")} AS pct_k,
       |       ${r4Sql("CASE WHEN len(ks) = 3 THEN " +
                       "list_reduce(ks, (acc, x) -> acc + x) / 3.0 END")} AS pct_d
       |FROM d WHERE pct_k IS NOT NULL ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- ATR
  private def atrQ(s: SparkSession, dir: String): DataFrame =
    Indicators.atr(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), col("c"), n = 14)
      .filter(col("atr").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("atr")).as("atr"))
      .orderBy(col("event_type"), col("bus"))

  private val atrSql: String =
    s"""$hourlyOhlcCte, t AS (
       |  SELECT event_type, bus, h, l, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS pc
       |  FROM hourly
       |), tr AS (
       |  SELECT event_type, bus,
       |         CASE WHEN pc IS NULL THEN h - l
       |              ELSE greatest(h - l, abs(h - pc), abs(l - pc)) END AS tr
       |  FROM t
       |), w AS (
       |  SELECT event_type, bus,
       |         count(tr) OVER fr AS cnt,
       |         CAST(sum(tr) OVER fr AS BIGINT) AS st
       |  FROM tr
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("st / (100.0 * 14.0)")} AS atr
       |FROM w WHERE cnt >= 14 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------- Williams %R
  /** [[Indicators.williamsR]] (n = 14) over the hourly OHLC series —
    * the inverted stochastic %K on the same single keyed exchange.
    */
  private def williamsQ(s: SparkSession, dir: String): DataFrame =
    Indicators.williamsR(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), col("c"), n = 14)
      .filter(col("wr").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("wr")).as("wr"))
      .orderBy(col("event_type"), col("bus"))

  private val williamsSql: String =
    s"""$hourlyOhlcCte, w AS (
       |  SELECT event_type, bus, c,
       |         count(c) OVER fr AS cnt,
       |         min(l) OVER fr AS lo,
       |         max(h) OVER fr AS hi
       |  FROM hourly
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("CASE WHEN hi = lo THEN -50.0 " +
                       "ELSE -100.0 * (hi - c) / CAST(hi - lo AS DOUBLE) END")} AS wr
       |FROM w WHERE cnt >= 14 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- CCI
  /** [[Indicators.cci]] (n = 20) over the hourly OHLC series. The
    * frame-mean-dependent MAD means a bounded 20-element list fold
    * per row — integer throughout (D = Σ|n·tp3 − S|), one float
    * division, so both engines agree bit-for-bit.
    */
  private def cciQ(s: SparkSession, dir: String): DataFrame =
    Indicators.cci(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), col("c"), n = 20)
      .filter(col("cci").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("cci")).as("cci"))
      .orderBy(col("event_type"), col("bus"))

  private val cciSql: String =
    s"""$hourlyOhlcCte, w AS (
       |  SELECT event_type, bus, h + l + c AS tp3,
       |         count(*) OVER fr AS cnt,
       |         CAST(sum(h + l + c) OVER fr AS BIGINT) AS s,
       |         list(h + l + c) OVER fr AS arr
       |  FROM hourly
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
       |), dd AS (
       |  SELECT event_type, bus, tp3, cnt, s,
       |         CAST(list_sum(list_transform(arr, x -> abs(20 * x - s))) AS BIGINT) AS d
       |  FROM w
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("CASE WHEN d = 0 THEN 0.0 " +
                       "ELSE 200.0 * 20.0 * (20 * tp3 - s) / (3.0 * d) END")} AS cci
       |FROM dd WHERE cnt >= 20 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------- Aroon
  /** [[Indicators.aroon]] (n = 25) over the hourly OHLC series —
    * recency-of-extreme via the integer index-packing trick (no list
    * fold at all; max/min window extremes carry their own argmax).
    */
  private def aroonQ(s: SparkSession, dir: String): DataFrame =
    Indicators.aroon(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), n = 25)
      .filter(col("aroon_up").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("aroon_up")).as("aroon_up"),
        r4(col("aroon_down")).as("aroon_down"),
        r4(col("aroon_osc")).as("aroon_osc"))
      .orderBy(col("event_type"), col("bus"))

  private val aroonSql: String = {
    val up = "100.0 * (24 - dh) / 24.0"
    val dn = "100.0 * (24 - dl) / 24.0"
    s"""$hourlyOhlcCte, ix AS (
       |  SELECT event_type, bus, h, l,
       |         row_number() OVER (PARTITION BY event_type ORDER BY bus) - 1 AS idx
       |  FROM hourly
       |), w AS (
       |  SELECT event_type, bus, idx,
       |         count(*) OVER fr AS cnt,
       |         CAST(max(h * 1048576 + idx) OVER fr AS BIGINT) AS mh,
       |         CAST(min(l * 1048576 + (1048575 - idx)) OVER fr AS BIGINT) AS ml
       |  FROM ix
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
       |), d AS (
       |  SELECT event_type, bus, cnt,
       |         idx - (mh % 1048576) AS dh,
       |         idx - (1048575 - (ml % 1048576)) AS dl
       |  FROM w
       |)
       |SELECT event_type, bus,
       |       ${r4Sql(up)} AS aroon_up,
       |       ${r4Sql(dn)} AS aroon_down,
       |       ${r4Sql(s"($up) - ($dn)")} AS aroon_osc
       |FROM d WHERE cnt >= 25 ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------------- ADX
  /** [[Indicators.adx]] (n = 14) over the hourly OHLC series — DX on
    * exact integer ±DM sums (the ΣTR denominators cancel), ADX as the
    * 14-value ordered fold (the %D determinism discipline).
    */
  private def adxQ(s: SparkSession, dir: String): DataFrame =
    Indicators.adx(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), n = 14)
      .filter(col("adx").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("dx")).as("dx"), r4(col("adx")).as("adx"))
      .orderBy(col("event_type"), col("bus"))

  private val adxSql: String =
    s"""$hourlyOhlcCte, d AS (
       |  SELECT event_type, bus,
       |         h - lag(h) OVER w AS up,
       |         lag(l) OVER w - l AS dn
       |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY bus)
       |), dm AS (
       |  SELECT event_type, bus,
       |         CASE WHEN up IS NULL THEN NULL
       |              WHEN up > dn AND up > 0 THEN up ELSE 0 END AS pdm,
       |         CASE WHEN dn IS NULL THEN NULL
       |              WHEN dn > up AND dn > 0 THEN dn ELSE 0 END AS mdm
       |  FROM d
       |), s AS (
       |  SELECT event_type, bus,
       |         count(pdm) OVER fr AS nd,
       |         CAST(sum(pdm) OVER fr AS BIGINT) AS sp,
       |         CAST(sum(mdm) OVER fr AS BIGINT) AS sm
       |  FROM dm
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |), x AS (
       |  SELECT event_type, bus,
       |         CASE WHEN nd < 14 THEN NULL
       |              WHEN sp + sm = 0 THEN 0.0
       |              ELSE 100.0 * abs(sp - sm) / CAST(sp + sm AS DOUBLE) END AS dx
       |  FROM s
       |), f AS (
       |  SELECT event_type, bus, dx,
       |         list_filter(list(dx) OVER fr2, v -> v IS NOT NULL) AS ds
       |  FROM x
       |  WINDOW fr2 AS (PARTITION BY event_type ORDER BY bus
       |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus, ${r4Sql("dx")} AS dx,
       |       ${r4Sql("list_reduce(ds, (acc, v) -> acc + v) / 14.0")} AS adx
       |FROM f WHERE len(ds) = 14 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- Keltner channels
  /** [[Indicators.keltner]]: EMA(20) mid ± 2·ATR(10) over the hourly
    * OHLC series — the volatility envelope composing the two portable
    * kernels on one shared exchange.
    */
  private def keltnerQ(s: SparkSession, dir: String): DataFrame =
    Indicators.keltner(hourlyOhlc(s, dir), Seq(col("event_type")), col("bus"),
        col("h"), col("l"), col("c"), emaN = 20, atrN = 10, mult = 2.0d)
      .filter(col("atr").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("mid")).as("mid"), r4(col("upper")).as("upper"),
        r4(col("lower")).as("lower"))
      .orderBy(col("event_type"), col("bus"))

  private val keltnerSql: String =
    s"""$hourlyOhlcCte, base AS (
       |  SELECT event_type, bus, h, l, c,
       |         lag(c) OVER wk AS pc,
       |         list(CAST(c AS DOUBLE)) OVER fe AS cl
       |  FROM hourly
       |  WINDOW wk AS (PARTITION BY event_type ORDER BY bus),
       |         fe AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 39 PRECEDING AND CURRENT ROW)
       |), tr AS (
       |  SELECT event_type, bus, cl,
       |         CASE WHEN pc IS NULL THEN h - l
       |              ELSE greatest(h - l, abs(h - pc), abs(l - pc)) END AS tr
       |  FROM base
       |), w AS (
       |  SELECT event_type, bus, cl,
       |         count(tr) OVER fr AS cnt,
       |         CAST(sum(tr) OVER fr AS BIGINT) AS st
       |  FROM tr
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
       |), e AS (
       |  SELECT event_type, bus, cnt, st,
       |         list_reduce(cl, (acc, x) ->
       |           (2.0/21.0) * x + (1.0 - 2.0/21.0) * acc) / 100.0 AS ema
       |  FROM w
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("ema")} AS mid,
       |       ${r4Sql("ema + 2.0 * (st / (100.0 * 10.0))")} AS upper,
       |       ${r4Sql("ema - 2.0 * (st / (100.0 * 10.0))")} AS lower
       |FROM e WHERE cnt >= 10 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------- Ichimoku
  /** [[Indicators.ichimoku]] over the hourly OHLC series, standard
    * (9, 26, 52) periods; output restricted to fully-defined cloud
    * rows (complete 52-lookback at the −26 displacement AND a +26
    * forward close for chikou).
    */
  private def ichimokuQ(s: SparkSession, dir: String): DataFrame =
    Indicators.ichimoku(hourlyOhlc(s, dir), Seq(col("event_type")), col("bus"),
        col("h"), col("l"), col("c"))
      .filter(col("senkou_b").isNotNull && col("chikou").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("tenkan")).as("tenkan"), r4(col("kijun")).as("kijun"),
        r4(col("senkou_a")).as("senkou_a"), r4(col("senkou_b")).as("senkou_b"),
        r4(col("chikou")).as("chikou"))
      .orderBy(col("event_type"), col("bus"))

  private val ichimokuSql: String =
    s"""$hourlyOhlcCte, m AS (
       |  SELECT event_type, bus, c,
       |         CASE WHEN count(c) OVER f9 >= 9
       |              THEN CAST(max(h) OVER f9 + min(l) OVER f9 AS DOUBLE) / 2.0 / 100.0 END AS tenkan,
       |         CASE WHEN count(c) OVER f26 >= 26
       |              THEN CAST(max(h) OVER f26 + min(l) OVER f26 AS DOUBLE) / 2.0 / 100.0 END AS kijun,
       |         CASE WHEN count(c) OVER f52 >= 52
       |              THEN CAST(max(h) OVER f52 + min(l) OVER f52 AS DOUBLE) / 2.0 / 100.0 END AS sb0
       |  FROM hourly
       |  WINDOW f9 AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
       |         f26 AS (PARTITION BY event_type ORDER BY bus
       |                 ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
       |         f52 AS (PARTITION BY event_type ORDER BY bus
       |                 ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
       |), sh AS (
       |  SELECT event_type, bus, tenkan, kijun,
       |         lag((tenkan + kijun) / 2.0, 26) OVER wk AS senkou_a,
       |         lag(sb0, 26) OVER wk AS senkou_b,
       |         CAST(lead(c, 26) OVER wk AS DOUBLE) / 100.0 AS chikou
       |  FROM m WINDOW wk AS (PARTITION BY event_type ORDER BY bus)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("tenkan")} AS tenkan, ${r4Sql("kijun")} AS kijun,
       |       ${r4Sql("senkou_a")} AS senkou_a, ${r4Sql("senkou_b")} AS senkou_b,
       |       ${r4Sql("chikou")} AS chikou
       |FROM sh WHERE senkou_b IS NOT NULL AND chikou IS NOT NULL
       |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ MACD
  private def macdQ(s: SparkSession, dir: String): DataFrame =
    Indicators.macd(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"), window = 64)
      .select(col("event_type"), col("bus"), r4(col("macd")).as("macd"),
        r4(col("signal")).as("signal"), r4(col("hist")).as("hist"))
      .orderBy(col("event_type"), col("bus"))

  private val macdSql: String = {
    def foldSql(l: String, num: Int, den: Int): String =
      s"list_reduce($l, (acc, x) -> ($num.0/$den.0) * x + (1.0 - $num.0/$den.0) * acc)"
    s"""$hourlyCte, arr AS (
       |  SELECT event_type, bus,
       |         list(CAST(c AS DOUBLE)) OVER (
       |           PARTITION BY event_type ORDER BY bus
       |           ROWS BETWEEN 63 PRECEDING AND CURRENT ROW) AS l
       |  FROM hourly
       |), m AS (
       |  SELECT event_type, bus,
       |         (${foldSql("l", 2, 13)} - ${foldSql("l", 2, 27)}) / 100.0 AS macd
       |  FROM arr
       |), sm AS (
       |  SELECT event_type, bus, macd,
       |         list(macd) OVER (
       |           PARTITION BY event_type ORDER BY bus
       |           ROWS BETWEEN 39 PRECEDING AND CURRENT ROW) AS ml
       |  FROM m
       |)
       |SELECT event_type, bus, ${r4Sql("macd")} AS macd,
       |       ${r4Sql(foldSql("ml", 2, 10))} AS signal,
       |       ${r4Sql(s"macd - ${foldSql("ml", 2, 10)}")} AS hist
       |FROM sm ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------- rolling correlation
  /** [[Indicators.rollingCorr]] between the click and view hourly
    * close series — the pairs-trading primitive, keyed by the symbol
    * pair so it generalizes to many pairs under one window exchange.
    */
  private def rollingCorrQ(s: SparkSession, dir: String): DataFrame = {
    // both series in ONE scan: conditional aggregation pivots the two
    // event types into columns per bucket (a filter+self-join form
    // reads the events table twice, ExplainAudit)
    val both = hourly(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("bus"))
      .agg(
        max(when(col("event_type") === "click", col("c"))).as("x"),
        max(when(col("event_type") === "view", col("c"))).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .withColumn("pair", lit("click_view"))
    Indicators.rollingCorr(both,
        Seq(col("pair")), col("bus"), col("x"), col("y"), n = 20)
      .filter(col("corr").isNotNull)
      .select(col("pair"), col("bus"), r4(col("corr")).as("corr"))
      .orderBy(col("bus"))
  }

  private val rollingCorrSql: String =
    s"""$hourlyCte, x AS (
       |  SELECT bus, c AS x FROM hourly WHERE event_type = 'click'
       |), y AS (
       |  SELECT bus, c AS y FROM hourly WHERE event_type = 'view'
       |), j AS (SELECT bus, x, y FROM x JOIN y USING (bus)),
       |w AS (
       |  SELECT bus,
       |         count(x) OVER fr AS cnt,
       |         CAST(sum(x) OVER fr AS BIGINT) AS sx,
       |         CAST(sum(y) OVER fr AS BIGINT) AS sy,
       |         CAST(sum(x * y) OVER fr AS BIGINT) AS sxy,
       |         CAST(sum(x * x) OVER fr AS BIGINT) AS sx2,
       |         CAST(sum(y * y) OVER fr AS BIGINT) AS sy2
       |  FROM j
       |  WINDOW fr AS (ORDER BY bus ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
       |)
       |SELECT 'click_view' AS pair, bus,
       |       ${r4Sql("CAST(20 * sxy - sx * sy AS DOUBLE) / " +
                       "sqrt(CAST(20 * sx2 - sx * sx AS DOUBLE) * " +
                            "CAST(20 * sy2 - sy * sy AS DOUBLE))")} AS corr
       |FROM w
       |WHERE cnt >= 20 AND 20 * sx2 - sx * sx <> 0 AND 20 * sy2 - sy * sy <> 0
       |ORDER BY bus""".stripMargin

  // ------------------------------------------- Parkinson volatility
  /** [[Indicators.parkinson]] over the hourly OHLC candles, n = 20. */
  private def parkinsonQ(s: SparkSession, dir: String): DataFrame =
    Indicators.parkinson(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), n = 20)
      .filter(col("parkinson").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("parkinson")).as("parkinson"))
      .orderBy(col("event_type"), col("bus"))

  private val parkinsonSql: String =
    s"""$hourlyOhlcCte, q AS (
       |  SELECT event_type, bus,
       |         CASE WHEN l > 0 THEN CAST(floor(
       |           ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)) * 1000000.0 + 0.5)
       |           AS BIGINT) END AS q
       |  FROM hourly
       |), w AS (
       |  SELECT event_type, bus,
       |         count(q * q) OVER fr AS cnt,
       |         CAST(sum(q * q) OVER fr AS BIGINT) AS sq
       |  FROM q
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("sqrt(sq / (4.0 * 20.0 * ln(2.0) * 1000000000000.0))")} AS parkinson
       |FROM w WHERE cnt >= 20 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- OBV
  /** [[Indicators.obv]] over hourly closes with the hourly `props.k`
    * quantity. The qty frame joins the close frame on (event_type,
    * bus) — both sides already clustered by the [[byKey]] partition,
    * so the join adds no exchange. No-op rounding: the output is an
    * exact integer.
    */
  private def obvQ(s: SparkSession, dir: String): DataFrame = {
    // Same one-scan fusion as [[hourlyOhlcQty]]: the close dedup and
    // the raw-row volume sum share the per-(event_type, ts) stage,
    // replacing the former two-scan + left-join plan (sum(k) is a
    // long — per-ts then per-bucket partial sums are exact, so the
    // fused total equals the old branch bit-for-bit).
    val schema = StructType(Seq(StructField("k", LongType)))
    val pxQty = Tables.eventSeriesOverWith(
        byKey(Tables.events(s, dir))
          .withColumn("k", from_json(col("props"), schema).getField("k")),
        sum(col("k")).as("ksum"))
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        (expr("tus div 3600000000") * 3600000000L).as("bus"))
      .agg(cents(max_by(col("value"), col("tus"))).as("c"),
        coalesce(sum(col("ksum")), lit(0L)).as("qty"))
    Indicators.obv(pxQty,
        Seq(col("event_type")), col("bus"), col("c"), col("qty"))
      .select(col("event_type"), col("bus"), col("obv"))
      .orderBy(col("event_type"), col("bus"))
  }

  private val obvSql: String =
    s"""$hourlyCte, q AS (
       |  SELECT event_type,
       |         ((epoch_ns(ts) // 1000) // 3600000000) * 3600000000 AS bus,
       |         CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS qty
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2
       |), j AS (
       |  SELECT event_type, bus, c, coalesce(qty, 0) AS qty
       |  FROM hourly LEFT JOIN q USING (event_type, bus)
       |), d AS (
       |  SELECT event_type, bus,
       |         CASE WHEN c - lag(c) OVER w > 0 THEN qty
       |              WHEN c - lag(c) OVER w < 0 THEN -qty
       |              ELSE 0 END AS signed
       |  FROM j
       |  WINDOW w AS (PARTITION BY event_type ORDER BY bus)
       |)
       |SELECT event_type, bus,
       |       CAST(sum(signed) OVER (PARTITION BY event_type ORDER BY bus
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
       |FROM d ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ VWAP
  /** Hourly VWAP weighted by the `props.k` quantity — the
    * Σ(price·qty)/Σqty bucket aggregate of the reference's candle
    * volume path, with the JSON payload projected through a declared
    * schema (same discipline as `ts_json_extract`).
    */
  private def vwapQ(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    // fanOut + Generate barrier: per-row from_json over the
    // single-row-group events scan ran in ONE task (GenFilterScan
    // round 14c, 524 ms) — and the isNotNull filter on the computed
    // column is PUSHED back through the repartition to the scan, so
    // the fan alone does not help; the single-element explode blocks
    // predicate pushdown (the editNearDups barrier idiom).
    val ev = Tables.fanOut(Tables.events(s, dir))
      .withColumn("k",
        explode(array(from_json(col("props"), schema).getField("k"))))
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

  // -------------------------------------------- Donchian channels
  /** [[Indicators.donchian]] (n = 20): integer window extremes + one
    * dyadic halving — no fold anywhere.
    */
  private def donchianQ(s: SparkSession, dir: String): DataFrame =
    Indicators.donchian(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), n = 20)
      .filter(col("upper").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("upper")).as("upper"), r4(col("lower")).as("lower"),
        r4(col("mid")).as("mid"))
      .orderBy(col("event_type"), col("bus"))

  private val donchianSql: String =
    s"""$hourlyOhlcCte, w AS (
       |  SELECT event_type, bus,
       |         count(c) OVER fr AS cnt,
       |         max(h) OVER fr AS hi,
       |         min(l) OVER fr AS lo
       |  FROM hourly
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("CAST(hi AS DOUBLE) / 100.0")} AS upper,
       |       ${r4Sql("CAST(lo AS DOUBLE) / 100.0")} AS lower,
       |       ${r4Sql("CAST(hi + lo AS DOUBLE) / 2.0 / 100.0")} AS mid
       |FROM w WHERE cnt >= 20 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------- ROC / momentum
  /** [[Indicators.roc]] (n = 12): integer momentum rides beside the
    * single-division percent change.
    */
  private def rocQ(s: SparkSession, dir: String): DataFrame =
    Indicators.roc(hourly(s, dir), Seq(col("event_type")),
        col("bus"), col("c"), n = 12)
      .filter(col("momentum").isNotNull)
      .select(col("event_type"), col("bus"), col("momentum"),
        r4(col("roc")).as("roc"))
      .orderBy(col("event_type"), col("bus"))

  private val rocSql: String =
    s"""$hourlyCte, b AS (
       |  SELECT event_type, bus, c,
       |         lag(c, 12) OVER (PARTITION BY event_type ORDER BY bus) AS back
       |  FROM hourly
       |)
       |SELECT event_type, bus,
       |       CAST(c - back AS BIGINT) AS momentum,
       |       ${r4Sql("CASE WHEN back > 0 " +
                       "THEN 100.0 * (c - back) / CAST(back AS DOUBLE) END")} AS roc
       |FROM b WHERE back IS NOT NULL ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ TRIX
  /** [[Indicators.trix]] (n = 15 → α = 2/16, an exactly-dyadic
    * smoothing constant): three composed window-list EMA folds, then
    * the 1-period percent change.
    */
  private def trixQ(s: SparkSession, dir: String): DataFrame =
    Indicators.trix(hourly(s, dir), Seq(col("event_type")),
        col("bus"), col("c"), n = 15)
      .filter(col("trix").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("trix")).as("trix"))
      .orderBy(col("event_type"), col("bus"))

  private val trixSql: String = {
    val fold = "(acc, x) -> (2.0/16.0) * x + (1.0 - 2.0/16.0) * acc"
    s"""$hourlyCte, a1 AS (
       |  SELECT event_type, bus,
       |         list_reduce(list(CAST(c AS DOUBLE)) OVER fr, $fold) AS e1
       |  FROM hourly
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 39 PRECEDING AND CURRENT ROW)
       |), a2 AS (
       |  SELECT event_type, bus,
       |         list_reduce(list(e1) OVER fr, $fold) AS e2
       |  FROM a1
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 39 PRECEDING AND CURRENT ROW)
       |), a3 AS (
       |  SELECT event_type, bus,
       |         list_reduce(list(e2) OVER fr, $fold) AS e3
       |  FROM a2
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 39 PRECEDING AND CURRENT ROW)
       |), lg AS (
       |  SELECT event_type, bus, e3,
       |         lag(e3) OVER (PARTITION BY event_type ORDER BY bus) AS pe
       |  FROM a3
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("100.0 * (e3 - pe) / pe")} AS trix
       |FROM lg WHERE pe IS NOT NULL AND pe <> 0 ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------- Vortex
  /** [[Indicators.vortex]] (n = 14): ΣVM± / ΣTR on exact integer
    * sums, two divisions; zero-TR frame pins both VIs to 1.
    */
  private def vortexQ(s: SparkSession, dir: String): DataFrame =
    Indicators.vortex(hourlyOhlc(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), col("c"), n = 14)
      .filter(col("vi_plus").isNotNull)
      .select(col("event_type"), col("bus"),
        r4(col("vi_plus")).as("vi_plus"), r4(col("vi_minus")).as("vi_minus"))
      .orderBy(col("event_type"), col("bus"))

  private val vortexSql: String =
    s"""$hourlyOhlcCte, d AS (
       |  SELECT event_type, bus, h, l, c,
       |         lag(h) OVER w AS ph, lag(l) OVER w AS pl, lag(c) OVER w AS pc
       |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY bus)
       |), t AS (
       |  SELECT event_type, bus,
       |         CASE WHEN pl IS NOT NULL THEN abs(h - pl) END AS vp,
       |         CASE WHEN ph IS NOT NULL THEN abs(l - ph) END AS vm,
       |         CASE WHEN pc IS NOT NULL
       |              THEN greatest(h - l, abs(h - pc), abs(l - pc)) END AS tr
       |  FROM d
       |), w2 AS (
       |  SELECT event_type, bus,
       |         count(tr) OVER fr AS nd,
       |         CAST(sum(vp) OVER fr AS BIGINT) AS sp,
       |         CAST(sum(vm) OVER fr AS BIGINT) AS sm,
       |         CAST(sum(tr) OVER fr AS BIGINT) AS st
       |  FROM t
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("CASE WHEN st = 0 THEN 1.0 " +
                       "ELSE sp / CAST(st AS DOUBLE) END")} AS vi_plus,
       |       ${r4Sql("CASE WHEN st = 0 THEN 1.0 " +
                       "ELSE sm / CAST(st AS DOUBLE) END")} AS vi_minus
       |FROM w2 WHERE nd >= 14 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------- hourly OHLC + volume
  /** [[hourlyOhlc]] joined with the hourly `props.k` volume (the
    * [[obvQ]] quantity path) — both sides clustered by [[byKey]], so
    * the join adds no exchange; missing volume coalesces to 0.
    */
  private[graft] def hourlyOhlcQty(s: SparkSession, dir: String): DataFrame = {
    // ONE scan, ONE exchange, NO join: the per-(event_type, ts) dedup
    // stage that [[Tables.eventSeriesOver]] runs for the OHLC side
    // also sums the RAW rows' props.k (the volume side sums over all
    // events, not the deduped series — sum(k) per ts then per bucket
    // is the same exact long total as the old separate branch), so
    // the former two-scan + left-join plan collapses. The oracle CTE
    // keeps the two-branch form — identical rows certify the fusion.
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.eventSeriesOverWith(
        byKey(Tables.events(s, dir))
          .withColumn("k", from_json(col("props"), schema).getField("k")),
        sum(col("k")).as("ksum"))
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        (expr("tus div 3600000000") * 3600000000L).as("bus"))
      .agg(
        cents(max(col("value"))).as("h"),
        cents(min(col("value"))).as("l"),
        cents(max_by(col("value"), col("tus"))).as("c"),
        coalesce(sum(col("ksum")), lit(0L)).as("qty"))
  }

  private val hourlyOhlcQtyCte: String =
    s"""$hourlyOhlcCte, q AS (
       |  SELECT event_type,
       |         ((epoch_ns(ts) // 1000) // 3600000000) * 3600000000 AS bus,
       |         CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS qty
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2
       |), hq AS (
       |  SELECT event_type, bus, h, l, c, coalesce(qty, 0) AS qty
       |  FROM hourly LEFT JOIN q USING (event_type, bus)
       |)""".stripMargin

  // ------------------------------------------------------------- MFI
  /** [[Indicators.mfi]] (n = 14) over hourly OHLC + volume — the
    * volume-weighted RSI on exact integer money-flow sums.
    */
  private def mfiQ(s: SparkSession, dir: String): DataFrame =
    Indicators.mfi(hourlyOhlcQty(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), col("c"), col("qty"), n = 14)
      .filter(col("mfi").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("mfi")).as("mfi"))
      .orderBy(col("event_type"), col("bus"))

  private val mfiSql: String =
    s"""$hourlyOhlcQtyCte, d AS (
       |  SELECT event_type, bus, h + l + c AS tp3, qty,
       |         h + l + c - lag(h + l + c) OVER w AS dd
       |  FROM hq WINDOW w AS (PARTITION BY event_type ORDER BY bus)
       |), mf AS (
       |  SELECT event_type, bus,
       |         CASE WHEN dd IS NULL THEN NULL
       |              WHEN dd > 0 THEN tp3 * qty ELSE 0 END AS pmf,
       |         CASE WHEN dd IS NULL THEN NULL
       |              WHEN dd < 0 THEN tp3 * qty ELSE 0 END AS nmf
       |  FROM d
       |), w2 AS (
       |  SELECT event_type, bus,
       |         count(pmf) OVER fr AS nd,
       |         CAST(sum(pmf) OVER fr AS BIGINT) AS sp,
       |         CAST(sum(nmf) OVER fr AS BIGINT) AS sn
       |  FROM mf
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("CASE WHEN sp + sn = 0 THEN 50.0 " +
                       "ELSE 100.0 * sp / CAST(sp + sn AS DOUBLE) END")} AS mfi
       |FROM w2 WHERE nd >= 14 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- CMF
  /** [[Indicators.chaikinMoneyFlow]] (n = 20) over hourly OHLC +
    * volume — the money-flow multiplier quantized once to exact
    * micro-units so the window sums stay integer.
    */
  private def cmfQ(s: SparkSession, dir: String): DataFrame =
    Indicators.chaikinMoneyFlow(hourlyOhlcQty(s, dir), Seq(col("event_type")),
        col("bus"), col("h"), col("l"), col("c"), col("qty"), n = 20)
      .filter(col("cmf").isNotNull)
      .select(col("event_type"), col("bus"), r4(col("cmf")).as("cmf"))
      .orderBy(col("event_type"), col("bus"))

  private val cmfSql: String =
    s"""$hourlyOhlcQtyCte, m AS (
       |  SELECT event_type, bus, qty,
       |         CASE WHEN h = l THEN 0
       |              ELSE CAST(floor((2 * c - h - l) / CAST(h - l AS DOUBLE)
       |                              * 1000000.0 + 0.5) AS BIGINT) END AS mq
       |  FROM hq
       |), w2 AS (
       |  SELECT event_type, bus,
       |         count(mq) OVER fr AS cnt,
       |         CAST(sum(mq * qty) OVER fr AS BIGINT) AS sq,
       |         CAST(sum(qty) OVER fr AS BIGINT) AS sv
       |  FROM m
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("sq / (1000000.0 * sv)")} AS cmf
       |FROM w2 WHERE cnt >= 20 AND sv <> 0 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ beta
  /** Systematic-risk beta of each series vs the equal-weight market
    * composite: β_i = cov(cᵢ, m)/var(m) over the hours where the full
    * panel is present (m = the cross-sectional SUM of closes — a
    * positive scaling of the equal-weight index that keeps every
    * moment an exact BIGINT; β is scale-invariant in m up to the one
    * final division). Covariance is shift-invariant, so both sides are
    * first shifted by exact integer minima (per-series min c, global
    * min m) — the moment products carry price RANGES, not levels —
    * and the final n·Σcm − Σc·Σm / n·Σmm − Σm² combination runs in
    * exact 38-digit decimal (Spark) ↔ HUGEINT (DuckDB): a multi-year
    * panel's n·Σmm clears 2⁶³ even after shifting, and Spark's
    * wrapping BIGINT multiply would silently diverge from DuckDB's
    * auto-promoted 128-bit sums instead of erroring. Both engines
    * round the same exact integer to the nearest double once, at the
    * division. The per-row moment products are cast to decimal BEFORE
    * the SUM (and to HUGEINT on the DuckDB side): a single product
    * fits BIGINT, but the accumulated Σ(dc·dm)/Σ(dm·dm) clears 2⁶³
    * once n × range_c × range_m does — plausible for multi-year
    * panels since dm is a cross-sectional SUM of closes — and Spark's
    * BIGINT sum wraps silently where DuckDB auto-promotes to 128-bit.
    * Decimal(38) overflow yields null, never a wrong number. The
    * full-panel filter (hours whose series count equals the panel's)
    * is data-derived the same way on both sides.
    */
  private def betaQ(s: SparkSession, dir: String): DataFrame = {
    // same plan surgery as rollingBetaQ: checkpoint hourly before the
    // broadcast fan-out (each broadcast side re-executed the events
    // scan + hourly aggregation) and collect the two one-row scalars
    // to literals
    val h = hourly(s, dir).localCheckpoint(true)
    val k = h.select(countDistinct(col("event_type"))).head.getLong(0)
    val market = h.groupBy(col("bus"))
      .agg(sum(col("c")).as("m"), count(lit(1)).as("__cnt"))
      .filter(col("__cnt") === k)
      .select(col("bus"), col("m"))
    val mMinRow = market.agg(min(col("m"))).head()
    val mMin = if (mMinRow.isNullAt(0)) 0L else mMinRow.getLong(0)
    val cMin = h.groupBy(col("event_type")).agg(min(col("c")).as("__cmin"))
    h.join(broadcast(market), "bus")
      .join(broadcast(cMin), "event_type")
      .select(col("event_type"),
        (col("c") - col("__cmin")).as("dc"), (col("m") - lit(mMin)).as("dm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("dc")).as("__sc"), sum(col("dm")).as("__sm"),
        sum(col("dc").cast("decimal(19,0)") * col("dm").cast("decimal(19,0)"))
          .as("__scm"),
        sum(col("dm").cast("decimal(19,0)") * col("dm").cast("decimal(19,0)"))
          .as("__smm"))
      .select(col("event_type"), col("n"),
        r4(((col("n").cast("decimal(10,0)") * col("__scm")
              - col("__sc").cast("decimal(19,0)") * col("__sm").cast("decimal(19,0)"))
            .cast("double")) /
          ((col("n").cast("decimal(10,0)") * col("__smm")
              - col("__sm").cast("decimal(19,0)") * col("__sm").cast("decimal(19,0)"))
            .cast("double")))
          .as("beta"))
      .orderBy(col("event_type"))
  }

  private val betaSql: String =
    s"""$hourlyCte, k AS (
       |  SELECT count(DISTINCT event_type) AS k FROM hourly
       |), mkt AS (
       |  SELECT bus, CAST(sum(c) AS BIGINT) AS m
       |  FROM hourly, k GROUP BY bus, k.k HAVING count(*) = k.k
       |), mm AS (SELECT min(m) AS mmin FROM mkt),
       |cm AS (SELECT event_type, min(c) AS cmin FROM hourly GROUP BY 1),
       |d AS (
       |  SELECT h.event_type,
       |         CAST(h.c - cm.cmin AS BIGINT) AS dc,
       |         CAST(m.m - mm.mmin AS BIGINT) AS dm
       |  FROM hourly h JOIN mkt m USING (bus)
       |       JOIN cm ON cm.event_type = h.event_type, mm
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |       ${r4Sql("CAST(CAST(count(*) AS HUGEINT) * sum(CAST(dc AS HUGEINT) * dm)" +
                       " - sum(dc) * sum(dm) AS DOUBLE)" +
                       " / CAST(CAST(count(*) AS HUGEINT) * sum(CAST(dm AS HUGEINT) * dm)" +
                       " - sum(dm) * sum(dm) AS DOUBLE)")} AS beta
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- mean-reversion half-life
  /** AR(1) mean-reversion half-life per series: regress c_t on
    * c_{t−1} (OLS slope φ over minima-shifted exact integer moments —
    * shift-invariant, the [[betaQ]] scheme with the lag pair as the
    * two variables), then half-life = −ln 2 / ln φ for 0 < φ < 1
    * (a random-walk-or-trending series, φ ≥ 1, and an oscillating
    * one, φ ≤ 0, have no mean-reversion half-life → null). The only
    * float steps are the final division and the two lns, r4'd; the
    * moment combination runs in the same wide-decimal ↔ HUGEINT form
    * as [[betaQ]] (n·Σxx clears 2⁶³ on multi-year series).
    */
  private def halfLifeQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val h = hourly(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull)
    val cMin = h.groupBy(col("event_type")).agg(
      least(min(col("c")), min(col("__p"))).as("__cmin"))
    val moments = h.join(broadcast(cMin), "event_type")
      .select(col("event_type"),
        (col("c") - col("__cmin")).as("y"), (col("__p") - col("__cmin")).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .as("__sxy"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
          .as("__sxx"))
    val phi =
      ((col("n").cast("decimal(10,0)") * col("__sxy")
          - col("__sx").cast("decimal(19,0)") * col("__sy").cast("decimal(19,0)"))
        .cast("double")) /
      ((col("n").cast("decimal(10,0)") * col("__sxx")
          - col("__sx").cast("decimal(19,0)") * col("__sx").cast("decimal(19,0)"))
        .cast("double"))
    moments
      .withColumn("__phi", phi)
      .select(col("event_type"), col("n"), r4(col("__phi")).as("phi"),
        r4(when(col("__phi") > 0.0d && col("__phi") < 1.0d,
          -log(lit(2.0d)) / log(col("__phi")))).as("half_life_hours"))
      .orderBy(col("event_type"))
  }

  private val halfLifeSql: String =
    s"""$hourlyCte, r AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hourly
       |), f AS (SELECT event_type, c, p FROM r WHERE p IS NOT NULL),
       |cm AS (
       |  SELECT event_type, least(min(c), min(p)) AS cmin FROM f GROUP BY 1
       |), d AS (
       |  SELECT f.event_type,
       |         CAST(f.c - cm.cmin AS BIGINT) AS y,
       |         CAST(f.p - cm.cmin AS BIGINT) AS x
       |  FROM f JOIN cm USING (event_type)
       |), mo AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         CAST(CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
       |              - sum(x) * sum(y) AS DOUBLE)
       |           / CAST(CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
       |              - sum(x) * sum(x) AS DOUBLE) AS phi
       |  FROM d GROUP BY 1
       |)
       |SELECT event_type, n, ${r4Sql("phi")} AS phi,
       |       ${r4Sql("CASE WHEN phi > 0 AND phi < 1" +
                       " THEN -ln(2.0) / ln(phi) END")} AS half_life_hours
       |FROM mo ORDER BY 1""".stripMargin

  // ---------------------------------------------------- rolling beta
  /** Time-varying systematic risk: [[betaQ]]'s OLS moments inside a
    * trailing 24-hour window, one beta per (series, hour) once the
    * window is full. Same exactness scheme — minima-shifted integer
    * values (ranges, not levels), window moment sums and the
    * n·Σcm − Σc·Σm / n·Σmm − Σm² combination in exact wide decimal
    * (dm is a cross-sectional SUM of closes, so even a 24-row
    * Σ(dm·dm) can clear 2⁶³ on a wide panel — BIGINT would wrap
    * silently where DuckDB promotes to HUGEINT), one final double
    * division, r4. Degenerate windows
    * (flat market, var = 0) emit null. One bus-keyed panel aggregate
    * + one keyed window pass.
    */
  private def rollingBetaQ(s: SparkSession, dir: String): DataFrame = {
    // checkpoint-before-broadcast-fanout: four broadcast sides
    // (nSeries, market, cMin, mMin) each re-execute their whole
    // subtree, so without the barrier the events scan + hourly
    // aggregation runs five times (IncDedupProbe4: 4 extra 32-task
    // jobs, ~0.7 s CPU each; 1.9 -> 1.1 s wall)
    val h = hourly(s, dir).localCheckpoint(true)
    // scalar prefilters collected on the driver: the series count and
    // the market min are ONE-row aggregation results (metadata-sized;
    // the aggregations computing them stay distributed over the
    // checkpoint) — as literals they cost nothing, where as broadcast
    // subqueries each carried its own plan + build job
    val k = h.select(countDistinct(col("event_type"))).head.getLong(0)
    val market = h.groupBy(col("bus"))
      .agg(sum(col("c")).as("m"), count(lit(1)).as("__cnt"))
      .filter(col("__cnt") === k)
      .select(col("bus"), col("m"))
    // a fixture too small for any full-panel hour leaves market empty
    // (min = null); the join below is then empty regardless, so 0 is a
    // safe stand-in rather than a driver crash
    val mMinRow = market.agg(min(col("m"))).head()
    val mMin = if (mMinRow.isNullAt(0)) 0L else mMinRow.getLong(0)
    val cMin = h.groupBy(col("event_type")).agg(min(col("c")).as("__cmin"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
      .rowsBetween(-23, 0)
    h.join(broadcast(market), "bus")
      .join(broadcast(cMin), "event_type")
      .select(col("event_type"), col("bus"),
        (col("c") - col("__cmin")).as("dc"), (col("m") - lit(mMin)).as("dm"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sc", sum(col("dc")).over(w))
      .withColumn("__sm", sum(col("dm")).over(w))
      .withColumn("__scm",
        sum(col("dc").cast("decimal(19,0)") * col("dm").cast("decimal(19,0)"))
          .over(w))
      .withColumn("__smm",
        sum(col("dm").cast("decimal(19,0)") * col("dm").cast("decimal(19,0)"))
          .over(w))
      .filter(col("__n") === 24L)
      .withColumn("__den",
        col("__n").cast("decimal(10,0)") * col("__smm")
          - col("__sm").cast("decimal(19,0)") * col("__sm").cast("decimal(19,0)"))
      .select(col("event_type"), col("bus"),
        r4(when(col("__den") =!= lit(0),
          (col("__n").cast("decimal(10,0)") * col("__scm")
            - col("__sc").cast("decimal(19,0)") * col("__sm").cast("decimal(19,0)"))
            .cast("double") /
            col("__den").cast("double"))).as("beta24"))
      .orderBy(col("event_type"), col("bus"))
  }

  private val rollingBetaSql: String =
    s"""$hourlyCte, k AS (
       |  SELECT count(DISTINCT event_type) AS k FROM hourly
       |), mkt AS (
       |  SELECT bus, CAST(sum(c) AS BIGINT) AS m
       |  FROM hourly, k GROUP BY bus, k.k HAVING count(*) = k.k
       |), mm AS (SELECT min(m) AS mmin FROM mkt),
       |cm AS (SELECT event_type, min(c) AS cmin FROM hourly GROUP BY 1),
       |d AS (
       |  SELECT h.event_type, h.bus,
       |         CAST(h.c - cm.cmin AS BIGINT) AS dc,
       |         CAST(m.m - mm.mmin AS BIGINT) AS dm
       |  FROM hourly h JOIN mkt m USING (bus)
       |       JOIN cm ON cm.event_type = h.event_type, mm
       |), mo AS (
       |  SELECT event_type, bus,
       |         CAST(count(*) OVER w AS BIGINT) AS n,
       |         CAST(sum(dc) OVER w AS BIGINT) AS sc,
       |         CAST(sum(dm) OVER w AS BIGINT) AS sm,
       |         sum(CAST(dc AS HUGEINT) * dm) OVER w AS scm,
       |         sum(CAST(dm AS HUGEINT) * dm) OVER w AS smm
       |  FROM d
       |  WINDOW w AS (PARTITION BY event_type ORDER BY bus
       |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, bus,
       |       ${r4Sql("CASE WHEN n * smm - CAST(sm AS HUGEINT) * sm <> 0" +
                       " THEN CAST(n * scm - CAST(sc AS HUGEINT) * sm AS DOUBLE)" +
                       " / CAST(n * smm - CAST(sm AS HUGEINT) * sm AS DOUBLE) END")} AS beta24
       |FROM mo WHERE n = 24 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------- VaR / ES
  /** Historical 95% Value-at-Risk and Expected Shortfall per series —
    * the tail-risk pair a monitoring desk reads off a return
    * distribution. Returns are hourly log-returns quantized ONCE to
    * integer micro-nats (the NgramLm discipline), so the order
    * statistic is an exact integer-index pick (k = (n−1)·5 div 100
    * + 1 on the (q, bus)-ranked returns — no interpolation, no
    * engine convention), and the tail mean (all returns ≤ the VaR
    * value, boundary ties included by exact integer compare) is an
    * exact BIGINT sum with one final division. One keyed window pass
    * + one broadcast-joined tail aggregate.
    */
  private def varEsQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val ret = hourly(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull && col("__p") > 0L && col("c") > 0L)
      .withColumn("q", floor(
        log(col("c").cast("double") / col("__p").cast("double"))
          * lit(1000000.0d)).cast("long"))
    val ranked = ret
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("q"), col("bus"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val cut = ranked
      .filter(col("rn") === expr("((n - 1) * 5) div 100 + 1"))
      .select(col("event_type"), col("q").as("vq"), col("n"))
    ret.join(broadcast(cut), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_ret"),
        r4(first(col("vq")) / lit(1000000.0d)).as("var95"),
        r4(sum(when(col("q") <= col("vq"), col("q"))) /
          (count(when(col("q") <= col("vq"), 1)) * lit(1000000.0d))).as("es95"),
        count(when(col("q") <= col("vq"), 1)).as("n_tail"))
      .orderBy(col("event_type"))
  }

  private val varEsSql: String =
    s"""$hourlyCte, r AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hourly
       |), qr AS (
       |  SELECT event_type, bus,
       |         CAST(floor(ln(c / CAST(p AS DOUBLE)) * 1000000.0) AS BIGINT) AS q
       |  FROM r WHERE p IS NOT NULL AND p > 0 AND c > 0
       |), rk AS (
       |  SELECT event_type, bus, q,
       |         row_number() OVER (PARTITION BY event_type ORDER BY q, bus) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM qr
       |), cut AS (
       |  SELECT event_type, q AS vq, n FROM rk
       |  WHERE rn = ((n - 1) * 5) // 100 + 1
       |)
       |SELECT qr.event_type, CAST(any_value(cut.n) AS BIGINT) AS n_ret,
       |       ${r4Sql("any_value(vq) / 1000000.0")} AS var95,
       |       ${r4Sql("CAST(sum(CASE WHEN qr.q <= vq THEN qr.q END) AS BIGINT)" +
                       " / (count(CASE WHEN qr.q <= vq THEN 1 END) * 1000000.0)")} AS es95,
       |       CAST(count(CASE WHEN qr.q <= vq THEN 1 END) AS BIGINT) AS n_tail
       |FROM qr JOIN cut USING (event_type)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- VaR backtest (Kupiec)
  /** Out-of-sample VaR backtest per series — Kupiec's proportion-of-
    * failures test (Kupiec 1995), the regulatory check a risk desk
    * runs before trusting [[varEsQ]]'s number: the 95% VaR is
    * estimated on the FIRST half of each series' hourly returns (the
    * same exact integer-index order-statistic pick as `ts_var_es`)
    * and breaches are counted on the SECOND half, where a regime
    * shift shows up as a breach rate off 5% and a large likelihood
    * ratio. Counts are exact integers (breach = integer compare
    * q ≤ vq); the LR −2·((n−x)ln(1−p) + x·ln p − (n−x)ln(1−x/n)
    * − x·ln(x/n)) is one fixed float expression over those integers,
    * written term-for-term identically in both engines with the
    * x = 0 / x = n terms zeroed by the same CASE guard.
    */
  private def varBacktestQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val ret = hourly(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull && col("__p") > 0L && col("c") > 0L)
      .withColumn("q", floor(
        log(col("c").cast("double") / col("__p").cast("double"))
          * lit(1000000.0d)).cast("long"))
      .withColumn("trn", row_number().over(w))
      .withColumn("nall", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val train = ret.filter(col("trn") <= expr("nall div 2"))
    val test = ret.filter(col("trn") > expr("nall div 2"))
    val cut = train
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("q"), col("bus"))))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("((m - 1) * 5) div 100 + 1"))
      .select(col("event_type"), col("q").as("vq"))
    val agg = test.join(broadcast(cut), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("q") <= col("vq"), 1L).otherwise(0L)).as("n_breach"))
    val x = col("n_breach").cast("double")
    val nt = col("n_test").cast("double")
    val t1 = when(col("n_breach") < col("n_test"),
      (nt - x) * log(lit(1.0d) - x / nt)).otherwise(lit(0.0d))
    val t2 = when(col("n_breach") > 0L, x * log(x / nt)).otherwise(lit(0.0d))
    agg.select(col("event_type"), col("n_test"), col("n_breach"),
        r4(x / nt).as("breach_rate"),
        r4(lit(-2.0d) * ((nt - x) * log(lit(0.95d)) + x * log(lit(0.05d))
          - t1 - t2)).as("kupiec_lr"))
      .orderBy(col("event_type"))
  }

  private val varBacktestSql: String =
    s"""$hourlyCte, r AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hourly
       |), qr AS (
       |  SELECT event_type, bus,
       |         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(p AS DOUBLE))
       |              * 1000000.0) AS BIGINT) AS q,
       |         row_number() OVER (PARTITION BY event_type ORDER BY bus) AS trn,
       |         count(*) OVER (PARTITION BY event_type) AS nall
       |  FROM r WHERE p IS NOT NULL AND p > 0 AND c > 0
       |), cut AS (
       |  SELECT event_type, q AS vq FROM (
       |    SELECT event_type, q,
       |           row_number() OVER (PARTITION BY event_type ORDER BY q, bus) AS rn,
       |           count(*) OVER (PARTITION BY event_type) AS m
       |    FROM qr WHERE trn <= nall // 2)
       |  WHERE rn = ((m - 1) * 5) // 100 + 1
       |), agg AS (
       |  SELECT qr.event_type, CAST(count(*) AS BIGINT) AS n_test,
       |         CAST(sum(CASE WHEN q <= vq THEN 1 ELSE 0 END) AS BIGINT) AS n_breach
       |  FROM qr JOIN cut USING (event_type)
       |  WHERE trn > nall // 2
       |  GROUP BY 1
       |)
       |SELECT event_type, n_test, n_breach,
       |       ${r4Sql("CAST(n_breach AS DOUBLE) / CAST(n_test AS DOUBLE)")} AS breach_rate,
       |       ${r4Sql(
              "-2.0 * ((CAST(n_test AS DOUBLE) - CAST(n_breach AS DOUBLE)) * ln(0.95)" +
              " + CAST(n_breach AS DOUBLE) * ln(0.05)" +
              " - (CASE WHEN n_breach < n_test" +
              " THEN (CAST(n_test AS DOUBLE) - CAST(n_breach AS DOUBLE))" +
              " * ln(1.0 - CAST(n_breach AS DOUBLE) / CAST(n_test AS DOUBLE)) ELSE 0.0 END)" +
              " - (CASE WHEN n_breach > 0" +
              " THEN CAST(n_breach AS DOUBLE)" +
              " * ln(CAST(n_breach AS DOUBLE) / CAST(n_test AS DOUBLE)) ELSE 0.0 END))")} AS kupiec_lr
       |FROM agg ORDER BY 1""".stripMargin

  // ------------------------------------------- seasonal decomposition
  /** Classical-decomposition seasonal profile over the hourly closes:
    * a centered 24-hour moving average removes the trend, and the
    * hour-of-day means of the DETRENDED series are the seasonal
    * component — unlike `ts_hod_profile` (raw per-hour means), a
    * multi-day drift cannot masquerade as seasonality here. Exactness
    * discipline: the trend is an exact 24-integer sum divided by 24
    * once (one IEEE op, identical in both engines — stated as
    * sum/24.0, NOT avg(), so neither engine's aggregate internals
    * participate), the detrended value is quantized once to exact
    * micro-cents (the cmf mq discipline), and the per-hod sums stay
    * BIGINT; one final division recovers price units. Edge hours
    * (< 24-row centered window) carry no trend and are excluded on
    * both sides.
    */
  private def seasonalQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
      .rowsBetween(-12, 11)
    hourly(s, dir)
      .withColumn("__cnt", count(col("c")).over(w))
      .withColumn("__tr", sum(col("c")).over(w) / lit(24.0d))
      .filter(col("__cnt") === 24)
      .withColumn("__mq",
        floor((col("c") - col("__tr")) * lit(1000000.0d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"),
        (expr("bus div 3600000000") % 24).as("hod"))
      .agg(count(lit(1)).as("n"), sum(col("__mq")).as("__sq"))
      .select(col("event_type"), col("hod"), col("n"),
        r4(col("__sq") / (col("n") * lit(100000000.0d))).as("seasonal"))
      .orderBy(col("event_type"), col("hod"))
  }

  private val seasonalSql: String =
    s"""$hourlyCte, tr AS (
       |  SELECT event_type, bus, c,
       |         count(c) OVER w AS cnt,
       |         sum(c) OVER w / 24.0 AS t
       |  FROM hourly
       |  WINDOW w AS (PARTITION BY event_type ORDER BY bus
       |               ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
       |), mq AS (
       |  SELECT event_type, (bus // 3600000000) % 24 AS hod,
       |         CAST(floor((c - t) * 1000000.0 + 0.5) AS BIGINT) AS q
       |  FROM tr WHERE cnt = 24
       |)
       |SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
       |       ${r4Sql("CAST(sum(q) AS BIGINT) / (count(*) * 100000000.0)")} AS seasonal
       |FROM mq GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------- CUSUM
  /** [[Indicators.cusumPeaks]] over the hourly close series — the
    * Page-1954 level-shift detector in its exact closed form (cumsum
    * minus running extreme over n-scaled integer deviations; the
    * whole statistic is BIGINT until one final division). The oracle
    * replays the same two window passes and picks the same
    * (peak DESC, bus ASC) argmax.
    */
  private def cusumQ(s: SparkSession, dir: String): DataFrame =
    Indicators.cusumPeaks(hourly(s, dir), Seq(col("event_type")),
        col("bus"), col("c"))
      .select(col("event_type"), col("n"),
        col("peak_up_ts").as("peak_up_bus"), r4(col("peak_up")).as("peak_up"),
        col("peak_down_ts").as("peak_down_bus"), r4(col("peak_down")).as("peak_down"))
      .orderBy(col("event_type"))

  private val cusumSql: String =
    s"""$hourlyCte, st AS (
       |  SELECT event_type, bus, c,
       |         count(*) OVER (PARTITION BY event_type) AS n,
       |         sum(c) OVER (PARTITION BY event_type) AS s
       |  FROM hourly
       |), cs AS (
       |  SELECT event_type, bus, n,
       |         sum(c * n - s) OVER w AS cum
       |  FROM st
       |  WINDOW w AS (PARTITION BY event_type ORDER BY bus
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), ud AS (
       |  SELECT event_type, bus, n,
       |         cum - least(0, min(cum) OVER w) AS up,
       |         greatest(0, max(cum) OVER w) - cum AS dn
       |  FROM cs
       |  WINDOW w AS (PARTITION BY event_type ORDER BY bus
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), pu AS (
       |  SELECT event_type, n, bus, up,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY up DESC, bus) AS r
       |  FROM ud
       |), pd AS (
       |  SELECT event_type, bus, dn,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY dn DESC, bus) AS r
       |  FROM ud
       |)
       |SELECT pu.event_type, CAST(pu.n AS BIGINT) AS n,
       |       pu.bus AS peak_up_bus,
       |       ${r4Sql("pu.up / (pu.n * 100.0)")} AS peak_up,
       |       pd.bus AS peak_down_bus,
       |       ${r4Sql("pd.dn / (pu.n * 100.0)")} AS peak_down
       |FROM pu JOIN pd ON pu.event_type = pd.event_type
       |WHERE pu.r = 1 AND pd.r = 1
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------- max drawdown
  /** [[Indicators.maxDrawdown]] over the hourly close series: the
    * deepest peak-to-trough loss per event_type, in percent of the
    * running integer-cents peak. One keyed window + one aggregate;
    * the per-row double exists only inside an order-independent max.
    */
  private def drawdownQ(s: SparkSession, dir: String): DataFrame =
    Indicators.maxDrawdown(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"))
      .select(col("event_type"), col("n"), r4(col("max_dd_pct")).as("max_dd_pct"))
      .orderBy(col("event_type"))

  private val drawdownSql: String =
    s"""$hourlyCte, pk AS (
       |  SELECT event_type, bus, c,
       |         max(c) OVER (PARTITION BY event_type ORDER BY bus
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
       |  FROM hourly
       |)
       |SELECT event_type, count(*) AS n,
       |       ${r4Sql("max((p - c) * 100.0 / CAST(p AS DOUBLE))")} AS max_dd_pct
       |FROM pk GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------- Sharpe ratio
  /** [[Indicators.sharpe]] over the hourly close series, annualized
    * at 8760 hourly periods/year. Micro-nat integer moments, decimal
    * products, one float expression — the ts_corr discipline.
    */
  private def sharpeQ(s: SparkSession, dir: String): DataFrame =
    Indicators.sharpe(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"), periodsPerYear = 8760.0d)
      .select(col("event_type"), col("n"), r4(col("sharpe")).as("sharpe"))
      .orderBy(col("event_type"))

  private val sharpeSql: String =
    s"""$hourlyCte, d AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS prev
       |  FROM hourly
       |), r AS (
       |  SELECT event_type,
       |         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(prev AS DOUBLE))
       |                    * 1000000.0 + 0.5) AS BIGINT) AS rq
       |  FROM d WHERE prev > 0 AND c > 0
       |), sums AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(rq AS HUGEINT)) AS s,
       |         sum(CAST(rq AS HUGEINT) * rq) AS q
       |  FROM r GROUP BY 1
       |)
       |SELECT event_type, n,
       |       ${r4Sql("CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / " +
                       "sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE) / " +
                       "CAST(CAST(n AS HUGEINT) * n AS DOUBLE)) * sqrt(8760.0)")} AS sharpe
       |FROM sums WHERE n >= 2 AND CAST(n AS HUGEINT) * q - s * s > 0
       |ORDER BY event_type""".stripMargin

  // --------------------------------------------------- Sortino ratio
  /** [[Indicators.sortino]] — downside-deviation-denominated Sharpe;
    * same hourly series, same micro-nat discipline.
    */
  private def sortinoQ(s: SparkSession, dir: String): DataFrame =
    Indicators.sortino(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"), periodsPerYear = 8760.0d)
      .select(col("event_type"), col("n"), r4(col("sortino")).as("sortino"))
      .orderBy(col("event_type"))

  private val sortinoSql: String =
    s"""$hourlyCte, d AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS prev
       |  FROM hourly
       |), r AS (
       |  SELECT event_type,
       |         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(prev AS DOUBLE))
       |                    * 1000000.0 + 0.5) AS BIGINT) AS rq
       |  FROM d WHERE prev > 0 AND c > 0
       |), sums AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(rq AS HUGEINT)) AS s,
       |         sum(CASE WHEN rq < 0 THEN CAST(rq AS HUGEINT) * rq
       |                  ELSE CAST(0 AS HUGEINT) END) AS qd
       |  FROM r GROUP BY 1
       |)
       |SELECT event_type, n,
       |       ${r4Sql("CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / " +
                       "sqrt(CAST(qd AS DOUBLE) / CAST(n AS DOUBLE)) * sqrt(8760.0)")} AS sortino
       |FROM sums WHERE n >= 2 AND qd > 0
       |ORDER BY event_type""".stripMargin

  // -------------------------------------------- lag-1 autocorrelation
  /** [[Indicators.autocorr]] (lag 1) over the hourly close series —
    * the mean-reversion diagnostic beside [[sharpeQ]], same micro-nat
    * integer returns, decimal(38,0) moments, one float expression.
    */
  private def autocorrQ(s: SparkSession, dir: String): DataFrame =
    Indicators.autocorr(hourly(s, dir), Seq(col("event_type")), col("bus"),
        col("c"), lagK = 1)
      .select(col("event_type"), col("n"), r4(col("ac")).as("ac"))
      .orderBy(col("event_type"))

  private val autocorrSql: String =
    s"""$hourlyCte, d AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS prev
       |  FROM hourly
       |), r AS (
       |  SELECT event_type, bus,
       |         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(prev AS DOUBLE))
       |                    * 1000000.0 + 0.5) AS BIGINT) AS rq
       |  FROM d WHERE prev > 0 AND c > 0
       |), pr AS (
       |  SELECT event_type, rq AS y,
       |         lag(rq) OVER (PARTITION BY event_type ORDER BY bus) AS x
       |  FROM r
       |), sums AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |         sum(CAST(x AS HUGEINT) * x) AS sxx,
       |         sum(CAST(y AS HUGEINT) * y) AS syy,
       |         sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM pr WHERE x IS NOT NULL GROUP BY 1
       |)
       |SELECT event_type, n,
       |       ${r4Sql("CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS DOUBLE) / " +
                       "(sqrt(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE)) * " +
                       "sqrt(CAST(CAST(n AS HUGEINT)*syy - sy*sy AS DOUBLE)))")} AS ac
       |FROM sums
       |WHERE n >= 2 AND CAST(n AS HUGEINT)*sxx - sx*sx > 0
       |  AND CAST(n AS HUGEINT)*syy - sy*sy > 0
       |ORDER BY event_type""".stripMargin

  // ------------------------------------------- SMA-cross backtest
  /** [[Indicators.smaCrossBacktest]] (10/40) over the hourly close
    * series — the strategy-evaluation composite: integer cross
    * decisions, integer equity sums, one exp at the end.
    */
  private def smaCrossQ(s: SparkSession, dir: String): DataFrame =
    Indicators.smaCrossBacktest(hourly(s, dir), Seq(col("event_type")),
        col("bus"), col("c"), fastN = 10, slowN = 40)
      .select(col("event_type"), col("n"), col("trades"),
        r4(col("strat_ret_pct")).as("strat_ret_pct"))
      .orderBy(col("event_type"))

  private val smaCrossSql: String =
    s"""$hourlyCte, w AS (
       |  SELECT event_type, bus, c,
       |         count(c) OVER fs AS cs,
       |         CAST(sum(c) OVER ff AS BIGINT) AS sf,
       |         CAST(sum(c) OVER fs AS BIGINT) AS ss,
       |         lag(c) OVER wk AS prev
       |  FROM hourly
       |  WINDOW ff AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
       |         fs AS (PARTITION BY event_type ORDER BY bus
       |                ROWS BETWEEN 39 PRECEDING AND CURRENT ROW),
       |         wk AS (PARTITION BY event_type ORDER BY bus)
       |), p AS (
       |  SELECT event_type, bus,
       |         CASE WHEN cs < 40 THEN NULL
       |              WHEN 40 * sf - 10 * ss > 0 THEN 1
       |              WHEN 40 * sf - 10 * ss < 0 THEN -1 ELSE 0 END AS pos,
       |         CASE WHEN prev > 0 AND c > 0
       |              THEN CAST(floor(ln(CAST(c AS DOUBLE) / CAST(prev AS DOUBLE))
       |                               * 1000000.0 + 0.5) AS BIGINT) END AS rq
       |  FROM w
       |), x AS (
       |  SELECT event_type, bus, pos, rq,
       |         lag(pos) OVER (PARTITION BY event_type ORDER BY bus) AS spos
       |  FROM p
       |), agg AS (
       |  SELECT event_type,
       |         CAST(count(CASE WHEN spos IS NOT NULL AND rq IS NOT NULL
       |                         THEN 1 END) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN pos IS NOT NULL AND spos IS NOT NULL
       |                            AND pos <> spos THEN 1 ELSE 0 END) AS BIGINT) AS trades,
       |         CAST(sum(CASE WHEN spos IS NOT NULL AND rq IS NOT NULL
       |                       THEN spos * rq END) AS BIGINT) AS s
       |  FROM x GROUP BY 1
       |)
       |SELECT event_type, n, trades,
       |       ${r4Sql("(exp(s / 1000000.0) - 1.0) * 100.0")} AS strat_ret_pct
       |FROM agg WHERE n >= 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------- correlation matrix
  /** All-pairs Pearson correlation of the hourly close series — the
    * screener view generalizing `ts_corr`'s fixed pair: one self-join
    * on the hour bucket, every moment an exact decimal sum, the
    * coefficient one fixed float expression (identical tree to
    * ts_corr's). Degenerate pairs drop on exact integer variance
    * checks. |series|² pairs of |hours| rows — the join is keyed on
    * the bucket, so at scale it shuffles each series once, not per
    * pair.
    */
  private def corrMatrixQ(s: SparkSession, dir: String): DataFrame = {
    val h = hourly(s, dir)
    val a = h.select(col("event_type").as("event_a"), col("bus"), col("c").as("x"))
    val b = h.select(col("event_type").as("event_b"), col("bus"), col("c").as("y"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val sums = a.join(b, Seq("bus")).filter(col("event_a") < col("event_b"))
      .groupBy(col("event_a"), col("event_b"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
    val cov = (dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (dec(col("n")) * col("sxx") - col("sx") * col("sx"))
    val vy = (dec(col("n")) * col("syy") - col("sy") * col("sy"))
    sums.filter(col("n") >= 2L && vx > 0 && vy > 0)
      .select(col("event_a"), col("event_b"), col("n"),
        r4(cov / (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))).as("corr"))
      .orderBy(col("event_a"), col("event_b"))
  }

  private val corrMatrixSql: String =
    s"""$hourlyCte, j AS (
       |  SELECT a.event_type AS event_a, b.event_type AS event_b,
       |         a.c AS x, b.c AS y
       |  FROM hourly a JOIN hourly b
       |    ON a.bus = b.bus AND a.event_type < b.event_type
       |), sums AS (
       |  SELECT event_a, event_b, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |         sum(CAST(x AS HUGEINT) * x) AS sxx,
       |         sum(CAST(y AS HUGEINT) * y) AS syy,
       |         sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM j GROUP BY 1, 2
       |)
       |SELECT event_a, event_b, n,
       |       ${r4Sql("CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS DOUBLE) / " +
                       "(sqrt(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE)) * " +
                       "sqrt(CAST(CAST(n AS HUGEINT)*syy - sy*sy AS DOUBLE)))")} AS corr
       |FROM sums
       |WHERE n >= 2 AND CAST(n AS HUGEINT)*sxx - sx*sx > 0
       |  AND CAST(n AS HUGEINT)*syy - sy*sy > 0
       |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------- top-k corr screener
  /** [[Indicators.topCorrelated]] — the screener form of
    * `ts_corr_matrix` a large symbol universe runs: sign-of-return
    * signatures (48 bits, slot = hour_index % 48), pigeonhole
    * Hamming candidates (≤ 12 of 48 bits — far under the
    * uncorrelated-pair mean of 24), exact integer-moment Pearson on
    * candidates only, top 5. The universe doubles the real series
    * with constructed echoes (c′ = 2c + hour%5 — corr ≈ 1 by
    * construction, Hamming 0 measured at every SF because real hourly
    * deltas dwarf the ±4-cent wiggle), so the screener's recall is
    * provable on the fixture: the echo pairs ARE the exact all-pairs
    * top 5 (natural pairs measure |corr| ≤ 0.07 at distance ≥ 21),
    * and IndicatorsSpec pins pruned ≡ exact. The oracle replays the
    * same radius semantics all-pairs (ground truth for the
    * pigeonhole's recall-1 claim).
    */
  private def corrTopkQ(s: SparkSession, dir: String): DataFrame = {
    val h0 = hourly(s, dir)
    val uni = h0.select(col("event_type"), col("bus"), col("c")).unionByName(
      h0.select(concat(col("event_type"), lit("#echo")).as("event_type"),
        col("bus"),
        (col("c") * 2L + expr("(bus div 3600000000) % 5")).as("c")))
    Indicators.topCorrelated(uni, col("event_type"), col("bus"), col("c"),
        expr("(bus div 3600000000) % 48"), bits = 48, maxDist = 12, k = 5)
      .select(col("key_a").as("event_a"), col("key_b").as("event_b"),
        col("n"), r4(col("corr")).as("corr"))
      .orderBy(col("corr").desc, col("event_a"), col("event_b"))
  }

  private val corrTopkSql: String =
    s"""$hourlyCte, uni AS (
       |  SELECT event_type, bus, c FROM hourly
       |  UNION ALL
       |  SELECT event_type || '#echo', bus, 2 * c + (bus // 3600000000) % 5
       |  FROM hourly
       |), d AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS prev
       |  FROM uni
       |), u AS (
       |  SELECT event_type, CAST((bus // 3600000000) % 48 AS INTEGER) AS j,
       |         CASE WHEN c > prev THEN 1 ELSE -1 END AS vote
       |  FROM d WHERE prev IS NOT NULL
       |), vj AS (
       |  SELECT event_type, j, sum(vote) AS v FROM u GROUP BY 1, 2
       |), sig AS (
       |  SELECT event_type,
       |         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
       |  FROM vj GROUP BY 1
       |), cand AS (
       |  SELECT a.event_type AS ea, b.event_type AS eb
       |  FROM sig a JOIN sig b ON a.event_type < b.event_type
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 12
       |), jj AS (
       |  SELECT c.ea, c.eb, a.c AS x, b.c AS y
       |  FROM cand c
       |  JOIN uni a ON a.event_type = c.ea
       |  JOIN uni b ON b.event_type = c.eb AND b.bus = a.bus
       |), sums AS (
       |  SELECT ea, eb, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |         sum(CAST(x AS HUGEINT) * x) AS sxx,
       |         sum(CAST(y AS HUGEINT) * y) AS syy,
       |         sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM jj GROUP BY 1, 2
       |), scored AS (
       |  SELECT ea, eb, n,
       |         CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS DOUBLE) /
       |         (sqrt(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE)) *
       |          sqrt(CAST(CAST(n AS HUGEINT)*syy - sy*sy AS DOUBLE))) AS corr
       |  FROM sums
       |  WHERE n >= 2 AND CAST(n AS HUGEINT)*sxx - sx*sx > 0
       |    AND CAST(n AS HUGEINT)*syy - sy*sy > 0
       |  ORDER BY corr DESC, ea, eb LIMIT 5
       |)
       |SELECT ea AS event_a, eb AS event_b, n, ${r4Sql("corr")} AS corr
       |FROM scored ORDER BY ${r4Sql("corr")} DESC, ea, eb""".stripMargin

  // --------------------------------------------- Amihud illiquidity
  /** Amihud (2002) price-impact illiquidity per series: the mean over
    * hours of |hourly return| / hourly volume — the standard "how
    * many price basis points does a unit of flow move" screen a
    * liquidity desk ranks venues by. Scaled by 1e15 and floored to an
    * exact integer PER HOUR before the mean (the micro-nat
    * discipline): the only floats are the per-hour ratio — one
    * double expression evaluated identically by both engines — and
    * the final r4'd mean of exact integer hour-values. Hours without
    * volume or a previous close are skipped (count carried for
    * honesty). One keyed window pass over [[hourlyOhlcQty]].
    */
  private def amihudQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    hourlyOhlcQty(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull && col("__p") > 0L && col("qty") > 0L)
      .withColumn("__q", floor(
        abs(col("c").cast("double") / col("__p").cast("double") - 1.0d)
          / col("qty").cast("double") * 1000000000000000.0d).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("__q")).as("__sq"))
      .select(col("event_type"), col("n_hours"),
        r4(col("__sq").cast("double") / col("n_hours").cast("double"))
          .as("illiq_e15"))
      .orderBy(col("event_type"))
  }

  private val amihudSql: String =
    s"""$hourlyOhlcQtyCte, r AS (
       |  SELECT event_type, bus, c, qty,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hq
       |), f AS (
       |  SELECT event_type,
       |         CAST(floor(abs(CAST(c AS DOUBLE) / CAST(p AS DOUBLE) - 1.0)
       |              / CAST(qty AS DOUBLE) * 1000000000000000.0) AS BIGINT) AS q
       |  FROM r WHERE p IS NOT NULL AND p > 0 AND qty > 0
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
       |       ${r4Sql("CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS illiq_e15
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- Hurst exponent
  /** Rescaled-range Hurst exponent per series (Hurst 1951; Mandelbrot
    * & Wallis 1969) — the long-memory screen: H > 0.5 trending,
    * H < 0.5 mean-reverting, H ≈ 0.5 a random walk. Classic R/S over
    * integer micro-nat log returns at chunk sizes n ∈ {16, 32, 64}
    * (non-overlapping full chunks), then the OLS slope of
    * ln(mean R/S) on ln(n) over the three sizes.
    *
    * Exactness: with S = Σr and P_k the within-chunk prefix sum —
    * both exact longs — the mean-centered cumulative deviation scaled
    * by n is dev_k = n·P_k − k·S (exact), and the n's CANCEL in the
    * rescaled range: R/S = (max dev − min dev) / √(n·Σr² − S²), an
    * integer numerator over the square root of an exact integer. Each
    * chunk's R/S is floor-quantized once to micro-units, so the
    * per-(series, n) mean is an integer sum; the 3-point regression
    * is written term-by-term in fixed order on both engines. Chunks
    * with zero variance are skipped (no rescale exists); series
    * missing any size emit null H. All three sizes run in ONE keyed
    * window pass over the hourly frame with the size exploded as a
    * column (series-local; 3× the hourly rows, one exchange).
    */
  private def hurstQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    // ret feeds every chunk size — localCheckpoint runs the
    // events→hourly→log-return pipeline once, and the three sizes run
    // as ONE window pass over an exploded n ∈ {16,32,64} column (3×
    // rows through one pair of window stages) instead of three
    // unioned pipeline legs (IndAbProbe: 2.39 s original → 1.30 s
    // checkpointed 3-leg → 0.99 s exploded, identical rows). ret is
    // one row per (series, hour) — the rolled-up frame, not raw events.
    val ret = hourly(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull && col("__p") > 0L && col("c") > 0L)
      .withColumn("r", floor(
        log(col("c").cast("double") / col("__p").cast("double"))
          * lit(1000000.0d)).cast("long"))
      .withColumn("rn", row_number().over(w))
      .select(col("event_type"), col("r"), col("rn"))
      .localCheckpoint(false)
    val ex = ret.withColumn("n", explode(array(lit(16L), lit(32L), lit(64L))))
      .withColumn("ck", expr("(rn - 1) div n"))
      .withColumn("k", expr("(rn - 1) % n + 1"))
    val chunkW = Window.partitionBy(col("event_type"), col("n"), col("ck"))
    val prefW = chunkW.orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = ex
      .withColumn("cn", count(lit(1)).over(chunkW))
      .filter(col("cn") === col("n"))
      .withColumn("pk", sum(col("r")).over(prefW))
      .withColumn("sc", sum(col("r")).over(chunkW))
      .withColumn("s2", sum(col("r").cast("decimal(19,0)")
        * col("r").cast("decimal(19,0)")).over(chunkW))
      .withColumn("dev", col("n") * col("pk") - col("k") * col("sc"))
      .groupBy(col("event_type"), col("n"), col("ck"))
      .agg(max(col("dev")).as("dmax"), min(col("dev")).as("dmin"),
        first(col("sc")).as("sc"), first(col("s2")).as("s2"))
      .withColumn("rad",
        (col("n").cast("decimal(10,0)") * col("s2")
          - col("sc").cast("decimal(19,0)") * col("sc").cast("decimal(19,0)"))
          .cast("double"))
      .filter(col("rad") > 0.0d)
      .withColumn("rsq", floor(
        (col("dmax") - col("dmin")).cast("double") / sqrt(col("rad"))
          * lit(1000000.0d)).cast("long"))
      .groupBy(col("event_type"), col("n"))
      .agg(count(lit(1)).as("nch"), sum(col("rsq")).as("srs"))
      .select(col("event_type"), col("n"),
        (col("srs").cast("double") / col("nch").cast("double")
          / lit(1000000.0d)).as("rs"))
    // 3-point OLS of ln(rs) on ln(n), terms in fixed ascending-n order
    val byN = all.groupBy(col("event_type"))
      .agg(count(lit(1)).as("np"),
        max(when(col("n") === 16, col("rs"))).as("rs16"),
        max(when(col("n") === 32, col("rs"))).as("rs32"),
        max(when(col("n") === 64, col("rs"))).as("rs64"))
      .filter(col("np") === 3L)
    val x1 = log(lit(16.0d)); val x2 = log(lit(32.0d)); val x3 = log(lit(64.0d))
    val sx = x1 + x2 + x3
    val sxx = x1 * x1 + x2 * x2 + x3 * x3
    val sy = log(col("rs16")) + log(col("rs32")) + log(col("rs64"))
    val sxy = x1 * log(col("rs16")) + x2 * log(col("rs32")) + x3 * log(col("rs64"))
    byN.select(col("event_type"),
        r4(col("rs16")).as("rs16"), r4(col("rs32")).as("rs32"),
        r4(col("rs64")).as("rs64"),
        r4((lit(3.0d) * sxy - sx * sy) / (lit(3.0d) * sxx - sx * sx)).as("hurst"))
      .orderBy(col("event_type"))
  }

  private val hurstSql: String = {
    def rsCte(n: Int): String =
      s"""ch$n AS (
         |  SELECT event_type, (rn - 1) // $n AS ck, (rn - 1) % $n + 1 AS k, r,
         |         count(*) OVER (PARTITION BY event_type, (rn - 1) // $n) AS cn,
         |         sum(r) OVER (PARTITION BY event_type, (rn - 1) // $n
         |                      ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING
         |                      AND CURRENT ROW) AS pk,
         |         sum(r) OVER (PARTITION BY event_type, (rn - 1) // $n) AS sc,
         |         sum(CAST(r AS HUGEINT) * r)
         |           OVER (PARTITION BY event_type, (rn - 1) // $n) AS s2
         |  FROM ret
         |), rs$n AS (
         |  SELECT event_type, CAST($n AS INTEGER) AS n,
         |         CAST(sum(rsq) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |           / 1000000.0 AS rs
         |  FROM (
         |    SELECT event_type, ck,
         |           CAST(floor(CAST(max($n * pk - k * sc) - min($n * pk - k * sc)
         |                AS DOUBLE)
         |                / sqrt(CAST($n * max(s2) - CAST(max(sc) AS HUGEINT) * max(sc)
         |                       AS DOUBLE))
         |                * 1000000.0) AS BIGINT) AS rsq
         |    FROM ch$n WHERE cn = $n
         |    GROUP BY 1, 2
         |    HAVING CAST($n * max(s2) - CAST(max(sc) AS HUGEINT) * max(sc)
         |           AS DOUBLE) > 0
         |  ) GROUP BY 1
         |)""".stripMargin
    s"""$hourlyCte, lagd AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hourly
       |), ret AS (
       |  SELECT event_type,
       |         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(p AS DOUBLE))
       |              * 1000000.0) AS BIGINT) AS r,
       |         row_number() OVER (PARTITION BY event_type ORDER BY bus) AS rn
       |  FROM lagd WHERE p IS NOT NULL AND p > 0 AND c > 0
       |),
       |${Seq(16, 32, 64).map(rsCte).mkString(",\n")},
       |wide AS (
       |  SELECT event_type, count(*) AS np,
       |         max(CASE WHEN n = 16 THEN rs END) AS rs16,
       |         max(CASE WHEN n = 32 THEN rs END) AS rs32,
       |         max(CASE WHEN n = 64 THEN rs END) AS rs64
       |  FROM (SELECT * FROM rs16 UNION ALL SELECT * FROM rs32
       |        UNION ALL SELECT * FROM rs64)
       |  GROUP BY 1 HAVING count(*) = 3
       |)
       |SELECT event_type, ${r4Sql("rs16")} AS rs16, ${r4Sql("rs32")} AS rs32,
       |       ${r4Sql("rs64")} AS rs64,
       |       ${r4Sql("(3.0 * (ln(16.0) * ln(rs16) + ln(32.0) * ln(rs32) + ln(64.0) * ln(rs64))" +
                       " - (ln(16.0) + ln(32.0) + ln(64.0)) * (ln(rs16) + ln(rs32) + ln(rs64)))" +
                       " / (3.0 * (ln(16.0) * ln(16.0) + ln(32.0) * ln(32.0) + ln(64.0) * ln(64.0))" +
                       " - (ln(16.0) + ln(32.0) + ln(64.0)) * (ln(16.0) + ln(32.0) + ln(64.0)))")} AS hurst
       |FROM wide ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------- volume point of control
  /** Volume profile / point of control per series: bucket each hour's
    * close into $1 bands (100-cent integer division), sum volume per
    * band, and report the band where the most volume traded (POC —
    * the price the market accepted most), its volume, and the share
    * of total volume inside POC ± 1 band (the one-band value area).
    * All sums exact integers; ties break to the LOWER band by an
    * integer min_by/arg_min; the only float is the final r4'd share.
    */
  private def vpocQ(s: SparkSession, dir: String): DataFrame = {
    // banded is consumed twice (the total/argmax agg AND the value-area
    // join) — localCheckpoint stops the events→hourly pipeline running
    // twice, and the per-key singleton tot broadcasts (IndAbProbe:
    // 1.61 → 0.95 s median at sf0.1, identical rows). banded is
    // series × $1-bands — model-sized at any corpus scale.
    val banded = hourlyOhlcQty(s, dir)
      .select(col("event_type"), expr("c div 100").as("band"), col("qty"))
      .groupBy(col("event_type"), col("band"))
      .agg(sum(col("qty")).as("v"))
      .localCheckpoint(false)
    // scalar argmax key v·10⁹ − band: max volume first, ties to the
    // LOWER band — a single BIGINT both engines' arg_max accept
    // (bands are c//100 with c in cents; 10⁹ dwarfs any real band)
    val pocKey = col("v") * lit(1000000000L) - col("band")
    val tot = banded.groupBy(col("event_type"))
      .agg(sum(col("v")).as("v_total"),
        max_by(col("band"), pocKey).as("poc_band"),
        max_by(col("v"), pocKey).as("poc_volume"))
    banded.join(broadcast(tot), "event_type")
      .filter(col("band") >= col("poc_band") - 1L &&
        col("band") <= col("poc_band") + 1L)
      .groupBy(col("event_type"), col("poc_band"), col("poc_volume"),
        col("v_total"))
      .agg(sum(col("v")).as("__area"))
      .select(col("event_type"), col("poc_band"), col("poc_volume"),
        col("v_total"),
        r4(col("__area").cast("double") / col("v_total").cast("double"))
          .as("area_share"))
      .orderBy(col("event_type"))
  }

  private val vpocSql: String =
    s"""$hourlyOhlcQtyCte, banded AS (
       |  SELECT event_type, c // 100 AS band, CAST(sum(qty) AS BIGINT) AS v
       |  FROM hq GROUP BY 1, 2
       |), tot AS (
       |  SELECT event_type, CAST(sum(v) AS BIGINT) AS v_total,
       |         CAST(arg_max(band, v * 1000000000 - band) AS BIGINT) AS poc_band,
       |         CAST(arg_max(v, v * 1000000000 - band) AS BIGINT) AS poc_volume
       |  FROM banded GROUP BY 1
       |)
       |SELECT b.event_type, poc_band, poc_volume, v_total,
       |       ${r4Sql("CAST(sum(v) AS DOUBLE) / CAST(v_total AS DOUBLE)")} AS area_share
       |FROM banded b JOIN tot USING (event_type)
       |WHERE band BETWEEN poc_band - 1 AND poc_band + 1
       |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin

  // ------------------------------------------------- Kyle's lambda
  /** Kyle (1985) lambda per series — the OLS slope of hourly price
    * change on signed hourly volume (sign of the change × quantity,
    * the net-flow proxy): cents of impact per unit of signed flow.
    * Same exactness scheme as [[betaQ]]: x = sign(Δc)·qty and y = Δc
    * are exact integers, the per-row moment products are cast to
    * decimal BEFORE the sums (Spark) ↔ HUGEINT (DuckDB) so nothing
    * wraps, and the n·Σxy − Σx·Σy / n·Σxx − Σx² combination rounds
    * to double exactly once at the division. The slope is emitted
    * ×1e6 (micro-cents per unit flow) so r4 keeps resolution.
    * Degenerate series (no signed flow variance) emit null.
    */
  private def kyleLambdaQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    hourlyOhlcQty(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull)
      .select(col("event_type"),
        (col("c") - col("__p")).as("y"),
        (signum((col("c") - col("__p")).cast("double")).cast("long")
          * col("qty")).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .as("__sxy"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
          .as("__sxx"))
      .withColumn("__den",
        col("n").cast("decimal(10,0)") * col("__sxx")
          - col("__sx").cast("decimal(19,0)") * col("__sx").cast("decimal(19,0)"))
      .select(col("event_type"), col("n"),
        r4(when(col("__den") =!= lit(0),
          (col("n").cast("decimal(10,0)") * col("__sxy")
            - col("__sx").cast("decimal(19,0)") * col("__sy").cast("decimal(19,0)"))
            .cast("double") / col("__den").cast("double") * 1000000.0d))
          .as("lambda_e6"))
      .orderBy(col("event_type"))
  }

  private val kyleLambdaSql: String =
    s"""$hourlyOhlcQtyCte, r AS (
       |  SELECT event_type, bus, c, qty,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hq
       |), d AS (
       |  SELECT event_type,
       |         CAST(c - p AS BIGINT) AS y,
       |         CAST(CASE WHEN c > p THEN 1 WHEN c < p THEN -1 ELSE 0 END
       |              * qty AS BIGINT) AS x
       |  FROM r WHERE p IS NOT NULL
       |), mo AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(x) AS sx, sum(y) AS sy,
       |         sum(CAST(x AS HUGEINT) * y) AS sxy,
       |         sum(CAST(x AS HUGEINT) * x) AS sxx
       |  FROM d GROUP BY 1
       |)
       |SELECT event_type, n,
       |       ${r4Sql("CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <> 0" +
                       " THEN CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)" +
                       " / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)" +
                       " * 1000000.0 END")} AS lambda_e6
       |FROM mo ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_amihud"     -> amihudQ,
    "ts_hurst"      -> hurstQ,
    "ts_kyle_lambda" -> kyleLambdaQ,
    "ts_vpoc"       -> vpocQ,
    "ts_corr_topk"  -> corrTopkQ,
    "ts_drawdown"   -> drawdownQ,
    "ts_cusum"      -> cusumQ,
    "ts_seasonal"   -> seasonalQ,
    "ts_var_es"     -> varEsQ,
    "ts_var_backtest" -> varBacktestQ,
    "ts_beta"       -> betaQ,
    "ts_rolling_beta" -> rollingBetaQ,
    "ts_half_life"  -> halfLifeQ,
    "ts_heikin_ashi" -> heikinAshiQ,
    "ts_keltner"    -> keltnerQ,
    "ts_ichimoku"   -> ichimokuQ,
    "ts_sharpe"     -> sharpeQ,
    "ts_sortino"    -> sortinoQ,
    "ts_corr_matrix" -> corrMatrixQ,
    "ts_autocorr"   -> autocorrQ,
    "ts_sma_cross"  -> smaCrossQ,
    "ts_rsi"        -> rsiQ,
    "ts_bollinger"  -> bollingerQ,
    "ts_ema"        -> emaQ,
    "ts_vwap"       -> vwapQ,
    "ts_stochastic" -> stochasticQ,
    "ts_williams_r" -> williamsQ,
    "ts_cci"        -> cciQ,
    "ts_aroon"      -> aroonQ,
    "ts_adx"        -> adxQ,
    "ts_atr"        -> atrQ,
    "ts_donchian"   -> donchianQ,
    "ts_roc"        -> rocQ,
    "ts_trix"       -> trixQ,
    "ts_vortex"     -> vortexQ,
    "ts_macd"       -> macdQ,
    "ts_mfi"        -> mfiQ,
    "ts_cmf"        -> cmfQ,
    "ts_obv"        -> obvQ,
    "ts_rolling_corr" -> rollingCorrQ,
    "ts_parkinson"  -> parkinsonQ,
  )

  def oracleSql: Map[String, String] = Map(
    "ts_amihud"     -> amihudSql,
    "ts_hurst"      -> hurstSql,
    "ts_kyle_lambda" -> kyleLambdaSql,
    "ts_vpoc"       -> vpocSql,
    "ts_corr_topk"  -> corrTopkSql,
    "ts_drawdown"   -> drawdownSql,
    "ts_cusum"      -> cusumSql,
    "ts_seasonal"   -> seasonalSql,
    "ts_var_es"     -> varEsSql,
    "ts_var_backtest" -> varBacktestSql,
    "ts_beta"       -> betaSql,
    "ts_rolling_beta" -> rollingBetaSql,
    "ts_half_life"  -> halfLifeSql,
    "ts_heikin_ashi" -> heikinAshiSql,
    "ts_keltner"    -> keltnerSql,
    "ts_ichimoku"   -> ichimokuSql,
    "ts_sharpe"     -> sharpeSql,
    "ts_sortino"    -> sortinoSql,
    "ts_corr_matrix" -> corrMatrixSql,
    "ts_autocorr"   -> autocorrSql,
    "ts_sma_cross"  -> smaCrossSql,
    "ts_rsi"        -> rsiSql,
    "ts_bollinger"  -> bollingerSql,
    "ts_ema"        -> emaSql,
    "ts_vwap"       -> vwapSql,
    "ts_stochastic" -> stochasticSql,
    "ts_williams_r" -> williamsSql,
    "ts_cci"        -> cciSql,
    "ts_aroon"      -> aroonSql,
    "ts_adx"        -> adxSql,
    "ts_atr"        -> atrSql,
    "ts_donchian"   -> donchianSql,
    "ts_roc"        -> rocSql,
    "ts_trix"       -> trixSql,
    "ts_vortex"     -> vortexSql,
    "ts_macd"       -> macdSql,
    "ts_mfi"        -> mfiSql,
    "ts_cmf"        -> cmfSql,
    "ts_obv"        -> obvSql,
    "ts_rolling_corr" -> rollingCorrSql,
    "ts_parkinson"  -> parkinsonSql,
  )
}
