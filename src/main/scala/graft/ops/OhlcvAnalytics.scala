package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's three analytics materialized views +
  * common-basequote selection, parameterized by `asOf` instead of
  * CURRENT_DATE so results are deterministic (SURVEY §7.4 risk 5;
  * reference scripts/database/init/create.sql:225-337, :90-99).
  */
object OhlcvAnalytics {
  private val keys = Seq(col("exchange"), col("base_id"), col("quote_id"))

  /** A2: (base, quote) pairs present on more than `minEx` exchanges,
    * top `n` by exchange count (create.sql:94-99 "because storage is
    * limited"). Tie-break on keys for determinism.
    */
  def commonBaseQuote(symExch: DataFrame, minEx: Int = 2, n: Int = 30): DataFrame =
    symExch.groupBy(col("base_id"), col("quote_id"))
      .agg(count(lit(1)).as("n_ex"))
      .filter(col("n_ex") > minEx)
      .orderBy(col("n_ex").desc, col("base_id"), col("quote_id"))
      .limit(n)
      .select(col("base_id"), col("quote_id"))

  /** A3 (create.sql:225-278): geometric-mean daily return per key over
    * the trailing `windowDays`, from daily candles; gap days forward-
    * filled; output ranked desc, cast decimal(10,4).
    */
  def geoDailyReturn(daily: DataFrame, asOf: Column, windowDays: Int = 8): DataFrame = {
    val recent = daily.filter(
      col("bucket") >= date_sub(asOf.cast("date"), windowDays).cast("timestamp"))
    Analytics.geoMeanDailyReturn(
        recent.select((keys :+ col("bucket") :+ col("close")): _*),
        keys, col("bucket"), col("close"), asOf.cast("timestamp"))
      .select((keys :+
        col("daily_return_pct").cast("decimal(10,4)").as("daily_return_pct")): _*)
      .orderBy(col("daily_return_pct").desc, col("exchange"), col("base_id"), col("quote_id"))
  }

  /** A4 (create.sql:280-316): total quoted volume (close·volume) per
    * (base, quote) from the 7-day rollup, top-20 with 'Other' bucket,
    * rounded to 4 dp.
    */
  def top20QuotedVol(rollup7d: DataFrame, asOf: Column): DataFrame = {
    val totals = rollup7d
      .filter(col("bucket") >= (asOf.cast("timestamp") - expr("interval 7 days")))
      .groupBy(col("base_id"), col("quote_id"))
      .agg(sum(col("close") * col("volume")).as("t"))
      .select(concat_ws("-", col("base_id"), col("quote_id")).as("grp"), col("t"))
    Analytics.topNWithOther(totals, col("grp"), col("t"), 20)
      .select(col("bqgrp"), round(col("total_volume"), 4).as("total_volume"))
      .orderBy(col("total_volume").desc, col("bqgrp"))
  }

  /** A5 (create.sql:318-337): latest-week return per key from weekly
    * candles over the trailing week.
    */
  def weeklyReturn(weekly: DataFrame, asOf: Column): DataFrame =
    Analytics.latestPerKey(
        weekly.filter(col("bucket") >= (asOf.cast("timestamp") - expr("interval 7 days"))),
        keys, Seq(col("bucket").desc))
      .select((col("bucket").as("time") +: keys :+
        round((col("close") - col("open")) / col("open") * 100d, 4)
          .as("weekly_return_pct")): _*)
      .orderBy(col("weekly_return_pct").desc, col("exchange"), col("base_id"), col("quote_id"))

  /** P7+J3 (scripts/database/cron/daily.sql:1-40): refresh is_trading
    * from the latest candle time per key — stale > 1 day → false.
    */
  def isTradingRefresh(symExch: DataFrame, ohlcvs: DataFrame, asOf: Column): DataFrame = {
    val latest = ohlcvs.groupBy(keys: _*).agg(max(col("time")).as("last_time"))
    symExch.join(latest, Seq("exchange", "base_id", "quote_id"), "left")
      .withColumn("is_trading",
        col("last_time").isNotNull &&
          col("last_time") >= (asOf.cast("timestamp") - expr("interval 1 day")))
      .drop("last_time")
  }

  /** J5 (schemas/delete_queries.sql:3-10): keep only rows whose
    * (base, quote) is in the common set — anti-join prune.
    */
  def pruneToCommon(df: DataFrame, common: DataFrame): DataFrame =
    df.join(broadcast(common), Seq("base_id", "quote_id"), "left_semi")
}
