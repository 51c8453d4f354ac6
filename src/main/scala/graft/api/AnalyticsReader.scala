package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analytics read endpoints (SURVEY §7.1 item 4;
  * reference web/routes/api/rest/utils/readers.py:23-124):
  * optional upper/lower percentage cutoffs and `limit = -1` meaning
  * unlimited (T2; readers.py:64-69, :111-116).
  */
object AnalyticsReader {

  /** Generic cutoff+limit reader over a precomputed analytics view.
    * @param limit  -1 = all rows (T2), otherwise top-`limit`
    */
  def readRanked(view: DataFrame, metric: Column,
                 cutoffUpperPct: Option[Double] = None,
                 cutoffLowerPct: Option[Double] = None,
                 limit: Int = 500): DataFrame = {
    val filtered = view
      .filter(cutoffUpperPct.map(metric < _).getOrElse(lit(true)))
      .filter(cutoffLowerPct.map(metric > _).getOrElse(lit(true)))
      .orderBy(metric.desc)
    if (limit == -1) filtered else filtered.limit(limit)
  }

  /** GET /api/analytics/geodr (readers.py:23-69). */
  def readGeoDr(geoDailyReturn: DataFrame,
                cutoffUpperPct: Option[Double] = Some(10000d),
                cutoffLowerPct: Option[Double] = Some(0d),
                limit: Int = 500): DataFrame =
    readRanked(geoDailyReturn, col("daily_return_pct"),
      cutoffUpperPct, cutoffLowerPct, limit)

  /** GET /api/analytics/wr (readers.py:71-124). */
  def readWr(weeklyReturn: DataFrame,
             cutoffUpperPct: Option[Double] = Some(10000d),
             cutoffLowerPct: Option[Double] = Some(0d),
             limit: Int = 500): DataFrame =
    readRanked(weeklyReturn, col("weekly_return_pct"),
      cutoffUpperPct, cutoffLowerPct, limit)
}
