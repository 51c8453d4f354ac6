package graft.api

import graft.core.Schemas
import graft.ops.CandleOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's main read path `GET /api/ohlcvs`
  * (web/routes/api/rest/utils/readers.py:126-368) as DataFrame
  * transformations: interval dispatch, limit clamp, end-default,
  * optional time-spine gap fill with window-average fill rows, epoch
  * output, 4-dp HALF_EVEN rounding.
  */
object OhlcvReader {

  /** @param mls        epoch milliseconds in `time` (else seconds)
    * @param emptyTs    gap-fill missing buckets (readers.py:210-244)
    * @param asOf       "now" for the end-default (parameterized, F8)
    */
  case class Params(
      exchange: String, baseId: String, quoteId: String,
      interval: String = "1m",
      startMs: Option[Long] = None, endMs: Option[Long] = None,
      limit: Int = 500, emptyTs: Boolean = false, mls: Boolean = true,
      asOf: java.sql.Timestamp = java.sql.Timestamp.from(java.time.Instant.now()))

  val maxLimit = 500 // readers.py:168

  /** @param base     1-minute fact table
    * @param rollups  maintained rollup tables by interval key; any
    *                 declared interval missing here is computed on the
    *                 fly from `base` (fixing the reference's
    *                 declared-but-crashing 3h/14D — SURVEY §7.4 risk 6)
    */
  def read(base: DataFrame, rollups: Map[String, DataFrame], p: Params): DataFrame = {
    val isCalendar = Schemas.calendarIntervals.contains(p.interval)
    if (!isCalendar && !Schemas.intervalSeconds.contains(p.interval))
      throw new IllegalArgumentException(
        s"interval ${p.interval} not in " +
          (Schemas.intervalSeconds.keys ++ Schemas.calendarIntervals.keys).mkString(","))

    // end defaults to now−1min truncated to the minute (readers.py:169-176)
    val endTs: Column = p.endMs
      .map(ms => timestamp_millis(lit(ms)))
      .getOrElse(date_trunc("minute", lit(p.asOf) - expr("interval 1 minute")))
    require(p.limit > 0,
      s"limit must be positive, got ${p.limit} (the -1=unlimited convention " +
        "belongs to the analytics readers — AnalyticsReader)")
    val limit = math.min(p.limit, maxLimit)

    val source: DataFrame =
      if (p.interval == "1m") base.withColumnRenamed("time", "bucket")
      else if (isCalendar)
        rollups.getOrElse(p.interval,
          CandleOps.rollupCalendar(base, Schemas.calendarIntervals(p.interval)))
      else rollups.getOrElse(p.interval,
        CandleOps.rollup(base, Schemas.intervalSeconds(p.interval)))

    val filtered = source
      .filter(col("exchange") === p.exchange &&
        col("base_id") === p.baseId && col("quote_id") === p.quoteId)
      .filter(p.startMs.map(ms => col("bucket") >= timestamp_millis(lit(ms)))
        .getOrElse(lit(true)))
      .filter(col("bucket") <= endTs)
      .select(col("bucket"), col("open"), col("high"), col("low"),
        col("close"), col("volume"))
      .orderBy(col("bucket").desc)
      .limit(limit)

    val result =
      if (!p.emptyTs) filtered.orderBy(col("bucket")) // re-sort asc (T3)
      else {
        require(!isCalendar,
          s"empty_ts gap-fill is not defined for calendar interval ${p.interval}")
        gapFill(filtered, Schemas.intervalSeconds(p.interval), endTs, limit)
      }

    // ms/s epoch + 4-dp HALF_EVEN at the boundary (parsers.py:9-40)
    val t = if (p.mls) unix_millis(col("bucket"))
            else (unix_millis(col("bucket")) / 1000L).cast("long")
    result.select(
      (t.as("time") +:
        Seq("open", "high", "low", "close", "volume")
          .map(c => bround(col(c), 4).as(c))): _*)
  }

  /** [[read]] through a [[QueryCache]]: identical parameter sets
    * within the TTL return the same persisted result instead of
    * re-scanning (reference caching.py:23-66 — every reader query is
    * cached for 2 h keyed by rendered statement + params; here the
    * key is the rendered [[Params]], which pins asOf and therefore
    * the defaulted end too).
    */
  def readCached(cache: QueryCache, base: DataFrame,
                 rollups: Map[String, DataFrame], p: Params): DataFrame =
    cache.getOrCompute(cacheKey(p, base, rollups))(read(base, rollups, p))

  /** Rendered-parameters + source cache key (≙ the reference's
    * statement+params dogpile key — its rendered SQL names the table,
    * so two reads are interchangeable iff the params AND the scanned
    * relations match). The source part is the semantic hash of each
    * input plan: pass a different base/rollup snapshot (or a freshly
    * re-read table) and the key changes instead of serving the other
    * snapshot's rows.
    */
  def cacheKey(p: Params, base: DataFrame, rollups: Map[String, DataFrame]): String =
    p.toString + "|base=" + base.semanticHash() +
      rollups.toSeq.sortBy(_._1)
        .map { case (k, df) => s"|$k=${df.semanticHash()}" }.mkString

  /** readers.py:210-244: spine from min(bucket) to the *requested end*
    * (not max(data) — a live chart always has a trailing gap up to
    * now−1min, and the reference emits those empty slots too) at width
    * steps, keeping the latest `limit` slots (the spine carries its
    * own ORDER BY time DESC LIMIT, readers.py:230-232), left-join
    * data, fill missing OHLC with the window average row (volume 0) —
    * deliberately NOT interpolation (A7).
    */
  private def gapFill(data: DataFrame, widthSec: Long, endTs: Column,
                      limit: Int): DataFrame = {
    val stats = data.agg(
      min(col("bucket")).as("mn"),
      avg(col("open")).as("ao"), avg(col("high")).as("ah"),
      avg(col("low")).as("al"), avg(col("close")).as("ac"))
    val spine = stats.select(
        explode(sequence(col("mn"), endTs,
          expr(s"interval $widthSec seconds"))).as("bucket"),
        col("ao"), col("ah"), col("al"), col("ac"))
      .orderBy(col("bucket").desc)
      .limit(limit)
    spine.join(data, Seq("bucket"), "left")
      .select(
        col("bucket"),
        coalesce(col("open"), col("ao")).as("open"),
        coalesce(col("high"), col("ah")).as("high"),
        coalesce(col("low"), col("al")).as("low"),
        coalesce(col("close"), col("ac")).as("close"),
        coalesce(col("volume"), lit(0.0d)).as("volume"))
      .orderBy(col("bucket"))
  }
}
