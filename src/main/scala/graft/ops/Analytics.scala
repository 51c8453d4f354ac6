package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytics-view operators re-expressed Spark-first
  * (SURVEY §2.3-§2.6; reference scripts/database/init/create.sql:225-337).
  *
  * Scale notes are per-operator; the common theme: key-partitioned
  * window functions shuffle once on the key and stay fully parallel,
  * while the two global rankings (topNWithOther, rank in weeklyReturn
  * output) run on *already aggregated* inputs that are tiny by
  * construction (#groups, not #rows), so the single-partition window
  * is safe even at 100 TB input.
  */
object Analytics {

  /** Latest row per key — the reference's LATERAL top-1 / DISTINCT ON
    * pattern (SURVEY J3/W7; reference schemas/select_queries.sql:9-24,
    * scripts/database/cron/daily.sql:2-18).
    * One shuffle on `keys`; `order` must be a total order within a key.
    */
  def latestPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Gap detection via LEAD (SURVEY W1; reference
    * schemas/select_queries.sql:28-49): rows where the next timestamp
    * for the key is more than `thresholdSec` away.
    * Emits (keys..., gap_start=timeCol, gap_end=next time).
    */
  def gapReport(df: DataFrame, keys: Seq[Column], timeCol: Column,
                thresholdSec: Long): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(timeCol)
    df.withColumn("__next", lead(timeCol, 1).over(w))
      .filter(col("__next").isNotNull &&
        (unix_micros(col("__next")) - unix_micros(timeCol)) > thresholdSec * 1000000L)
      .select((keys :+ timeCol.as("gap_start") :+ col("__next").as("gap_end")): _*)
  }

  /** Variable-length forward fill of a daily series (SURVEY W2;
    * reference create.sql:229-244): for each row, generate every day
    * from its bucket up to (next bucket − 1 day), carrying values
    * forward. `upTo` bounds the last row's fill (reference uses
    * CURRENT_DATE; parameterized here for determinism — SURVEY §7.4).
    * Requires unique (keys..., bucketCol).
    */
  def forwardFillDaily(df: DataFrame, keys: Seq[Column], bucketCol: Column,
                       carried: Seq[(String, Column)], upTo: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(bucketCol)
    // Two phases: Spark disallows window functions inside a generator
    // argument, so materialize the fill end first, then explode.
    val withEnd = df.withColumn("__fill_end",
      coalesce(lead(bucketCol, 1).over(w) - expr("interval 1 day"), upTo))
    // A key's last row can start after `upTo` (data newer than the
    // requested as-of): ANSI sequence(start > stop) throws, while the
    // oracle's generate_series yields an empty list — i.e. the row
    // contributes nothing. The when-guard (null when start > stop)
    // reproduces that exactly: explode drops null arrays.
    val cols = keys ++ carried.map { case (n, c) => c.as(n) } :+
      explode(when(bucketCol <= col("__fill_end"),
        sequence(bucketCol, col("__fill_end"), expr("interval 1 day")))).as("day")
    withEnd.select(cols: _*)
  }

  /** Geometric-mean daily return (SURVEY A3; reference
    * create.sql:225-278): forward-filled daily closes → LAG →
    * ln(close/prev) → (exp(sum)^.../n − 1)·100.
    * Input: unique (keys..., bucket) daily candles with `close`.
    * All shuffles are on `keys`; no global barrier.
    */
  def geoMeanDailyReturn(daily: DataFrame, keys: Seq[Column], bucket: Column,
                         close: Column, upTo: Column): DataFrame = {
    val filled = forwardFillDaily(
      daily.filter(close =!= 0d), keys, bucket, Seq("close" -> close), upTo)
    val keyNames = filled.columns.dropRight(2) // keys as selected
    val w = Window.partitionBy(keyNames.map(col): _*).orderBy(col("day"))
    filled
      .withColumn("__prev", lag(col("close"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__prev") =!= 0d)
      .withColumn("__lnf", log(col("close") / col("__prev")))
      .groupBy(keyNames.map(col): _*)
      .agg(((pow(exp(sum(col("__lnf"))), lit(1.0) / count(col("__lnf"))) - 1d) * 100d)
        .as("daily_return_pct"))
  }

  /** Top-N groups by total with an 'Other' bucket (SURVEY A4; reference
    * create.sql:280-316). `totals` must already be aggregated
    * (group, total); ranking ties broken by group name.
    * The unpartitioned row_number window runs on #groups rows only.
    */
  def topNWithOther(totals: DataFrame, grp: Column, total: Column, n: Int): DataFrame = {
    val w = Window.orderBy(total.desc, grp.asc)
    totals
      .withColumn("__rk", row_number().over(w))
      .withColumn("bqgrp", when(col("__rk") > n, lit("Other")).otherwise(grp))
      .groupBy(col("bqgrp"))
      .agg(sum(total).as("total_volume"))
  }

  /** Trailing-rows moving average (SURVEY W5/W6; reference
    * schemas/aggregations.sql:24-39, web/src/chart.js:298-312).
    */
  def smaRows(df: DataFrame, keys: Seq[Column], order: Column, value: Column,
              nRows: Int): Column =
    avg(value).over(
      Window.partitionBy(keys: _*).orderBy(order).rowsBetween(-(nRows - 1), 0))

  /** Gap-based sessionization (SURVEY ST-family batch analog): assign
    * each row a per-key `session_id` that increments whenever the gap
    * to the previous row (ordered by `order` then `tiebreak`) exceeds
    * `maxGap` (same units as `order` — epoch-µs for a `tus` column).
    * The batch twin of Structured Streaming's session windows: one
    * shuffle on the key, one per-partition sort, two window passes
    * (lag → running sum) that Catalyst fuses into a single Window
    * exec over the same (partition, order) spec — no second shuffle.
    *
    * `tiebreak` makes the order total so equal timestamps (the events
    * table has collisions) sessionize deterministically; rows at an
    * equal `order` value are always in one session (gap 0 ≤ maxGap),
    * so the tiebreak only fixes row identity, not session membership.
    * Session ids start at 1 and are contiguous per key — stable join
    * keys for downstream per-session aggregation.
    */
  def sessionize(df: DataFrame, keys: Seq[Column], order: Column,
                 tiebreak: Column, maxGap: Long): DataFrame = {
    require(!df.columns.contains("session_id"),
      "input already has a session_id column — rename it first; " +
        "sessionize would silently overwrite it")
    val w = Window.partitionBy(keys: _*).orderBy(order, tiebreak)
    val break = when(
      lag(order, 1).over(w).isNull || order - lag(order, 1).over(w) > maxGap,
      1L).otherwise(0L)
    df.withColumn("session_id",
      sum(break).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered funnel over keyed event groups (typically
    * [[sessionize]]d sessions): for each key, the first time each
    * stage is reached STRICTLY AFTER the previous stage —
    * t₀ = min t over stage-0 rows, tₖ = min t over stage-k rows with
    * t > tₖ₋₁ — the classic ordered-funnel semantics (a purchase
    * before any view does not count as conversion). A key that never
    * reaches stage k has null tₖ, and the null propagates through
    * every later stage.
    *
    * Shape: ONE keyed aggregation collecting, per stage, the sorted
    * list of that stage's times (collect_list's partial combines
    * map-side), then one projection walking the chain with
    * higher-order array functions — tₖ = first element of list k
    * strictly greater than tₖ₋₁. One scan of the events and one
    * shuffle regardless of stage count (the previous shape re-joined
    * and re-aggregated the events once per stage — s scans and s
    * shuffles). Per-key state is the key's stage-event times — the
    * same contract as ClickHouse's windowFunnel; feed sessionized
    * keys (bounded event counts), not raw unbounded entities, at
    * corpus scale. All comparisons are on the integer `order`
    * column — engine-exact. Returns (keys..., t0..t{n−1}).
    */
  def funnel(events: DataFrame, keys: Seq[String], order: Column,
             stage: Column, stages: Seq[String]): DataFrame =
    funnel(events, keys, order, stage, stages, within = None)

  /** [[funnel]] with a conversion window (ClickHouse `windowFunnel`
    * semantics): every later stage must land within `within` of the
    * FIRST stage's time — tₖ also requires tₖ ≤ t₀ + within. Same
    * single-scan plan; the bound is one more integer predicate in the
    * array walk.
    */
  def funnel(events: DataFrame, keys: Seq[String], order: Column,
             stage: Column, stages: Seq[String],
             within: Option[Long]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(
      keys.map(col) :+ order.as("__t") :+ stage.cast("string").as("__s"): _*)
    // when() with no otherwise yields null for non-matching rows, and
    // collect_list drops nulls — each list holds exactly its stage's
    // times, ascending.
    val listAggs = stages.zipWithIndex.map { case (st, i) =>
      sort_array(collect_list(when(col("__s") === st, col("__t")))).as(s"__l$i")
    }
    var acc = base.groupBy(keys.map(col): _*)
      .agg(listAggs.head, listAggs.tail: _*)
      .withColumn("t0", get(col("__l0"), lit(0))) // null on empty list
    for (i <- 1 until stages.size) {
      val prev = col(s"t${i - 1}")
      val eligible = within match {
        case None => filter(col(s"__l$i"), x => x > prev)
        case Some(w) =>
          filter(col(s"__l$i"), x => x > prev && x <= col("t0") + lit(w))
      }
      acc = acc.withColumn(s"t$i",
        when(prev.isNotNull, get(eligible, lit(0))))
    }
    acc.select(keys.map(col) ++ stages.indices.map(i => col(s"t$i")): _*)
  }

  /** Banded interval join: points (keys, t) ⋈ intervals (keys, lo,
    * hi) where lo ≤ t ≤ hi, WITHOUT the range-theta join Spark would
    * otherwise plan as a broadcast nested loop (quadratic per key):
    * each interval explodes into its covered fixed-width band buckets
    * (`⌊lo/w⌋..⌊hi/w⌋`), each point lives in exactly ONE bucket, and
    * the equi-join on (keys, bucket) + the exact range filter
    * reproduces the predicate — the standard banding decomposition
    * (the same shape as the LSH/pigeonhole joins and public interval
    * libraries). A (point, interval) match joins in exactly one
    * bucket, so no dedup pass is needed. `bandUs` is a layout
    * constant: pick ≈ the median interval length — too small
    * explodes long intervals into many bucket rows, too large packs
    * unrelated rows into shared buckets; both ends degrade cost,
    * never correctness. All bucket arithmetic is integral division
    * (engine-exact). Returns point columns + the interval's columns.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   keys: Seq[String], t: Column, lo: Column, hi: Column,
                   bandUs: Long): DataFrame = {
    require(bandUs > 0, "intervalJoin: bandUs must be positive")
    def bucket(c: Column) = call_function("div", c.cast("long"), lit(bandUs))
    val iv = intervals.withColumn("__b",
      explode(sequence(bucket(lo), bucket(hi))))
    val pt = points.withColumn("__b", bucket(t))
    pt.join(iv, keys :+ "__b")
      .filter(t.between(lo, hi))
      .drop("__b")
  }

  /** Salted two-stage sum for skewed keys (hot symbols at 100 TB):
    * stage 1 aggregates on (keys, salt) spreading a hot key over
    * `saltBuckets` reducers; stage 2 merges the partials on the true
    * key. Use when AQE skew handling isn't enough (e.g. a single key
    * holding >1 executor's worth of rows). The salt is a content hash
    * of the whole row, so partials (and thus double-summation order)
    * are stable across partition layouts — reruns of the same data
    * bit-agree even for doubles; exact duplicates of one row land in
    * one bucket, which only matters if a single key is dominated by
    * copies of a single identical row.
    */
  def saltedSum(df: DataFrame, keys: Seq[Column], value: Column,
                saltBuckets: Int, resultName: String = "sum"): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong))
    df.groupBy((keys :+ salt.as("__salt")): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(resultName))
  }
}
