package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series operators re-expressing the reference's TimescaleDB
  * semantics Spark-first (SURVEY.md §2.4/§2.5/§2.8).
  *
  * All bucket math is explicit epoch-microsecond arithmetic so the
  * bucket origin is controlled by us, not by an engine default:
  * TimescaleDB aligns multi-day buckets to 2000-01-03 while Spark's
  * `window()` aligns to 1970-01-01 (reference
  * scripts/database/init/create.sql:105-223). Integer floor-division on
  * µs gives identical results in any engine, which is also what the
  * DuckDB oracles use.
  *
  * Scale note: `candleRollup` is a single hash-aggregate keyed on
  * (keys..., bucket) — one shuffle, map-side partial aggregation free
  * from Catalyst. At 100 TB the input should be partitioned by a date
  * column so the scan prunes, but the operator itself needs nothing
  * extra.
  */
object TimeSeries {
  /** TimescaleDB `time_bucket(width, ts, origin)`
    * (reference scripts/database/init/create.sql:107,122,137), backed
    * by the native codegen expression [[graft.functions.TimeBucket]]
    * (floor division — correct for pre-origin timestamps too).
    */
  def timeBucket(ts: Column, widthSec: Long, originEpochSec: Long = 0L): Column =
    graft.functions.TimeBucket.timeBucket(ts, widthSec, originEpochSec)

  /** OHLCV candle rollup — the reference workload's core operator
    * (SURVEY A1; reference schemas/aggregations.sql:11-22, the 8
    * continuous aggregates create.sql:105-223).
    *
    * Input must be unique per (keys..., timeCol) — the reference's PK
    * guarantees this; use [[graft.core.Tables.eventSeries]]-style dedup
    * first (SURVEY §7.4 risk 3). `min_by`/`max_by` give TimescaleDB
    * `first(x, time)`/`last(x, time)` semantics exactly.
    */
  def candleRollup(
      df: DataFrame,
      timeCol: Column,
      keys: Seq[Column],
      value: Column,
      widthSec: Long,
      originEpochSec: Long = 0L,
      volume: Option[Column] = None): DataFrame =
    df.groupBy((keys :+ timeBucket(timeCol, widthSec, originEpochSec).as("bucket")): _*)
      .agg(
        min_by(value, timeCol).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, timeCol).as("close"),
        sum(volume.getOrElse(value)).as("volume"),
        count(lit(1)).as("n"))
}
