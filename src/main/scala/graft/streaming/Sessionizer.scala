package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the event-time twin of the
  * batch [[graft.ops.Analytics.sessionize]] — on Spark's built-in
  * `session_window` (merging event-time windows + watermark state,
  * SURVEY §2.9 ST-family).
  *
  * A session is the maximal run of a key's events where each is
  * < `gap` after the previous; the state store merges windows as
  * events arrive (out-of-order within the watermark included) and a
  * session row emits exactly once, when the watermark passes its
  * close — so downstream gets closed sessions append-only, the same
  * contract as closed candles. State per key is one interval + the
  * aggregates, evicted at emit: bounded by live (not historical)
  * sessions, which is what lets it run against an unbounded stream
  * where the batch operator would need the whole history in one sort.
  *
  * Boundary semantics match the batch operator exactly: Spark merges
  * ADJACENT session windows, so an event at exactly `prev + gap`
  * stays in the same session — the same inclusive rule as
  * `Analytics.sessionize(maxGap = gap)`. spec:SessionizerSpec pins
  * the boundary on both operators and full parity off it.
  */
object Sessionizer {

  /** Closed sessions per key: (key, session start/end, n_events,
    * total of `value`). `ts` must be an event-time timestamp column
    * name; `delay` is the out-of-orderness bound.
    */
  def closedSessions(df: DataFrame, key: Column, tsCol: String,
                     value: Column, gap: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap).as("sw"), key.as("key"))
      .agg(count(lit(1)).as("n_events"), sum(value).as("total"))
      .select(col("key"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total"))
}
