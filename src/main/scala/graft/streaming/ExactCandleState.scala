package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact stateful reproduction of the reference updater's
  * closed-candle semantics (SURVEY ST2/ST3 fallback;
  * reference fetchers/ws/updater.py:150-192):
  *
  *  - per key, 1-minute buckets accumulate updates, latest message
  *    (by ts_ms) wins within a bucket;
  *  - whenever a newer bucket exists, every older bucket is flushed
  *    ("insert all except the latest, still-open candle");
  *  - a key stuck with a single candle past the hold threshold is
  *    force-flushed via processing-time timeout
  *    (DATA_HELD_MLS_THRESHOLD = 1 h, updater.py:30).
  *
  * The watermark version ([[CandleStream.closedCandles]]) is the
  * declarative default; this one matches the reference exactly,
  * including the force-flush of a still-open candle. State per key is
  * a handful of buckets — bounded, partitioned by key hash.
  */
object ExactCandleState {

  case class Candle(bucketMs: Long, lastTsMs: Long, open: Double, high: Double,
                    low: Double, close: Double, volume: Double)

  case class Closed(time_ms: Long, exchange: String, base_id: String,
                    quote_id: String, open: Double, high: Double, low: Double,
                    close: Double, volume: Double)

  case class KeyState(buckets: Map[Long, Candle])

  /** Core transition, exposed for direct unit testing with
    * TestGroupState.
    */
  def transition(key: (String, String, String), rows: Iterator[WsCandle],
                 state: GroupState[KeyState], holdMs: Long): Iterator[Closed] = {
    val prior = state.getOption.map(_.buckets).getOrElse(Map.empty)
    val updated = rows.foldLeft(prior) { (m, w) =>
      val b = w.ts_ms / 60000L * 60000L
      val c = Candle(b, w.ts_ms, w.open, w.high, w.low, w.close, w.volume)
      m.get(b) match {
        // latest message wins (guard new_ts >= current_ts, ws/bitfinex.py:202-217)
        case Some(old) if old.lastTsMs > w.ts_ms => m
        case _ => m.updated(b, c)
      }
    }
    def emit(c: Candle): Closed =
      Closed(c.bucketMs, key._1, key._2, key._3, c.open, c.high, c.low,
        c.close, c.volume)

    if (state.hasTimedOut) {
      // force-flush everything held too long (updater.py:171-176)
      state.remove()
      updated.values.toSeq.sortBy(_.bucketMs).map(emit).iterator
    } else if (updated.isEmpty) {
      state.remove()
      Iterator.empty
    } else {
      val latest = updated.keys.max
      val (closed, open) = updated.partition(_._1 < latest)
      state.update(KeyState(open))
      if (holdMs > 0) state.setTimeoutDuration(holdMs)
      closed.values.toSeq.sortBy(_.bucketMs).map(emit).iterator
    }
  }

  /** Streaming entry point. `holdMs <= 0` disables the force-flush
    * timeout (NoTimeout) — with ProcessingTimeTimeout the micro-batch
    * engine keeps scheduling empty batches to check timers, which is
    * correct in production but makes processAllAvailable-style test
    * drains spin; the timeout branch itself is unit-tested via
    * TestGroupState.
    */
  def closedCandles(ds: Dataset[WsCandle], holdMs: Long = 3600000L): Dataset[Closed] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val conf = if (holdMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    ds.groupByKey(w => (w.exchange, w.base_id, w.quote_id))
      .flatMapGroupsWithState(OutputMode.Append, conf)(
        (k: (String, String, String), rows: Iterator[WsCandle], st: GroupState[KeyState]) =>
          transition(k, rows, st, holdMs))
  }
}
