package graft.ingest

/** Exchange-faithful REST paging + flow control for [[Backfill]]
  * (S3/S4/ST11). [[Backfill.dayTasks]] splits a range into uniform
  * day tasks — right for Bittrex, whose candle endpoint is addressed
  * by calendar day (fetchers/rest/bittrex.py day tasks), but wrong
  * for Bitfinex and Binance, which page by a row-limit cursor: each
  * response advances the cursor to
  * `max(last_row_ts, start + 60000 * limit)` and the loop re-queues
  * until the cursor passes the range end
  * (fetchers/rest/bitfinex.py:357-490, binance.py:455-560 — the
  * "Why increment start_date_mls by 60000 * OHLCV_LIMIT" comment).
  *
  * The cursor walk runs *inside* one task's `fetch`, so the
  * distribution story is unchanged: tasks (symbol × range) fan out
  * across partitions, each executor walks its own cursors serially —
  * exactly the reference's asyncio-consumer-per-params model with
  * partitions in place of the Redis to-fetch set.
  */
object RestCursors {

  type Candle = (Long, Double, Double, Double, Double, Double)

  /** One HTTP page: rows from `startMs` (at most `limit`), for the
    * given section ("hist" | "last" — Bitfinex URL shape; Binance
    * callers ignore it). Tests inject a deterministic one; production
    * wraps the HTTP client.
    */
  trait PageFetcher extends Serializable {
    def fetchPage(t: Backfill.Task, startMs: Long, limit: Int, section: String): Seq[Candle]
  }

  /** Bitfinex OHLCV_LIMIT (fetchers/rest/bitfinex.py:36). */
  val BitfinexLimit = 9500
  /** Binance OHLCV_LIMIT (fetchers/rest/binance.py:42). */
  val BinanceLimit = 1000
  /** Binance DEFAULT_WEIGHT_LIMIT per 60 s (binance.py:43). */
  val BinanceWeightLimit = 1200
  /** Throttler request rates per 60 s window
    * (fetchers/config/constants.py:10-17).
    */
  val BitfinexRatePerMin = 85
  val BittrexRatePerMin = 55

  /** Bitfinex cursor pager: hist section while `asOf − start > 60 s`,
    * else the `last` endpoint (make_ohlcv_url, bitfinex.py:123-161);
    * cursor advance is the reference's exact rule — jump to the last
    * returned timestamp if it moved, else skip a whole
    * `60000 × limit` window (also on empty/error pages, so one dead
    * symbol can't wedge the walk). Note the reference's re-fetch
    * overlap: restarting *at* the last timestamp refetches that
    * candle; the first-write-wins sink dedupes it, and we keep the
    * same behavior rather than "fixing" it.
    */
  def bitfinex(page: PageFetcher, asOfMs: Long,
               limit: Int = BitfinexLimit,
               limiter: Gcra = new Gcra(BitfinexRatePerMin)): Backfill.Fetcher =
    cursorFetcher(page, limit, beforeRequest = _ => limiter.acquire(),
      section = start => if (asOfMs - start > 60000L) "hist" else "last")

  /** Wrap any [[Backfill.Fetcher]] so each task fetch first conforms
    * to a shared [[Gcra]] limiter — the Bittrex path, where one
    * day-task is one HTTP request (fetchers/rest/bittrex.py fetches
    * throttle through the same GCRARateLimiter as Bitfinex, at
    * 55 req/min).
    */
  def throttled(inner: Backfill.Fetcher, limiter: Gcra): Backfill.Fetcher =
    new Backfill.Fetcher {
      def fetch(t: Backfill.Task): Seq[Candle] = {
        limiter.acquire()
        inner.fetch(t)
      }
    }

  /** Binance cursor pager: same advance rule with limit=1000, every
    * klines request charged 1 unit against the shared weight budget
    * before it is issued (rw_manager.acheck(1), binance.py:376).
    */
  def binance(page: PageFetcher, budget: WeightBudget,
              limit: Int = BinanceLimit): Backfill.Fetcher =
    cursorFetcher(page, limit, beforeRequest = _ => budget.check(1),
      section = _ => "hist")

  private def cursorFetcher(page: PageFetcher, limit: Int,
                            beforeRequest: Backfill.Task => Unit,
                            section: Long => String): Backfill.Fetcher =
    new Backfill.Fetcher {
      def fetch(t: Backfill.Task): Seq[Candle] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Candle]
        var start = t.startMs
        while (start < t.endMs) {
          beforeRequest(t)
          val rows = page.fetchPage(t, start, limit, section(start))
            .filter(r => r._1 >= start && r._1 < t.endMs)
          if (rows.nonEmpty) {
            out ++= rows
            val last = rows.iterator.map(_._1).max
            start = if (last > start) last else start + 60000L * limit
          } else start += 60000L * limit
        }
        // the cursor-restart overlap refetches the page-boundary row;
        // dedup here so `fetch` keeps the Fetcher contract (the sink
        // would drop it anyway — ON CONFLICT DO NOTHING, queries.py:4)
        out.distinct.toSeq
      }
    }

  /** GCRA ("leaky bucket as a meter") request limiter — the
    * reference's GCRARateLimiter (fetchers/utils/ratelimit.py:14-95)
    * with the Redis TAT cell as a field: the limiter tracks one
    * theoretical-arrival-time; a request conforms when
    * `now >= max(tat, now) + increment − period` (increment =
    * period/rate), and a grant advances tat by one increment. Unlike
    * [[WeightBudget]]'s fixed window, GCRA spreads grants evenly at
    * steady state while allowing an initial burst of up to `rate`
    * requests — the shape exchange 429 policies expect.
    *
    * `acquire()` mirrors `wait()` (ratelimit.py:80-88): loop on the
    * conformance test, sleeping exactly the non-conforming remainder.
    * Clock and sleeper are injectable so specs assert throttling
    * without wall-clock waits.
    *
    * Scale note (same as [[WeightBudget]]): the reference shares the
    * TAT cell across fetcher instances via Redis under a lock; here
    * each executor deserializes its own limiter, so size `rate` as
    * (exchange budget ÷ concurrent executors). The `synchronized`
    * block is the single-JVM stand-in for that Redis lock.
    */
  class Gcra(rate: Double, periodSec: Double = 60.0,
             clock: () => Double = () => System.nanoTime() / 1e9,
             sleeper: Double => Unit = s => Thread.sleep(math.max(0L, (s * 1000).toLong)))
      extends Serializable {
    require(rate > 0 && periodSec > 0, s"degenerate GCRA rate=$rate period=$periodSec")
    private val increment = periodSec / rate
    private var tat = Double.NaN

    /** One conformance test: None = granted, Some(retryAfter) =
      * limited (ratelimit.py:52-76 `_is_limited`).
      */
    def tryAcquire(): Option[Double] = synchronized {
      val t = clock()
      val base = if (tat.isNaN) t else math.max(tat, t)
      val allowedAt = base + increment - periodSec
      if (t >= allowedAt) { tat = base + increment; None }
      else Some(allowedAt - t)
    }

    /** Block (via `sleeper`) until a request conforms. */
    def acquire(): Unit = {
      var limited = tryAcquire()
      while (limited.isDefined) {
        sleeper(limited.get)
        limited = tryAcquire()
      }
    }
  }

  /** The reference's RequestWeightManager (binance.py:54-155) without
    * the Redis hop: a fixed-window weight pool of `limit` units per
    * `periodSec`; `check(w)` debits when enough remain, else sleeps
    * out the window remainder and retries. Clock and sleeper are
    * injectable so specs assert throttling without wall-clock waits.
    *
    * Scale note: the reference shares one pool across workers via
    * Redis; here each executor deserializes its own pool, so size
    * `limit` as (exchange budget ÷ concurrent executors) — the same
    * division the reference does implicitly by consuming from one
    * Redis set.
    *
    * Concurrency note: `check` sleeps while HOLDING the monitor, so
    * threads sharing one pool serialize through the wait — the
    * intended semantics (the reference's RequestWeightManager is a
    * single asyncio consumer; a drained pool means nobody may
    * proceed), but it makes one pool per requesting thread-group the
    * right deployment shape, not one pool per JVM shared by unrelated
    * work.
    */
  class WeightBudget(limit: Int = BinanceWeightLimit, periodSec: Double = 60.0,
                     clock: () => Double = () => System.nanoTime() / 1e9,
                     sleeper: Double => Unit = s => Thread.sleep(math.max(0L, (s * 1000).toLong)))
      extends Serializable {
    private var windowStart = Double.NaN
    private var remaining = limit

    def check(weight: Int): Unit = synchronized {
      var granted = false
      while (!granted) {
        val now = clock()
        if (windowStart.isNaN) windowStart = now
        // reset the pool if the period has elapsed (binance.py:103-107)
        if (now - windowStart > periodSec) { windowStart = now; remaining = limit }
        if (remaining >= weight) { remaining -= weight; granted = true }
        else sleeper(periodSec - (now - windowStart)) // binance.py:113-118
      }
    }
  }
}
