package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[CandleStream.repairJoin]]: the stream–stream left-outer join of
  * live candles with the REST repair stream. Asserts the three load-
  * bearing properties: repaired rows carry the repair's values,
  * unmatched rows emit unchanged after the watermark closes their
  * bucket (append-only — nothing retracts), and the join state is
  * bounded by the watermark (eviction observable in progress metrics).
  */
class StreamRepairJoinSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val t0 = 1629294300000L // 2021-08-18 13:45:00 UTC, minute-aligned

  private def ws(tsOff: Long, c: Double, v: Double, key: String = "BTC") =
    WsCandle(t0 + tsOff, "bitfinex", key, "USD", c, c + 1, c - 1, c, v)

  test("repair row overrides live values; unmatched rows emit unchanged after watermark") {
    implicit val sc = spark.sqlContext
    val live = MemoryStream[WsCandle]
    val rep = MemoryStream[WsCandle]
    val q = CandleStream.repairJoin(live.toDF(), rep.toDF(), delay = "2 minutes")
      .writeStream.format("memory").queryName("repaired").outputMode("append").start()
    try {
      // bucket A (13:45) live + repair; bucket B (13:46) live only
      live.addData(ws(0, 100.0, 1.0), ws(60000, 200.0, 2.0))
      rep.addData(ws(1000, 111.0, 9.0))
      q.processAllAvailable()
      // MATCHED rows emit immediately (inner results never wait);
      // only the unmatched bucket is held for the watermark
      assert(spark.table("repaired").count() === 1)
      assert(spark.table("repaired").first().getAs[Boolean]("repaired"))

      // advance BOTH watermarks past 13:47 (join output waits on the
      // slower side: min(watermarks) must pass the bucket end)
      live.addData(ws(360000, 300.0, 3.0, key = "ETH"))
      rep.addData(ws(360000, 301.0, 4.0, key = "LTC"))
      q.processAllAvailable()
      val rows = spark.table("repaired")
        .filter($"base_id" === "BTC").orderBy($"time").collect()
      assert(rows.length === 2)
      val a = rows(0); val b = rows(1)
      assert(a.getAs[java.sql.Timestamp]("time").getTime === t0)
      assert(a.getAs[Boolean]("repaired") && a.getAs[Double]("close") === 111.0
        && a.getAs[Double]("volume") === 9.0, "matched bucket must carry repair values")
      assert(b.getAs[java.sql.Timestamp]("time").getTime === t0 + 60000)
      assert(!b.getAs[Boolean]("repaired") && b.getAs[Double]("close") === 200.0,
        "unmatched bucket must flow through unchanged")
    } finally q.stop()
  }

  test("duplicate repair rows for one bucket emit each live message once, not once per repair") {
    implicit val sc = spark.sqlContext
    val live = MemoryStream[WsCandle]
    val rep = MemoryStream[WsCandle]
    val q = CandleStream.repairJoin(live.toDF(), rep.toDF(), delay = "2 minutes")
      .writeStream.format("memory").queryName("dedup_rep").outputMode("append").start()
    try {
      live.addData(ws(0, 100.0, 1.0))
      // the REST repair path re-fetches: same bucket repaired twice
      rep.addData(ws(1000, 111.0, 9.0), ws(2000, 222.0, 8.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_rep").collect()
      assert(rows.length === 1, s"append-only output double-counted: ${rows.toSeq}")
      assert(rows.head.getAs[Double]("close") === 111.0, "first repair wins")
    } finally q.stop()
  }

  test("join state is watermark-bounded: old buckets evict as time advances") {
    implicit val sc = spark.sqlContext
    val live = MemoryStream[WsCandle]
    val rep = MemoryStream[WsCandle]
    val q = CandleStream.repairJoin(live.toDF(), rep.toDF(), delay = "1 minutes")
      .writeStream.format("memory").queryName("bounded").outputMode("append").start()
    try {
      live.addData((0 until 20).map(i => ws(i * 60000L, 100.0 + i, 1.0)): _*)
      rep.addData(ws(0, 111.0, 9.0))
      q.processAllAvailable()
      val grown = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // push both watermarks far past every buffered bucket
      live.addData(ws(7200000, 999.0, 1.0))
      rep.addData(ws(7200000, 999.0, 1.0))
      q.processAllAvailable()
      live.addData(ws(7260000, 999.5, 1.0))
      rep.addData(ws(7260000, 999.5, 1.0))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after < grown,
        s"state never evicted: $grown -> $after rows (watermark must bound the join)")
      // append-only sanity: every pre-horizon live row emitted exactly once
      assert(spark.table("bounded").filter($"base_id" === "BTC"
        && $"time" < timestamp_millis(lit(t0 + 7200000L))).count() === 20)
    } finally q.stop()
  }
}
