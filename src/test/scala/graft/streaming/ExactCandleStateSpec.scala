package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TestGroupState
import org.apache.spark.api.java.Optional

class ExactCandleStateSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._
  import ExactCandleState._

  private val t0 = 1629294300000L // minute-aligned
  private val key = ("bitfinex", "BTC", "USD")

  private def ws(tsOff: Long, c: Double, v: Double) =
    WsCandle(t0 + tsOff, "bitfinex", "BTC", "USD", c, c + 1, c - 1, c, v)

  test("transition: latest-wins within bucket, flush all-but-latest") {
    val st = TestGroupState.create[KeyState](
      optionalState = Optional.empty[KeyState](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    // two updates of bucket A, then one of bucket B -> A flushes with latest values
    val out = transition(key, Iterator(ws(0, 100, 1), ws(5000, 102, 2), ws(60000, 110, 5)), st, 3600000L).toList
    assert(out.map(c => (c.time_ms, c.close, c.volume)) == List((t0, 102.0, 2.0)))
    assert(st.get.buckets.keySet == Set(t0 + 60000)) // open bucket retained
  }

  test("transition: out-of-order older message cannot overwrite") {
    val st = TestGroupState.create[KeyState](Optional.empty[KeyState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty[Long](), hasTimedOut = false)
    transition(key, Iterator(ws(5000, 102, 2)), st, 3600000L).toList
    transition(key, Iterator(ws(1000, 999, 9)), st, 3600000L).toList
    assert(st.get.buckets(t0).close == 102.0)
  }

  test("transition: timeout force-flushes the open candle") {
    val st = TestGroupState.create[KeyState](
      Optional.of(KeyState(Map(t0 -> Candle(t0, t0 + 5000, 100, 101, 99, 100.5, 2.0)))),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty[Long](), hasTimedOut = true)
    val out = transition(key, Iterator.empty, st, 3600000L).toList
    assert(out.map(c => (c.time_ms, c.close)) == List((t0, 100.5)))
    assert(st.isRemoved)
  }

  test("streaming end-to-end: closed candle emitted when next bucket arrives") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[WsCandle]
    val q = ExactCandleState.closedCandles(in.toDS(), holdMs = 0L)
      .writeStream.format("memory").queryName("exact_closed").outputMode("append").start()
    try {
      in.addData(ws(0, 100, 1), ws(10000, 103, 3))
      q.processAllAvailable()
      assert(spark.table("exact_closed").count() == 0)
      in.addData(ws(60000, 110, 5))
      q.processAllAvailable()
      val rows = spark.table("exact_closed").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("time_ms") == t0)
      assert(rows.head.getAs[Double]("close") == 103.0)
    } finally q.stop()
  }
}
