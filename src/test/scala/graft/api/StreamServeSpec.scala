package graft.api

import graft.SparkSpec
import graft.streaming.CandleStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.net.http.{HttpClient, WebSocket}
import java.time.Duration
import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

/** End-to-end streaming→serving: live candle messages flow through
  * [[CandleStream.latestServeView]] into a complete-mode memory sink,
  * and [[OhlcvHttpServer]]'s WS cadence pushes serve whatever the
  * stream currently holds — a newer message through the stream shows
  * up in subsequent pushes without reconnecting. This is the
  * reference's WS path (exchange feed → Redis latest candle →
  * WSSender) with Spark-native parts in each role.
  */
class StreamServeSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val t0 = 1629294300000L

  // raw wire-shaped candle message (ts_ms + keys + ohlcv)
  private def msg(off: Long, c: Double) =
    (t0 + off, "bitfinex", "BTC", "USD", c, c + 1, c - 1, c, 2.0)

  test("WS pushes track the live latest-candle view across stream updates") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, String, String, Double, Double, Double, Double, Double)]
    val df = in.toDF().toDF("ts_ms", "exchange", "base_id", "quote_id",
      "open", "high", "low", "close", "volume")
    val q = CandleStream.latestServeView(df)
      .writeStream.format("memory").queryName("latest_serve")
      .outputMode("complete").start()
    val srv = new OhlcvHttpServer(
      OhlcvHttpServer.forLatestView(spark, "latest_serve"),
      cadenceMsOverride = Some(150L)).start()
    try {
      in.addData(msg(0, 100.0))
      q.processAllAvailable()

      val msgs = new LinkedBlockingQueue[String]()
      val listener = new WebSocket.Listener {
        private val buf = new StringBuilder
        override def onText(ws: WebSocket, data: CharSequence,
                            last: Boolean): CompletionStage[_] = {
          buf.append(data)
          if (last) { msgs.put(buf.toString); buf.clear() }
          ws.request(1)
          null
        }
      }
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .connectTimeout(Duration.ofSeconds(5))
        .buildAsync(java.net.URI.create(srv.wsAddress + "/api/ws/ohlcvs"), listener)
        .get(10, TimeUnit.SECONDS)
      ws.sendText(
        """{"event_type":"subscribe","data_type":"ohlcv","exchange":"bitfinex",
          |"base_id":"BTC","quote_id":"USD","interval":"1m","mls":true}""".stripMargin,
        true)
      val p1 = msgs.poll(5, TimeUnit.SECONDS)
      assert(p1 != null && p1.contains(s""""time":$t0""") && p1.contains(""""close":100.0"""),
        s"first push should carry the seeded candle: $p1")

      // a newer live message through the STREAM must surface in later
      // pushes on the SAME subscription
      in.addData(msg(60000, 205.0))
      q.processAllAvailable()
      var updated: String = null
      val deadline = System.nanoTime() + 8L * 1000000000L
      while (updated == null && System.nanoTime() < deadline) {
        val m = msgs.poll(1, TimeUnit.SECONDS)
        if (m != null && m.contains(""""close":205.0""")) updated = m
      }
      assert(updated != null && updated.contains(s""""time":${t0 + 60000}"""),
        "pushes must reflect the stream's newest candle without reconnecting")
      ws.sendClose(WebSocket.NORMAL_CLOSURE, "done")
    } finally {
      srv.stop()
      q.stop()
    }
  }
}
