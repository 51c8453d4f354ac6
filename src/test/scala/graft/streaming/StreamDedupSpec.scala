package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact-once dedup via `dropDuplicatesWithinWatermark` —
  * the streaming twin of the reference's first-write-wins PK inserts
  * (ST4): replayed WS frames and at-least-once upstream retries
  * collapse to one row while the key is inside the watermark, with
  * state evicted after it passes (bounded by the delay window, not
  * history — the property that lets dedup state survive an unbounded
  * stream).
  */
class StreamDedupSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val t0 = 1629294300000L

  private def ev(off: Long, id: Long, v: Double) =
    (id, new java.sql.Timestamp(t0 + off), v)

  test("duplicate event ids inside the watermark emit exactly once") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = in.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(ev(0, 1L, 10.0), ev(1000, 1L, 10.0), ev(2000, 2L, 20.0))
      q.processAllAvailable()
      // replay of id 1 in a later batch, still inside the watermark
      in.addData(ev(3000, 1L, 10.0))
      q.processAllAvailable()
      val got = spark.table("dedup").collect()
        .map(r => r.getLong(0)).sorted
      assert(got.toSeq === Seq(1L, 2L), "each id must appear exactly once")
    } finally q.stop()
  }
}
