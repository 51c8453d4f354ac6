package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Tables.events]] schema adaptivity — the driver's testdata has
  * shipped `events.ts` as INT64 nanos (read as Long via nanosAsLong)
  * AND as timestamp[us] (NTZ); a loader pinned to either physical
  * type broke every events query when the other arrived (round-9
  * bench died exactly this way). Pins: all three encodings produce
  * the same `ts` instants and µs-consistent `ts_ns`.
  */
class EventsLoaderSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // one sub-µs-precision instant and one exact-second instant
  private val ns = Seq(1700000000123456789L, 1700000100000000000L)

  private def dir(tag: String) = s"/tmp/graft_events_loader_$tag"

  private def writeFixtures(): Unit = {
    val base = ns.zipWithIndex
      .map { case (t, i) => (i.toLong, "e", t, 1.0d, i.toLong) }
      .toDF("event_id", "event_type", "ts", "value", "user_id")
    // (a) nanos-as-long: ts is a plain INT64 nanosecond epoch
    base.write.mode("overwrite").parquet(dir("nanos") + "/events.parquet")
    // (b) µs TimestampType (isAdjustedToUTC=true)
    base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.mode("overwrite").parquet(dir("us") + "/events.parquet")
    // (c) µs TIMESTAMP_NTZ — the driver's pyarrow layout (no tz)
    base.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(dir("ntz") + "/events.parquet")
  }

  private def load(tag: String) =
    Tables.events(spark, dir(tag))
      .select(col("event_id"), col("ts"), col("ts_ns"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1).getTime, r.getLong(2))))
      .toMap

  test("all three physical encodings agree on ts and on µs-truncated ts_ns") {
    writeFixtures()
    val (a, b, c) = (load("nanos"), load("us"), load("ntz"))
    assert(a.keySet === b.keySet && b.keySet === c.keySet)
    a.keySet.foreach { k =>
      assert(a(k)._1 === b(k)._1, s"ts mismatch nanos-vs-us for $k")
      assert(b(k) === c(k), s"us-vs-ntz mismatch for $k")
      // the µs encodings can only differ from raw nanos below 1 µs
      assert(a(k)._2 / 1000L * 1000L === b(k)._2, s"ts_ns µs-mismatch for $k")
    }
  }

  test("nanos path preserves full sub-µs precision in ts_ns") {
    writeFixtures()
    assert(load("nanos").values.map(_._2).toSeq.sorted === ns.sorted)
  }

  test("ts type is session-zone TimestampType under every encoding") {
    writeFixtures()
    Seq("nanos", "us", "ntz").foreach { tag =>
      val dt = Tables.events(spark, dir(tag)).schema("ts").dataType
      assert(dt === org.apache.spark.sql.types.TimestampType, s"encoding $tag")
    }
  }
}
