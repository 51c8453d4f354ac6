package graft.streaming

import graft.SparkSpec
import graft.ops.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizerSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val t0 = 1629294300000L // 2021-08-18 13:45:00 UTC

  private def ev(off: Long, user: Long, v: Double) =
    (user, new java.sql.Timestamp(t0 + off), v)

  test("streaming sessions close only when the watermark passes the gap") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Sessionizer.closedSessions(df, col("user_id"), "ts", col("value"),
        gap = "5 minutes", delay = "1 minute")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      in.addData(ev(0, 1L, 10.0), ev(60000, 1L, 20.0))   // one open session
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0, "open session must not emit")

      // 20 minutes later: watermark passes session end -> emit once
      in.addData(ev(1200000, 1L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getAs[Long]("key") === 1L)
      assert(r.getAs[java.sql.Timestamp]("session_start").getTime === t0)
      // session end = last event + gap
      assert(r.getAs[java.sql.Timestamp]("session_end").getTime === t0 + 60000 + 300000)
      assert(r.getAs[Long]("n_events") === 2L)
      assert(r.getAs[Double]("total") === 30.0)
    } finally q.stop()
  }

  test("out-of-order events within the watermark merge into their session") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Sessionizer.closedSessions(df, col("user_id"), "ts", col("value"),
        gap = "5 minutes", delay = "10 minutes")
      .writeStream.format("memory").queryName("sessions_ooo").outputMode("append").start()
    try {
      in.addData(ev(0, 1L, 1.0), ev(240000, 1L, 1.0)) // 0s and 240s
      q.processAllAvailable()
      in.addData(ev(120000, 1L, 1.0))                 // late row lands between them
      q.processAllAvailable()
      in.addData(ev(3600000, 1L, 1.0))                // push watermark far ahead
      q.processAllAvailable()
      val r = spark.table("sessions_ooo").orderBy("session_start").first()
      assert(r.getAs[Long]("n_events") === 3L, "late in-watermark row must merge")
    } finally q.stop()
  }

  test("batch/stream boundary parity: exact-gap event stays in-session in BOTH") {
    // Spark merges ADJACENT session windows, so prev+gap does not split
    val batchDf = Seq(ev(0, 1L, 1.0), ev(300000, 1L, 1.0)).toDF("user_id", "ts", "value")
    val viaWindow = batchDf
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .count().collect()
    assert(viaWindow.length === 1, "session_window: prev+gap merges (adjacent windows)")
    // batch sessionize: diff == maxGap stays in the same session too
    val sess = Analytics.sessionize(
        batchDf.withColumn("tus", unix_micros(col("ts"))),
        Seq(col("user_id")), col("tus"), col("value"), 300000000L)
      .select("session_id").distinct().count()
    assert(sess === 1L, "sessionize: diff == maxGap keeps the session")
    // one microsecond past the gap splits in both
    val batchDf2 = Seq(ev(0, 1L, 1.0), ev(300001, 1L, 1.0)).toDF("user_id", "ts", "value")
    assert(batchDf2.groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .count().collect().length === 2)
    assert(Analytics.sessionize(
        batchDf2.withColumn("tus", unix_micros(col("ts"))),
        Seq(col("user_id")), col("tus"), col("value"), 300000000L)
      .select("session_id").distinct().count() === 2L)
  }

  test("batch parity away from boundaries: same sessions from both operators") {
    val rows = Seq(
      ev(0, 1L, 1.0), ev(60000, 1L, 1.0), ev(1000000, 1L, 1.0),
      ev(0, 2L, 1.0), ev(2000000, 2L, 1.0))
    val batchDf = rows.toDF("user_id", "ts", "value")
    val viaWindow = batchDf
      .groupBy(session_window(col("ts"), "5 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start").as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    val viaSessionize = Analytics.sessionize(
        batchDf.withColumn("tus", unix_micros(col("ts"))),
        Seq(col("user_id")), col("tus"), col("value"), 300000000L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("tus")).as("start_tus"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2) / 1000L, r.getLong(3))).toSet
    assert(viaWindow === viaSessionize)
  }
}
