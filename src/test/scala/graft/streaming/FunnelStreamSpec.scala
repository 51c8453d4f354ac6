package graft.streaming

import graft.SparkSpec
import graft.ops.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[FunnelStream.closedFunnels]] — strict-ordered reach per closed
  * session: out-of-order arrivals fold in event-time order, the
  * strict-after rule matches the batch operator, and closed sessions
  * emit exactly once.
  */
class FunnelStreamSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val t0 = 1629294300000L
  private val stages = Seq("view", "click", "purchase")

  private def ev(off: Long, user: Long, s: String) =
    (user, new java.sql.Timestamp(t0 + off), s)

  test("closed sessions emit ordered reach; out-of-order arrivals fold by event time") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("user_id", "ts", "et")
    val q = FunnelStream.closedFunnels(df, col("user_id"), "ts", col("et"),
        stages, gap = "5 minutes", delay = "2 minutes")
      .writeStream.format("memory").queryName("funnels").outputMode("append").start()
    try {
      // user 1: click ARRIVES before the view but is event-time AFTER
      // it — the funnel must order by event time, not arrival.
      // user 2: click event-time BEFORE its view — strict ordering
      // rejects it even though a purchase follows.
      in.addData(ev(120000, 1L, "click"), ev(0, 1L, "view"),
        ev(180000, 1L, "purchase"))
      in.addData(ev(0, 2L, "click"), ev(60000, 2L, "view"),
        ev(120000, 2L, "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnels").count() === 0, "open sessions must not emit")

      in.addData(ev(3000000, 1L, "view"), ev(3000000, 2L, "view")) // push watermark
      q.processAllAvailable()
      val rows = spark.table("funnels").collect()
        .map(r => r.getAs[Long]("key") ->
          ((Option(r.getAs[java.sql.Timestamp]("t0")).map(_.getTime - t0),
            Option(r.getAs[java.sql.Timestamp]("t1")).map(_.getTime - t0),
            Option(r.getAs[java.sql.Timestamp]("t2")).map(_.getTime - t0)))).toMap
      assert(rows(1L) === ((Some(0L), Some(120000L), Some(180000L))),
        "event-time order must repair the out-of-order arrival")
      assert(rows(2L) === ((Some(60000L), None, None)),
        "a click event-time before the view must not count; null propagates")
    } finally q.stop()
  }

  test("streaming funnel ≡ batch funnel on the same closed sessions") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // random multi-session traffic for 6 users: bursts of events with
    // occasional > gap spacing so several sessions close per user
    val all = (0 until 6).flatMap { u =>
      var t = u * 1000L
      (0 until 40).map { _ =>
        t += (if (rnd.nextInt(10) == 0) 400000L else rnd.nextInt(60000).toLong)
        (u.toLong, new java.sql.Timestamp(t0 + t),
          stages(rnd.nextInt(stages.size)))
      }
    }
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("user_id", "ts", "et")
    // the shuffle spreads arrivals across the whole hour, so the
    // watermark delay must cover that disorder or late rows drop
    val q = FunnelStream.closedFunnels(df, col("user_id"), "ts", col("et"),
        stages, gap = "5 minutes", delay = "2 hours")
      .writeStream.format("memory").queryName("funnels_par").outputMode("append").start()
    try {
      val (a, b) = rnd.shuffle(all).splitAt(all.size / 2) // arrival ≠ event order
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      // close everything
      in.addData((99L, new java.sql.Timestamp(t0 + 100000000L), "view"))
      q.processAllAvailable()
      val stream = spark.table("funnels_par")
        .filter(col("key") =!= 99L)
        .select(col("key"), col("session_start"), col("t0"), col("t1"), col("t2"))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4)))
        .toSet

      // batch: same sessions (inclusive-gap parity is already pinned
      // by SessionizerSpec), then Analytics.funnel per session, with
      // session_start = min event ts to align the keys
      val batch = all.toDF("user_id", "ts", "et")
        .withColumn("tus", unix_micros(col("ts")))
      val sess = Analytics.sessionize(batch, Seq(col("user_id")), col("tus"),
        col("et"), 300L * 1000000L)
      val f = Analytics.funnel(sess, Seq("user_id", "session_id"),
        col("tus"), col("et"), stages)
      val starts = sess.groupBy(col("user_id"), col("session_id"))
        .agg(min(col("tus")).as("start_us"))
      def tsOf(c: org.apache.spark.sql.Column) =
        (c / 1000000L).cast("timestamp")
      val batchSet = f.join(starts, Seq("user_id", "session_id"))
        .select(col("user_id"), tsOf(col("start_us")),
          tsOf(col("t0")), tsOf(col("t1")), tsOf(col("t2")))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4)))
        .toSet
      assert(stream === batchSet,
        s"streaming closed-session funnels must equal the batch operator's")
    } finally q.stop()
  }

  test("windowed streaming funnel ≡ windowed batch funnel on the same sessions") {
    val stages = Seq("view", "click", "purchase")
    val rnd = new scala.util.Random(11)
    val all = (0 until 6).flatMap { u =>
      var t = u * 1000L
      (0 until 40).map { _ =>
        t += (if (rnd.nextInt(10) == 0) 400000L else rnd.nextInt(60000).toLong)
        (u.toLong, new java.sql.Timestamp(t0 + t),
          stages(rnd.nextInt(stages.size)))
      }
    }
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("user_id", "ts", "et")
    val q = FunnelStream.closedFunnels(df, col("user_id"), "ts", col("et"),
        stages, gap = "5 minutes", delay = "2 hours",
        within = Some(expr("INTERVAL 90 SECONDS")))
      .writeStream.format("memory").queryName("funnels_win").outputMode("append").start()
    try {
      val (a, b) = rnd.shuffle(all).splitAt(all.size / 2)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData((99L, new java.sql.Timestamp(t0 + 100000000L), "view"))
      q.processAllAvailable()
      val stream = spark.table("funnels_win")
        .filter(col("key") =!= 99L)
        .select(col("key"), col("session_start"), col("t0"), col("t1"), col("t2"))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4)))
        .toSet
      val batch = all.toDF("user_id", "ts", "et")
        .withColumn("tus", unix_micros(col("ts")))
      val sess = Analytics.sessionize(batch, Seq(col("user_id")), col("tus"),
        col("et"), 300L * 1000000L)
      val f = Analytics.funnel(sess, Seq("user_id", "session_id"),
        col("tus"), col("et"), stages, within = Some(90L * 1000000L))
      val starts = sess.groupBy(col("user_id"), col("session_id"))
        .agg(min(col("tus")).as("start_us"))
      def tsOf(c: org.apache.spark.sql.Column) =
        (c / 1000000L).cast("timestamp")
      val batchSet = f.join(starts, Seq("user_id", "session_id"))
        .select(col("user_id"), tsOf(col("start_us")),
          tsOf(col("t0")), tsOf(col("t1")), tsOf(col("t2")))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4)))
        .toSet
      assert(stream === batchSet,
        "windowed streaming funnels must equal the windowed batch operator")
      // the bound is live: at least one session converts unbounded but
      // not within 90s (otherwise this test proves nothing)
      val unbounded = Analytics.funnel(sess, Seq("user_id", "session_id"),
        col("tus"), col("et"), stages)
      assert(unbounded.filter(col("t1").isNotNull).count() >
        f.filter(col("t1").isNotNull).count(),
        "fixture must contain conversions outside the window")
    } finally q.stop()
  }
}
