package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("forwardFillDaily fills variable-length runs up to the next bucket") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-04 00:00:00"), 20.0),
    ).toDF("k", "bucket", "close")
    val out = Analytics.forwardFillDaily(df, Seq(col("k")), col("bucket"),
        Seq("close" -> col("close")), lit("2024-01-05 00:00:00").cast("timestamp"))
      .orderBy(col("day"))
      .collect().map(r => (r.getTimestamp(2).toString, r.getDouble(1)))
    assert(out.toSeq == Seq(
      "2024-01-01 00:00:00.0" -> 10.0, "2024-01-02 00:00:00.0" -> 10.0,
      "2024-01-03 00:00:00.0" -> 10.0, // carried to next bucket − 1 day
      "2024-01-04 00:00:00.0" -> 20.0, "2024-01-05 00:00:00.0" -> 20.0))
  }

  test("forwardFillDaily: last bucket after upTo contributes nothing (no ANSI crash)") {
    // oracle parity: generate_series(start > stop) is empty, so a key
    // whose newest data is past the as-of emits no fill rows for it,
    // while rows with a successor still fill to that successor even
    // past upTo (upTo only bounds the open-ended last run)
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-03 00:00:00"), 2.0), // has successor past upTo
      ("a", ts("2024-01-06 00:00:00"), 3.0), // last, after upTo → dropped
    ).toDF("k", "bucket", "close")
    val out = Analytics.forwardFillDaily(df, Seq(col("k")), col("bucket"),
        Seq("close" -> col("close")), lit("2024-01-02 00:00:00").cast("timestamp"))
      .orderBy(col("day"))
      .collect().map(r => (r.getTimestamp(2).toString, r.getDouble(1)))
    assert(out.toSeq == Seq(
      "2024-01-01 00:00:00.0" -> 1.0, "2024-01-02 00:00:00.0" -> 1.0,
      "2024-01-03 00:00:00.0" -> 2.0, "2024-01-04 00:00:00.0" -> 2.0,
      "2024-01-05 00:00:00.0" -> 2.0))
  }

  test("geoMeanDailyReturn survives data newer than the as-of") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 100.0),
      ("a", ts("2024-01-02 00:00:00"), 110.0),
      ("a", ts("2024-01-09 00:00:00"), 120.0), // after asOf 2024-01-05
    ).toDF("k", "bucket", "close")
    val r = Analytics.geoMeanDailyReturn(df, Seq(col("k")), col("bucket"),
        col("close"), lit("2024-01-05 00:00:00").cast("timestamp"))
      .collect()
    assert(r.length == 1) // no SparkArithmeticException from sequence()
  }

  test("funnel: strict stage ordering, null propagation, out-of-order rejected") {
    // session A: view(10) -> click(20) -> purchase(30): full funnel.
    // session B: click(5) BEFORE view(10), purchase(20) after view:
    //   t0=10, click-after-view never happens -> t1 null -> t2 null
    //   even though a purchase exists (strict ordered-funnel).
    // session C: view only. session D: same-timestamp view+click
    //   (strict > rejects the tie).
    val rows = Seq(
      ("a", 10L, "view"), ("a", 20L, "click"), ("a", 30L, "purchase"),
      ("b", 5L, "click"), ("b", 10L, "view"), ("b", 20L, "purchase"),
      ("c", 10L, "view"),
      ("d", 10L, "view"), ("d", 10L, "click"))
      .toDF("sess", "t", "et")
    val f = Analytics.funnel(rows, Seq("sess"), col("t"), col("et"),
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[String]("sess") ->
        ((Option(r.get(r.fieldIndex("t0"))), Option(r.get(r.fieldIndex("t1"))),
          Option(r.get(r.fieldIndex("t2")))))).toMap
    assert(f("a") === ((Some(10L), Some(20L), Some(30L))))
    assert(f("b") === ((Some(10L), None, None)),
      "a click before the view must not count; null must propagate past the purchase")
    assert(f("c") === ((Some(10L), None, None)))
    assert(f("d") === ((Some(10L), None, None)),
      "same-timestamp stages are not strictly ordered")
  }

  test("windowed funnel: later stages only count within `within` of t0") {
    val rows = Seq(
      // a: click at t0+15 inside the 20-window; purchase outside it
      ("a", 10L, "view"), ("a", 25L, "click"), ("a", 100L, "purchase"),
      // b: first click beyond the window, a LATER in-window click
      //    cannot exist (times only grow) -> t1 null, t2 null
      ("b", 10L, "view"), ("b", 40L, "click"), ("b", 45L, "purchase"),
      // c: full chain inside the window
      ("c", 10L, "view"), ("c", 12L, "click"), ("c", 20L, "purchase"))
      .toDF("sess", "t", "et")
    val f = Analytics.funnel(rows, Seq("sess"), col("t"), col("et"),
        Seq("view", "click", "purchase"), within = Some(20L))
      .collect().map(r => r.getAs[String]("sess") ->
        ((Option(r.get(r.fieldIndex("t0"))), Option(r.get(r.fieldIndex("t1"))),
          Option(r.get(r.fieldIndex("t2")))))).toMap
    assert(f("a") === ((Some(10L), Some(25L), None)),
      "the purchase at t0+90 must fall outside the 20-tick window")
    assert(f("b") === ((Some(10L), None, None)))
    assert(f("c") === ((Some(10L), Some(12L), Some(20L))),
      "t = t0 + within is inclusive")
  }

  test("intervalJoin: banding reproduces BETWEEN exactly, one row per match") {
    // intervals spanning multiple band buckets, point intervals,
    // boundary-inclusive matches, cross-key isolation
    val iv = Seq(
      ("u1", 0L, 100L, 250L),   // spans buckets 1..2 at w=100
      ("u1", 1L, 400L, 400L),   // point interval
      ("u2", 0L, 0L, 1000L))    // long interval, another key
      .toDF("k", "iid", "lo", "hi")
    val pts = Seq(
      ("u1", 100L), ("u1", 250L),  // boundary-inclusive both ends
      ("u1", 175L),                 // interior, bucket 1
      ("u1", 399L), ("u1", 400L), ("u1", 401L), // around the point interval
      ("u1", 999L),                 // matches nothing for u1
      ("u2", 999L))                 // long-interval match on u2
      .toDF("k", "t")
    val got = Analytics.intervalJoin(pts, iv, Seq("k"),
        col("t"), col("lo"), col("hi"), bandUs = 100L)
      .select("k", "t", "iid").as[(String, Long, Long)].collect().sorted.toSeq
    val naive = pts.join(iv, Seq("k")).filter(col("t").between(col("lo"), col("hi")))
      .select("k", "t", "iid").as[(String, Long, Long)].collect().sorted.toSeq
    assert(got === naive, "banded join must equal the naive range join")
    assert(got === Seq(("u1", 100L, 0L), ("u1", 175L, 0L), ("u1", 250L, 0L),
      ("u1", 400L, 1L), ("u2", 999L, 0L)))
    assert(got.size === got.distinct.size, "exactly one row per (point, interval) match")
  }
}
