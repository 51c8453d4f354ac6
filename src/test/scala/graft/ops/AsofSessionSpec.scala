package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TimeSeries.asofJoin]] and [[Analytics.sessionize]] semantics.
  * The as-of reference model is the naive range-join + per-row max
  * (exactly the O(|L|·|R|) plan the operator exists to avoid), run on
  * small frames where the blow-up is harmless.
  */
class AsofSessionSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def asof(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Double)]) = {
    val left = l.toDF("event_id", "k", "t")
    val right = r.toDF("k", "t", "v")
    TimeSeries.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .select("event_id", "k", "t", "v", "asof_t")
      .collect().map(x => (x.getLong(0),
        Option(x.get(3)).map(_.asInstanceOf[Double]),
        Option(x.get(4)).map(_.asInstanceOf[Long]))).toSet
  }

  test("asofJoin: inclusive match, carry-forward, and no-match nulls") {
    val got = asof(
      l = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 12L), (4L, 2L, 7L)),
      r = Seq((1L, 5L, 1.5), (1L, 11L, 2.5), (2L, 8L, 9.0)))
    assert(got === Set(
      (1L, Some(1.5), Some(5L)),   // equal timestamp matches (inclusive)
      (2L, Some(1.5), Some(5L)),   // carried forward past t=5
      (3L, Some(2.5), Some(11L)),  // newest at-or-before wins
      (4L, None, None)))           // right row is later -> no match
  }

  test("asofJoin: keys never cross and every left row survives") {
    val got = asof(
      l = Seq((1L, 1L, 100L), (2L, 2L, 100L), (3L, 3L, 100L)),
      r = Seq((1L, 1L, 1.0), (2L, 99L, 2.0)))
    assert(got === Set(
      (1L, Some(1.0), Some(1L)), (2L, Some(2.0), Some(99L)), (3L, None, None)))
  }

  test("asofJoin agrees with the naive range-join reference on a dense fixture") {
    val left = (1L to 200L).map(i => (i, i % 5, i * 3 % 97)).toDF("event_id", "k", "t")
    val right = (1L to 80L).map(i => (i % 5, i * 7 % 89, i * 1.0)).toDF("k", "t", "v")
      .groupBy("k", "t").agg(max("v").as("v")) // unique per (k, t)
    val fast = TimeSeries.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .select("event_id", "v", "asof_t")
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("l.t") >= col("r.t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id")).orderBy(col("r.t").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("v"), col("r.t").as("asof_t"))
    assert(fast.collect().toSet === naive.collect().toSet)
  }

  test("sessionize: gap threshold splits sessions per key, ids contiguous from 1") {
    val df = Seq(
      (1L, 0L, 10L), (2L, 0L, 20L), (3L, 0L, 200L), (4L, 0L, 205L), (5L, 0L, 500L),
      (6L, 9L, 10L), (7L, 9L, 1000L)
    ).toDF("event_id", "k", "t")
    val got = Analytics.sessionize(df, Seq(col("k")), col("t"), col("event_id"), 100L)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L,
      6L -> 1L, 7L -> 2L))
  }

  test("sessionize: equal timestamps share a session regardless of tiebreak order") {
    val df = Seq((1L, 0L, 50L), (2L, 0L, 50L), (3L, 0L, 50L), (4L, 0L, 51L))
      .toDF("event_id", "k", "t")
    val sessions = Analytics.sessionize(df, Seq(col("k")), col("t"), col("event_id"), 0L)
      .select("session_id").collect().map(_.getLong(0)).toSet
    // gap 0 <= maxGap keeps ties together; the t=51 row breaks (gap 1 > 0)
    assert(sessions === Set(1L, 2L))
  }
}
