package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TimeSeries.m4Downsample]] — the 4-point-per-bucket chart
  * reduction (Jugel et al., VLDB'14), hand-checked.
  */
class M4Spec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def run(rows: Seq[(Long, Long)], width: Long) =
    TimeSeries.m4Downsample(
      rows.map { case (t, c) => ("k", t, c) }.toDF("key", "t", "c"),
      col("key"), col("t"), col("c"), width)
      .orderBy("b", "t", "c")
      .select("b", "t", "c").as[(Long, Long, Long)].collect().toSeq

  test("distinct first/min/max/last survive; everything else drops") {
    // one 10-wide bucket: first=(0,5), min=(1,1), max=(2,9), last=(3,3)
    val out = run(Seq((0L, 5L), (1L, 1L), (2L, 9L), (3L, 3L)), 10L)
    assert(out == Seq((0L, 0L, 5L), (0L, 1L, 1L), (0L, 2L, 9L), (0L, 3L, 3L)))

    // a 5th interior point is not an extreme — dropped
    val out2 = run(Seq((0L, 5L), (1L, 1L), (2L, 9L), (3L, 3L), (4L, 4L)), 10L)
    assert(out2 == Seq((0L, 0L, 5L), (0L, 1L, 1L), (0L, 2L, 9L), (0L, 4L, 4L)))
  }

  test("coinciding roles dedup: monotone bucket yields 2 points, singleton 1") {
    // monotone: first=min=(0,1), last=max=(2,3)
    assert(run(Seq((0L, 1L), (1L, 2L), (2L, 3L)), 10L) ==
      Seq((0L, 0L, 1L), (0L, 2L, 3L)))
    assert(run(Seq((7L, 42L)), 10L) == Seq((0L, 7L, 42L)))
  }

  test("tied extreme values keep the EARLIEST point; buckets split on width") {
    // bucket 0: min value 1 at t=1 and t=3 → keep (1,1) only (plus
    // first (0,9)=max and last (4,2))
    val out = run(Seq((0L, 9L), (1L, 1L), (3L, 1L), (4L, 2L),
      (12L, 7L)), 10L)
    assert(out == Seq((0L, 0L, 9L), (0L, 1L, 1L), (0L, 4L, 2L), (10L, 12L, 7L)))
  }

  test("reduction is exact on a random series: every bucket extreme is present") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val out = run(rows, 100L)
    val byB = rows.groupBy(_._1 / 100 * 100)
    byB.foreach { case (b, rs) =>
      val pts = out.filter(_._1 == b).map(p => (p._2, p._3)).toSet
      assert(pts.contains(rs.minBy(_._1)) && pts.contains(rs.maxBy(_._1)),
        s"bucket $b must keep its first/last points")
      assert(pts.exists(_._2 == rs.map(_._2).min) &&
        pts.exists(_._2 == rs.map(_._2).max),
        s"bucket $b must keep its value extremes")
      assert(pts.size <= 4)
    }
  }
}
