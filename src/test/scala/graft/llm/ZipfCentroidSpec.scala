package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CorpusStats.zipfFit]] and [[Similarity.centroidMatrix]] — closed
  * forms on constructed fixtures.
  */
class ZipfCentroidSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("zipfFit recovers an exact power law slope") {
    // counts c = 24/rank (24, 12, 8, 6) put every (ln rank, ln c)
    // point EXACTLY on the line y = ln 24 − x, so OLS must recover
    // slope −1 and intercept ln 24 to float precision.
    val words = Seq("aa" -> 24, "bb" -> 12, "cc" -> 8, "dd" -> 6)
    val text = words.map { case (w, n) => Seq.fill(n)(w).mkString(" ") }.mkString(" ")
    val docs = Seq(("s1", text)).toDF("src", "text")
    val row = CorpusStats.zipfFit(docs, col("src"), col("text"), topN = 10)
      .collect().head
    assert(row.getString(0) === "s1")
    assert(row.getLong(1) === 4L)
    assert(math.abs(row.getDouble(2) - (-1.0)) < 1e-12)     // slope
    assert(math.abs(row.getDouble(3) - math.log(24.0)) < 1e-12) // intercept ln 24
  }

  test("zipfFit ranks ties deterministically and respects topN") {
    // five types, equal counts → flat line, slope 0; topN=3 keeps 3
    val docs = Seq(("s1", "aa bb cc dd ee")).toDF("src", "text")
    val row = CorpusStats.zipfFit(docs, col("src"), col("text"), topN = 3)
      .collect().head
    assert(row.getLong(1) === 3L)
    assert(math.abs(row.getDouble(2)) < 1e-12)
    assert(math.abs(row.getDouble(3)) < 1e-12) // counts 1 → ln 1 = 0
  }

  test("centroidMatrix: orthogonal, identical, and opposite groups") {
    val pts = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(3.0f, 0.0f)),   // centroid (2, 0)
      ("b", Seq(0.0f, 2.0f)),                            // centroid (0, 2)
      ("c", Seq(4.0f, 0.0f)),                            // centroid (4, 0) ∥ a
      ("d", Seq(-1.0f, 0.0f))                            // centroid (−1, 0) anti ∥ a
    ).toDF("g", "v")
    val got = Similarity.centroidMatrix(pts, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      .sortBy(t => (t._1, t._2)).toList
    assert(got.map(t => (t._1, t._2)) ===
      List("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d"))
    val m = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(m("a" -> "b")) < 1e-12)          // orthogonal
    assert(math.abs(m("a" -> "c") - 1.0) < 1e-12)    // parallel
    assert(math.abs(m("a" -> "d") + 1.0) < 1e-12)    // anti-parallel
  }

  test("centroidMatrix is deterministic across repartitioning") {
    val pts = (0 until 60).map { i =>
      (s"g${i % 3}", Seq.tabulate(4)(j => (math.sin(i * 7 + j) * 10).toFloat))
    }.toDF("g", "v")
    val a = Similarity.centroidMatrix(pts, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    val b = Similarity.centroidMatrix(pts.repartition(13), col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(a.map(t => (t._1, t._2)) === b.map(t => (t._1, t._2)))
    a.zip(b).foreach { case (x, y) => assert(math.abs(x._3 - y._3) < 1e-9) }
  }
}
