package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.knnJoin]] / [[Similarity.ivfKnnJoin]] /
  * [[Similarity.annRecall]] — batch retrieval on a fixture whose
  * geometry is hand-checkable: axis-aligned clusters where the IVF
  * route is exact for in-cluster queries, plus a deliberately
  * mis-binned point that makes recall drop below 1.
  */
class KnnJoinSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // Two orthogonal clusters along e1 and e2 (cells 0 and 1), plus a
  // point stored in cell 1 but pointing along e1 (id 5): the exact
  // top-k for an e1 query includes it, the cell-0 IVF scan misses it.
  private val pts = Seq(
    (0L, 0, Seq(1.0f, 0.0f, 0.0f)),   // query (id % 2 == 0 is NOT the pred here)
    (1L, 0, Seq(0.9f, 0.1f, 0.0f)),
    (2L, 0, Seq(0.8f, 0.2f, 0.0f)),
    (3L, 1, Seq(0.0f, 1.0f, 0.0f)),
    (4L, 1, Seq(0.1f, 0.9f, 0.0f)),
    (5L, 1, Seq(0.95f, 0.05f, 0.0f))  // e1-aligned but stored in cell 1
  ).toDF("id", "cell", "v")

  private val qPred = col("id") === 0L

  test("knnJoin returns the exact cosine top-k per query") {
    val got = Similarity.knnJoin(pts, col("id"), col("v"), qPred, k = 3)
      .orderBy(col("sim").desc, col("id"))
      .select(col("id")).as[Long].collect().toSeq
    // cos to e1: id5 (.998) > id1 (.994) > id2 (.970) > id4 > id3
    assert(got === Seq(5L, 1L, 2L))
  }

  test("ivfKnnJoin scans only the routed cell") {
    val got = Similarity.ivfKnnJoin(pts, col("id"), col("cell"), col("v"),
        qPred, k = 3)
      .orderBy(col("sim").desc, col("id"))
      .collect()
    assert(got.map(_.getAs[Int]("picked_cell")).toSet === Set(0))
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 2L)) // id5 invisible: wrong cell
  }

  test("annRecall counts the misses the cell route causes") {
    val m = Similarity.annRecall(pts, col("id"), col("cell"), col("v"),
        qPred, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // truth = {5, 1, 2}; approx = {1, 2} → 2 hits of 3
    assert(m(0L)._1 === 2L)
    assert(math.abs(m(0L)._2 - 2.0 / 3) < 1e-12)
  }

  test("multi-query: every query row gets its own neighborhood") {
    val multi = Similarity.knnJoin(pts, col("id"), col("v"),
        col("id") < 2L, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // q0 (e1): top-2 of {2..5} = {5, 2}; q1 (.9,.1): {5, 2}
    assert(multi === Set((0L, 5L), (0L, 2L), (1L, 5L), (1L, 2L)))
  }

  test("deterministic across input partitioning") {
    val a = Similarity.annRecall(pts, col("id"), col("cell"), col("v"), qPred, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.annRecall(pts.repartition(7), col("id"), col("cell"),
        col("v"), qPred, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
