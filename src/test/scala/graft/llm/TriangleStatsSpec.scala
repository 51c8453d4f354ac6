package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** [[GraphOps.triangleStats]] on hand-built graphs: one triangle plus
  * a square (cycle, zero triangles) plus a pendant — every count
  * checked against the blackboard, direction/duplicate noise in the
  * input must not change anything.
  */
class TriangleStatsSpec extends SparkSpec {

  private def stats(edges: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    GraphOps.triangleStats(edges.toDF("id_a", "id_b"),
      col("id_a"), col("id_b")).head()
  }

  test("triangle + square + pendant: counts match the blackboard") {
    // triangle {1,2,3}; pendant 3-8; square 4-5-6-7-4 (no triangle)
    val r = stats(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 8L),
      (4L, 5L), (5L, 6L), (6L, 7L), (4L, 7L)))
    assert(r.getAs[Long]("n_nodes") === 8L)
    assert(r.getAs[Long]("n_edges") === 8L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    // degrees: 2,2,3,1,2,2,2,2 → wedges = 1+1+3+0+1+1+1+1 = 9
    assert(r.getAs[Long]("n_wedges") === 9L)
    assert(math.abs(r.getAs[Double]("gcc") - 3.0 / 9.0) < 1e-12)
  }

  test("K4: every wedge closes (gcc = 1), duplicates and reversed pairs ignored") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    // add reversed + duplicate noise: triangleStats filters x<y and distincts
    val noisy = k4 ++ k4.map { case (a, b) => (b, a) } ++ k4.take(2)
    val r = stats(noisy)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Long]("n_wedges") === 12L)
    assert(r.getAs[Double]("gcc") === 1.0)
  }

  test("star has wedges but no triangles: gcc = 0") {
    val r = stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Long]("n_wedges") === 6L)
    assert(r.getAs[Double]("gcc") === 0.0)
  }
}
