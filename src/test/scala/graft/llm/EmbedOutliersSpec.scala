package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.embedOutliers]] — per-cell distance z-scores: the
  * planted far point scores high in ITS cell, tight-cluster members
  * score low, and a single-member cell scores exactly 0.
  */
class EmbedOutliersSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // Two clusters in R^3 plus one planted outlier near cluster 1 and
  // one isolated point far from everything.
  private val pts = Seq(
    (0L, Seq(10.0f, 0.0f, 0.0f)),
    (1L, Seq(10.2f, 0.0f, 0.0f)),
    (2L, Seq(9.8f, 0.0f, 0.0f)),
    (3L, Seq(10.0f, 0.2f, 0.0f)),
    (4L, Seq(0.0f, 10.0f, 0.0f)),
    (5L, Seq(0.0f, 10.2f, 0.0f)),
    (6L, Seq(0.0f, 9.8f, 0.0f)),
    (7L, Seq(14.0f, 0.0f, 0.0f))   // straggler of cluster around x≈10
  ).toDF("id", "v")

  test("planted straggler has the max z in its cell; z has per-cell mean ~0") {
    val got = Similarity.embedOutliers(pts, col("id"), col("v"), k = 2, iters = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).intValue(),
        r.getDouble(2), r.getDouble(3)))
    assert(got.length === 8)
    val byCell = got.groupBy(_._2)
    // the straggler (id 7) scores the cell's max z, and clearly positive
    val cell7 = got.find(_._1 == 7L).get._2
    val zs7 = byCell(cell7)
    assert(zs7.maxBy(_._4)._1 === 7L)
    assert(got.find(_._1 == 7L).get._4 > 1.0)
    // z-scores are centered per cell (mean 0 by construction)
    byCell.values.foreach { cell =>
      assert(math.abs(cell.map(_._4).sum / cell.size) < 1e-9)
    }
  }

  test("single-member cell scores z = 0 and dist to its own centroid 0") {
    val single = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.1f, 0.0f)),
      (2L, Seq(0.0f, 50.0f))  // far solo point → its own cell
    ).toDF("id", "v")
    val got = Similarity.embedOutliers(single, col("id"), col("v"), k = 2, iters = 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    // the solo point IS its centroid after convergence
    assert(math.abs(got(2L)._1) < 1e-9)
    assert(got(2L)._2 === 0.0)
  }

  test("deterministic across repartitioning") {
    val a = Similarity.embedOutliers(pts, col("id"), col("v"), 2, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1).toSeq
    val b = Similarity.embedOutliers(pts.repartition(5), col("id"), col("v"), 2, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1).toSeq
    assert(a === b)
  }
}
