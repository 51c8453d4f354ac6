package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.semanticDedup]] — SemDeDup-style cluster-then-prune:
  * exact copies are dropped, the most-central representative of a
  * semantic group survives, and dissimilar items are untouched.
  */
class SemanticDedupSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // Two well-separated directions in R^4 so 2-means recovers them
  // regardless of init; within-group vectors are near-parallel.
  private val pts = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),   // cos to id 0 ≈ 0.99995
    (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 0.98f, 0.02f)),   // cos to id 2 ≈ 0.9998
    (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),     // orthogonal to both groups
    (5L, Seq(1.0f, 0.0f, 0.0f, 0.0f))      // exact copy of id 0
  ).toDF("id", "v")

  private def run(tau: Double): Map[Long, (Int, Boolean)] =
    Similarity.semanticDedup(pts, col("id"), col("v"), k = 2, iters = 5, tau)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number]("cell").intValue(), r.getBoolean(2))))
      .toMap

  test("exact copies and near-parallel vectors collapse to one representative at tau=0.95") {
    val got = run(0.95)
    assert(got.size === 6)
    // ids 0/1/5 are one semantic group, 2/3 another; exactly one
    // survivor per group, the dissimilar id 4 always survives
    val kept = got.filter(_._2._2).keySet
    assert(kept.contains(4L))
    assert((kept & Set(0L, 1L, 5L)).size === 1)
    assert((kept & Set(2L, 3L)).size === 1)
    // every dropped item shares a cell with some kept item (the
    // representative it collapsed into is cluster-local)
    got.filter(!_._2._2).foreach { case (_, (cell, _)) =>
      assert(got.exists { case (_, (c, k)) => k && c == cell })
    }
  }

  test("tau above every pairwise cosine keeps everything") {
    val got = run(1.1)
    assert(got.values.forall(_._2), s"nothing may drop at tau>1: $got")
  }

  test("deterministic across repartitioning") {
    val shuffled = pts.repartition(7)
    val a = Similarity.semanticDedup(pts, col("id"), col("v"), 2, 5, 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    val b = Similarity.semanticDedup(shuffled, col("id"), col("v"), 2, 5, 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(a === b)
  }
}
