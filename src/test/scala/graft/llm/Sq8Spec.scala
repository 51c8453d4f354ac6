package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.sq8TopK]] — int8 scalar quantization + exact rerank. */
class Sq8Spec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // deterministic pseudo-random vectors (LCG), dim 8
  private def vec(seed: Long, dim: Int = 8): Seq[Float] = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    (0 until dim).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 40).toDouble / (1L << 24).toDouble - 0.5).toFloat
    }
  }

  private def corpus(n: Int) =
    (0L until n.toLong).map(i => (i, vec(i))).toDF("vec_id", "embedding")

  test("full-width rerank reproduces brute-force exactly (quantization only cuts candidates)") {
    val df = corpus(60)
    val brute = Similarity.bruteForceTopK(df, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sq = Similarity.sq8TopK(df, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, k = 10, rerank = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sq.toSeq === brute.toSeq)
  }

  test("narrow rerank keeps high recall on smooth cosine structure") {
    val df = corpus(60)
    val brute = Similarity.bruteForceTopK(df, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val sq = Similarity.sq8TopK(df, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, k = 10, rerank = 20)
      .collect().map(_.getLong(0)).toSet
    // SQ8 on dim-8 vectors: ≥ 8/10 of the true top-10 must survive a
    // 20-candidate cut (observed exact on this fixture; bound is slack
    // for the rounding-sensitive tail)
    assert((sq & brute).size >= 8)
  }

  test("codes stay within int8 range and a zero vector is safe") {
    val df = (Seq((0L, Seq(0.5f, -1.0f, 0.25f, 0f, 0f, 0f, 0f, 1.0f)),
      (1L, Seq.fill(8)(0f)),
      (2L, Seq(0.5f, -1.0f, 0.25f, 0f, 0f, 0f, 0f, 0.9f))))
      .toDF("vec_id", "embedding")
    // zero vector must neither crash (scale 0 division) nor rank first
    val got = Similarity.sq8TopK(df, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, k = 2, rerank = 2)
      .collect().map(_.getLong(0))
    assert(got.head === 2L)
  }
}
