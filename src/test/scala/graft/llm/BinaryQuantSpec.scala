package graft.llm

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** [[Similarity.signBitTopK]] — sign-bit signatures and the
  * Hamming-candidates → exact-rerank recall properties.
  */
class BinaryQuantSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("signBits64 packs exactly the component signs, 32 bits per word") {
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
    val (w0, w1) = Similarity.signBits64(col("embedding"))
    val r = df.select(w0.as("w0"), w1.as("w1")).head()
    val expect0 = (0 until 32).filter(_ % 3 == 0).map(1L << _).sum
    val expect1 = (32 until 64).filter(_ % 3 == 0).map(i => 1L << (i - 32)).sum
    assert(r.getLong(0) === expect0 && r.getLong(1) === expect1)
    assert(r.getLong(0) < (1L << 32) && r.getLong(1) < (1L << 32),
      "words must stay below 2^32 (cross-engine shift discipline)")
  }

  test("identical vectors have Hamming 0 and surface first; recall vs exact is high") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, 10)
      .select("id").as[Long].collect().toSet
    val got = Similarity.signBitTopK(emb, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, candidates = 50, k = 10)
      .collect()
    assert(got.length === 10)
    // sign quantization keeps most of the true neighborhood: at 50
    // candidates over the test corpus the top-10 overlap is high
    val ids = got.map(_.getAs[Long]("id")).toSet
    assert((ids intersect exact).size >= 5,
      s"recall collapsed: got $ids vs exact $exact")
    // hamming is consistent: every returned candidate's ham <= 64 of
    // the corpus maximum 128, and rerank ordering is by exact cosine
    val sims = got.map(_.getAs[Double]("sim")).toSeq
    assert(sims === sims.sorted.reverse, "rerank must order by exact cosine desc")
  }
}
