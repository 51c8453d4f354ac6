package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Similarity.mmrRerank]] — Maximal Marginal Relevance. Pins: the
  * first pick is the most query-similar candidate; a near-duplicate
  * of the first pick is DEMOTED below a diverse-but-relevant item
  * (the defining MMR behavior); λ = 1 degenerates to pure relevance
  * order; k > candidates stops at the candidate count; the rel
  * column carries the query cosine unchanged.
  */
class MmrRerankSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // query (id 0) along e1; id 1 nearly parallel to the query, id 2 a
  // near-copy of id 1, id 3 diverse (45° toward e2), id 4 anti-aligned
  private val pts = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.99f, 0.1f, 0.0f)),
    (2L, Seq(0.98f, 0.11f, 0.0f)),
    (3L, Seq(0.7f, 0.0f, 0.7f)),
    (4L, Seq(-1.0f, 0.05f, 0.0f)))

  test("near-duplicate of the top pick is demoted below a diverse candidate") {
    val got = Similarity.mmrRerank(pts.toDF("id", "v"), $"id", $"v",
        $"id" === 0L, nCandidates = 4, k = 3, lambda = 0.5d)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    // pure relevance would give 1, 2, 3 — MMR must skip the near-copy 2
    assert(got === Seq(1L, 3L, 2L))
  }

  test("lambda = 1 is pure relevance order") {
    val got = Similarity.mmrRerank(pts.toDF("id", "v"), $"id", $"v",
        $"id" === 0L, nCandidates = 4, k = 4, lambda = 1.0d)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L, 4L))
  }

  test("k beyond the candidate page stops at the page; rel is the query cosine") {
    val out = Similarity.mmrRerank(pts.toDF("id", "v"), $"id", $"v",
        $"id" === 0L, nCandidates = 4, k = 4, lambda = 0.5d)
      .orderBy($"rank").collect()
    assert(out.length === 4)
    val rel1 = out.find(_.getLong(1) == 1L).get.getDouble(2)
    assert(math.abs(rel1 - 0.99 / math.sqrt(0.99 * 0.99 + 0.1 * 0.1)) < 1e-6)
    // ranks are 1..n with strictly assigned order
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
  }
}
