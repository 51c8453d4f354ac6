package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.hardNegatives]] — near-dup-excluded k-NN. */
class HardNegativesSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // query 0 = e0; candidates: 1 = exact copy of e0 (same cluster),
  // 2 = e0 rotated slightly (different cluster — the hard negative),
  // 3 = orthogonal, 4 = copy of 2 clustered WITH 2
  private val vecs = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0.9f, 0.1f, 0f, 0f)),
    (3L, Seq(0f, 0f, 1f, 0f)),
    (4L, Seq(0.9f, 0.1f, 0f, 0f)))

  private val clusters = Seq((0L, 0L), (1L, 0L), (2L, 2L), (4L, 2L))
    .toDF("id", "label")

  test("same-cluster copies are excluded; the near-miss survives as top negative") {
    val got = Similarity.hardNegatives(vecs.toDF("vec_id", "v"),
        col("vec_id"), col("v"), col("vec_id") === 0L, clusters, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val ids = got.map(_._1).toSeq
    assert(!ids.contains(1L), "the query's own duplicate leaked in")
    // both members of cluster 2 are valid negatives (not MY cluster)
    assert(ids.take(2).toSet === Set(2L, 4L))
    assert(ids.last === 3L)
  }

  test("ids absent from the cluster frame are singletons, not dropped") {
    val got = Similarity.hardNegatives(vecs.toDF("vec_id", "v"),
        col("vec_id"), col("v"), col("vec_id") === 0L,
        Seq.empty[(Long, Long)].toDF("id", "label"), k = 5)
      .collect().map(_.getLong(1)).toSeq
    // with no clusters, this is plain k-NN: everything returns
    assert(got.toSet === Set(1L, 2L, 3L, 4L))
  }
}
