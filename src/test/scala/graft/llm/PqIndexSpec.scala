package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[PqIndex]] build-once/probe-many lifecycle: the stored index must
  * reproduce the one-shot [[Similarity.ivfPqTopK]] results, and the
  * probe must reach the codes parquet as PARTITION PRUNING — the
  * property that makes an ANN probe O(probed cells) at 100 TB.
  */
class PqIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions.{col => c}

  private lazy val emb = graft.core.Tables.embeddings(spark, sfDir)

  test("stored index reproduces the one-shot IVFADC results; probe partition-prunes") {
    val dir = java.nio.file.Files.createTempDirectory("pqindex").toString
    PqIndex.build(emb.filter(c("vec_id") =!= 0L), c("vec_id"), c("label"),
      c("embedding"), dir)
    val q = emb.filter(c("vec_id") === 0L)
      .select(transform(c("embedding"), x => x.cast("double")).as("qv"))
      .head().getSeq[Double](0)
    val fromIndex = PqIndex.topK(spark, dir, emb.filter(c("vec_id") =!= 0L),
      c("vec_id"), c("embedding"), q, k = 10, nprobe = 3, rerank = 80)
    val oneShot = Similarity.ivfPqTopK(emb, c("vec_id"), c("label"),
      c("embedding"), c("vec_id") === 0L, 10, 3, 80, mSub = 8, ksub = 16)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(c("id"), round(c("sim"), 9)).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(fromIndex) === rows(oneShot),
      "stored-index probe must equal the one-shot fit+scan")

    // the probed scan must carry partition filters on cell — reading
    // all cells would defeat the entire index layout
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"codes scan is not partition-pruned:\n$plan")
    // and only the probed cell directories exist to be read: spot-check
    // that the filter lists 3 cells
    val pruned = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pruned.contains("IN") || pruned.contains("in("), pruned)

    // the build geometry is persisted and authoritative: a topK with
    // mismatched Params would silently mis-index the ADC table, so it
    // must REFUSE instead of returning wrong neighbors
    val stored = PqIndex.readParams(spark, dir)
    assert((stored.mSub, stored.dim, stored.ksub) === ((8, 64, 16)))
    val bad = intercept[IllegalArgumentException] {
      PqIndex.topK(spark, dir, emb.filter(c("vec_id") =!= 0L),
        c("vec_id"), c("embedding"), q, k = 10, nprobe = 3, rerank = 80,
        params = PqIndex.Params(mSub = 4, dim = 64, ksub = 16))
    }
    assert(bad.getMessage.contains("was built with"), bad.getMessage)
  }
}
