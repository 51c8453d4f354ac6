package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-level retrieval composition — the pieces that sit ABOVE the
  * scorers ([[TfIdf.bm25]], [[TfIdf.dirichletQl]], [[Similarity]]'s
  * ANN family) in a hybrid search stack.
  *
  * Scale design: everything here operates on top-N candidate LISTS
  * (bounded frames), never on the corpus — the corpus-sized work
  * stays inside the scorers, which were each engineered for one
  * corpus pass. Fusion over k lists of N rows touches k·N rows.
  */
object Retrieval {

  /** Attach a dense 1-based rank to a score frame: (id, rank),
    * ordered by `score` descending with ties broken on `id` — the
    * deterministic rank both fusion and its oracle agree on. The
    * single-partition window is intentional: rank inputs are bounded
    * top-N lists by contract (see object scaladoc), not corpora.
    */
  def ranked(list: DataFrame, id: Column, score: Column): DataFrame =
    list.select(id.as("id"), score.as("s"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("s").desc, col("id").asc)))
      .select(col("id"), col("rank"))

  /** Reciprocal rank fusion (Cormack, Clarke & Buettcher SIGIR'09):
    * score(d) = Σ_lists 1/(k + rank_i(d)), the parameter-light fusion
    * that consistently beats learned weights on TREC runs and is the
    * standard BM25⊕dense hybrid in public search engines (k = 60 in
    * the paper and every mainstream default). A document missing from
    * a list contributes nothing for it — no rank imputation.
    *
    * Ranks are exact integers, so each contribution 1/(k+r) is the
    * same IEEE double in any engine; with two lists the fused sum is
    * order-independent (two-operand FP addition is commutative); ties
    * break on id.
    *
    * Input frames are (id, rank) as produced by [[ranked]]. Returns
    * (id, n_lists, rrf) sorted by (rrf desc, id), top `topK`.
    */
  def rrf(lists: Seq[DataFrame], topK: Int, k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf: need at least one ranked list")
    lists.map(_.select(col("id"),
        (lit(1.0d) / (lit(k.toDouble) + col("rank").cast("double")))
          .as("contrib")))
      .reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrf"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(topK)
  }
}
