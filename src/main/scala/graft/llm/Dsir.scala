package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xia et al., "Data
  * Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score raw-corpus documents by how target-like
  * they are under hashed n-gram bucket models, the data-SELECTION
  * stage that sits between cleaning/dedup and mixture sampling in a
  * training-data pipeline ([[Sampling.hashSample]] draws uniformly;
  * this draws toward a target distribution).
  *
  * The paper's recipe: featurize every document into counts over B
  * hashed n-gram buckets, fit bucket unigram models for the target
  * and raw corpora, and weight each raw document by its importance
  * log-ratio `Σ_b n_b(doc) · (ln p_target(b) − ln p_raw(b))`. We
  * keep the top-k by weight (the paper's deterministic "top-k"
  * baseline; its Gumbel-resampling variant differs only in adding
  * per-doc noise to the same weights).
  *
  * Determinism/portability: buckets are the first two hex chars of
  * `md5(salt|gram)` — B = 256 by construction, no numeric hash
  * conversion, identical in any engine with md5. Counts stay exact
  * integers until the final ln; Laplace (+1) smoothing keeps every
  * log finite.
  *
  * Scale shape: two explode→count aggregations (map-side combined,
  * shuffle bounded by B·2 distinct keys), one ≤B-row model frame
  * broadcast into the per-doc scoring join, one doc-keyed final
  * aggregation. Nothing holds more than B rows of model state, and
  * the corpus is read once per side.
  */
object Dsir {

  /** Hashed feature bucket for one gram: 2 hex chars, B = 256. */
  def bucket(gram: Column, salt: String): Column =
    substring(md5(concat_ws("|", lit(salt), gram)), 1, 2)

  val NumBuckets = 256

  /** (doc_id, b, n) hashed unigram+bigram bucket counts per document.
    * Documents with no alphabetic tokens produce no rows — they score
    * 0 (the empty product), matching the paper's featurization.
    */
  def features(docs: DataFrame, id: Column, text: Column,
               salt: String = "dsir"): DataFrame = {
    val ws = TextOps.words(text)
    docs.filter(text.isNotNull)
      .select(id.cast("long").as("doc_id"),
        explode(concat(ws, TextOps.wordNgrams(ws, 2))).as("g"))
      .select(col("doc_id"), bucket(col("g"), salt).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
  }

  /** Per-document importance log-weights for every document NOT in
    * the target set, fitted target-vs-raw on `targetPred`. Returns
    * (doc_id, n_grams, log_w); higher = more target-like.
    */
  def logWeights(docs: DataFrame, id: Column, text: Column,
                 targetPred: Column, salt: String = "dsir"): DataFrame = {
    val tagged = docs.filter(text.isNotNull)
      .select(id.cast("long").as("doc_id"), text.as("text"),
        targetPred.as("is_target"))
    // checkpoint-before-model-build: the feature kernel (words +
    // bigrams + md5 per gram) is the query's CPU center, and the
    // model aggregation + the scoring join both consume it — without
    // the barrier the model's broadcast build re-executes the kernel
    val feats = features(tagged, col("doc_id"), col("text"), salt)
      .join(tagged.select(col("doc_id"), col("is_target")), "doc_id")
      .localCheckpoint(true)
    // ONE fused model aggregation, collected: the model is ≤ B = 256
    // rows by construction (model-sized, like centroids). A bucket
    // seen on only one side keeps 0 on the other, exactly as the old
    // full-outer two-side join produced. Totals are exact integer
    // sums, computed on the driver.
    val modelRows = feats.groupBy("b").agg(
        sum(when(col("is_target"), col("n")).otherwise(0L)).as("ct"),
        sum(when(!col("is_target"), col("n")).otherwise(0L)).as("cr"))
      .collect()
    val tt = modelRows.map(_.getLong(1)).sum
    val tr = modelRows.map(_.getLong(2)).sum
    // the per-bucket llr is rebuilt as a LOCAL relation evaluated by
    // the same Catalyst log expressions as before — identical IEEE op
    // sequence, so the hash-gated scores cannot move
    val sp = docs.sparkSession
    import sp.implicits._
    val llr = modelRows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("b", "ct", "cr")
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / lit(tt + NumBuckets).cast("double")) -
         log((col("cr") + 1).cast("double") / lit(tr + NumBuckets).cast("double")))
          .as("llr"))
    feats.filter(!col("is_target"))
      .join(broadcast(llr), "b")
      .groupBy("doc_id").agg(
        sum(col("n")).as("n_grams"),
        sum(col("n").cast("double") * col("llr")).as("log_w"))
  }
}
