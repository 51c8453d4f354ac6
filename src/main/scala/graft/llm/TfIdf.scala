package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting — the retrieval/keyword-extraction primitive
  * of a text pipeline (BM25's core term, topic labeling, stopword
  * discovery at corpus scale).
  *
  * Same determinism discipline as [[NgramLm]]: term and document
  * frequencies are exact integers, idf = ln(N/df) is computed once
  * per TERM on an exact rational and quantized to integer micro-nats,
  * and the per-(doc, term) score is the INTEGER product tf·q(idf) —
  * no float aggregation anywhere, so ranking ties and hash compares
  * are engine-exact.
  *
  * Scale shape: one corpus pass to (doc, term, tf); df/N derive from
  * that frame grouped by term — the vocabulary frame (≤ distinct
  * terms) broadcasts back for scoring, so the corpus shuffles only on
  * its own (doc, term) keys. The top-k per doc is a bounded window
  * over each doc's distinct terms.
  */
object TfIdf {

  /** (id, w, tf) — exact term frequency per document. */
  def termFreq(docs: DataFrame, id: Column, words: Column): DataFrame =
    docs.select(id.as("id"), explode(words).as("w"))
      .groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by tf·idf, deterministic tie-break on
    * the term. Returns (id, w, tf, score, rank) with
    * score = tf · floor(ln(N/df)·10⁶).
    */
  def topTerms(tf: DataFrame, k: Int): DataFrame = {
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("id")).as("n"))
    val qidf = floor(
      log(col("n").cast("double") / col("df").cast("double")) * 1000000d)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("w").asc)
    tf.join(broadcast(df), "w")
      .crossJoin(broadcast(n))
      .select(col("id"), col("w"), col("tf"), (col("tf") * qidf).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
