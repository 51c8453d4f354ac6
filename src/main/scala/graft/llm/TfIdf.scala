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
  * that frame grouped by term. The vocabulary frame is UNBOUNDED
  * (hapax typos alone make it ~O(corpus) distinct terms at 100 TB),
  * so it is never broadcast-hinted: tf⋈df is a plain equi-join on
  * `w` — df arrives pre-partitioned on `w` from its own aggregation,
  * tf re-exchanges on `w` (unavoidable for co-partitioning a join
  * against an unbounded vocabulary; its own partitioning is (id, w)),
  * and AQE may still elect a runtime broadcast when df turns out
  * small. Only provably-bounded frames (the single-row N) carry a
  * hint. The top-k per doc is a bounded window over each doc's
  * distinct terms.
  */
object TfIdf {

  /** (id, w, tf) — exact term frequency per document. */
  def termFreq(docs: DataFrame, id: Column, words: Column): DataFrame =
    docs.select(id.as("id"), explode(words).as("w"))
      .groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 document ranking for a fixed query-term set — the retrieval
    * scorer TF-IDF feeds (Robertson/Sparck Jones; the public Lucene/
    * Elasticsearch default). Per matching (doc, term):
    *
    *   idf  = ln(1 + (N − df + 0.5)/(df + 0.5))   (non-negative — a
    *          term in over half the corpus must never score a MATCH
    *          below a non-match, which the raw Robertson form does)
    *   s    = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * quantized to integer micro-units per term and SUMMED AS INTEGERS
    * per doc ([[NgramLm]] discipline) — every input to the float
    * expression (tf, df, N, dl, Σdl) is an exact integer, so the few
    * IEEE ops run bit-identically in any engine and the ranking is
    * hash-exact. Shape: df/dl/avgdl derive from the tf frame
    * (no corpus rescans), the query-term stats broadcast, docs
    * aggregate on their own key.
    */
  /** NOTE: runs one small aggregation job at CALL time — the corpus
    * totals (N, Σdl) are a one-row aggregate, and collecting them to
    * literals replaces a broadcast subquery whose build would
    * re-execute the whole dl subtree. Call with a materialized
    * (checkpointed) `tf` frame. Pass `precomputedDf = true` ONLY when
    * `queryTerms` carries a `df` column holding THIS corpus's exact
    * document frequencies (e.g. the term fixture came from a df
    * ranking over the same `tf` frame) — the internal
    * document-frequency aggregation is then skipped. The flag is
    * explicit rather than schema-sniffed: a query frame carrying an
    * unrelated `df` column (different corpus, per-language df) must
    * not silently change the scores.
    */
  def bm25(tf: DataFrame, queryTerms: DataFrame, k1: Double = 1.2d,
           b: Double = 0.75d, precomputedDf: Boolean = false): DataFrame = {
    val qdf =
      if (precomputedDf) queryTerms.select(col("w"), col("df"))
      else tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .join(broadcast(queryTerms.select(col("w"))), "w")
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val t = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
    // empty corpus: n = 0, sum = null — every downstream join is then
    // empty regardless, so safe stand-ins beat a driver crash (and a
    // 1.0 avgdl stand-in beats a NaN literal sitting in the plan)
    val n = t.getLong(0)
    val sumdl = if (t.isNullAt(1)) 0L else t.getLong(1)
    val idf = log(lit(1.0d) + (lit(n) - col("df") + 0.5d) / (col("df") + 0.5d))
    val avgdl = lit(if (n == 0L) 1.0d else sumdl.toDouble / n.toDouble)
    val s = idf * (col("tf") * (k1 + 1.0d)) /
      (col("tf") + lit(k1) * (lit(1.0d) - b + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(qdf), "w")
      .join(dl, "id")
      .select(col("id"), floor(s * 1000000d).as("q"))
      .groupBy(col("id"))
      .agg(sum(col("q")).as("score"), count(lit(1)).as("n_terms"))
  }

  /** Dirichlet-smoothed query likelihood ranking (Zhai & Lafferty
    * SIGIR'01) — the language-model retrieval scorer that sits beside
    * [[bm25]] in every public IR stack (Lucene's `LMDirichletSimilarity`):
    *
    *   score(Q,D) = Σ_{q∈Q} ln( (tf(q,D) + μ·cf(q)/|C|) / (dl(D) + μ) )
    *
    * cf(q) = corpus frequency of q, |C| = corpus token count. Unlike
    * BM25 a document scores on EVERY query term (a zero-tf term
    * contributes the smoothed background mass), so the scored frame is
    * docs × queryTerms — built by a broadcast crossJoin of the ≤|Q|-row
    * term-stats frame against the per-doc length frame, then a LEFT
    * join to hydrate tf. Quantized to integer micro-nats per term and
    * summed as integers ([[NgramLm]] discipline); every float input
    * (tf, cf, |C|, dl, μ) is an exact integer or literal, so the IEEE
    * ops run bit-identically in any engine.
    *
    * Returns (id, score, n_hit) — n_hit = query terms with tf > 0.
    */
  /** NOTE: like [[bm25]], collects the one-row corpus-token total to
    * a literal at call time (one small job over `tf`) instead of
    * carrying it as a broadcast subquery. Call with a materialized
    * `tf` frame.
    */
  def dirichletQl(tf: DataFrame, queryTerms: DataFrame,
                  mu: Double = 100.0d): DataFrame = {
    val cf = tf.groupBy(col("w")).agg(sum(col("tf")).as("cf"))
    val qcf = cf.join(broadcast(queryTerms.select(col("w"))), "w")
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val ctotRow = tf.agg(sum(col("tf"))).head()
    val ctot = if (ctotRow.isNullAt(0)) 0L else ctotRow.getLong(0)
    val p = (coalesce(col("tf"), lit(0L)).cast("double")
        + lit(mu) * col("cf").cast("double") / lit(ctot).cast("double")) /
      (col("dl").cast("double") + lit(mu))
    dl.crossJoin(broadcast(qcf))
      .join(tf, Seq("id", "w"), "left")
      .select(col("id"), floor(log(p) * 1000000d).as("q"),
        when(col("tf").isNotNull, 1L).otherwise(0L).as("hit"))
      .groupBy(col("id"))
      .agg(sum(col("q")).as("score"), sum(col("hit")).as("n_hit"))
  }

  /** Top-k terms per document by tf·idf, deterministic tie-break on
    * the term. Returns (id, w, tf, score, rank) with
    * score = tf · floor(ln(N/df)·10⁶).
    */
  def topTerms(tf: DataFrame, k: Int): DataFrame = {
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // one-row corpus size to a literal (one small job; see bm25)
    val n = tf.agg(countDistinct(col("id"))).head().getLong(0)
    val qidf = floor(
      log(lit(n).cast("double") / col("df").cast("double")) * 1000000d)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("w").asc)
    tf.join(df, "w")
      .select(col("id"), col("w"), col("tf"), (col("tf") * qidf).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
