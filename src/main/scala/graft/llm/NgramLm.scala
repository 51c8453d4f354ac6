package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-bigram language-model quality scoring — the CCNet-style
  * "perplexity filter" of an LLM data pipeline (score each document by
  * how probable its character sequence is under a reference-corpus
  * model; outliers are boilerplate, codespam, or the wrong language).
  *
  * Determinism design (the whole point of the shape):
  *  - the model is exact integer counts (bigram count, prefix count,
  *    vocabulary size) — engine- and order-independent;
  *  - per-bigram log-probabilities ln((cg+1)/(cp+V)) are QUANTIZED to
  *    integer micro-nats (floor(ln·10⁶)) before summing, so the
  *    per-document score is an integer sum — immune to float
  *    summation order across partitions, the thing that makes naive
  *    sum-of-logs unverifiable across engines.
  *
  * Scale shape: training is ONE corpus pass (bigram explode → counted
  * groupBy); prefix counts and vocabulary derive from the ≤|charset|²
  * model frame, not from re-scanning the corpus. Scoring joins the
  * corpus's bigrams against the BROADCAST model — no shuffle of the
  * corpus beyond its own doc-keyed aggregation.
  */
object NgramLm {

  /** All overlapping character bigrams of `text` with multiplicity:
    * (id, g). Documents shorter than 2 chars emit nothing (guarded —
    * `sequence(1, 0)` throws under ANSI). Pure builtin exprs
    * (sequence/transform/substring), codegen'd, explode emits
    * len−1 two-char rows.
    */
  def bigrams(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.filter(length(text) >= 2)
      .select(id.as("id"),
        explode(transform(sequence(lit(1), length(text) - 1),
          i => text.substr(i, lit(2)))).as("g"))

  /** Exact bigram counts over a corpus: (g, cg). */
  def model(bg: DataFrame): DataFrame =
    bg.groupBy(col("g")).agg(count(lit(1)).as("cg"))

  /** Prefix (first-char) totals derived from the model — a tiny
    * aggregation over ≤|charset|² rows, NOT a second corpus pass.
    */
  def prefixCounts(model: DataFrame): DataFrame =
    model.groupBy(substring(col("g"), 1, 1).as("c1"))
      .agg(sum(col("cg")).as("cp"))

  /** Add-one-smoothed quantized log-prob score per document:
    * (id, n_bigrams, q_sum) where q_sum = Σ floor(ln((cg+1)/(cp+V))·10⁶)
    * over the document's bigrams. `V` = |distinct first chars| (the
    * prefix frame's row count), the smoothing vocabulary.
    *
    * The model joins are LEFT joins with zero-coalesced counts: a
    * bigram the reference corpus never saw scores (0+1)/(0+V) — the
    * exact case add-one smoothing exists for. An inner join here
    * would silently DROP unseen bigrams (undercounting n_bigrams and
    * inflating the quality of precisely the out-of-distribution
    * documents the filter is meant to catch); it goes unnoticed only
    * when training and scoring on the same corpus.
    */
  def score(bg: DataFrame, model: DataFrame, prefix: DataFrame): DataFrame = {
    val vocab = prefix.agg(count(lit(1)).as("v"))
    val q = floor(
      log((coalesce(col("cg"), lit(0L)) + 1L).cast("double")
          / (coalesce(col("cp"), lit(0L)) + col("v")).cast("double"))
        * 1000000d)
    bg.withColumn("c1", substring(col("g"), 1, 1))
      .join(broadcast(model), Seq("g"), "left")
      .join(broadcast(prefix), Seq("c1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"), q.as("q"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("q_sum"))
  }

  // ------------------------------------------- Kneser-Ney word bigrams

  /** All consecutive WORD bigram instances of a document, with
    * multiplicity: (id, w1, w2). Documents with < 2 words emit
    * nothing. One slide over the words array — no self-join.
    */
  def wordBigrams(docs: DataFrame, id: Column, words: Column): DataFrame =
    docs.select(id.as("id"), words.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(0), size(col("ws")) - 2),
          i => struct(element_at(col("ws"), i + 1).as("w1"),
                      element_at(col("ws"), i + 2).as("w2")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Interpolated Kneser-Ney bigram model (Kneser & Ney ICASSP'95;
    * Chen & Goodman TR-10-98 eq. 4.25, fixed discount D) — the
    * smoothing KenLM and every serious n-gram LM pipeline uses, where
    * [[model]]/[[score]]'s add-one form systematically over-smooths:
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *              + (D · N1+(w1·)/c(w1·)) · (N1+(·w2)/T)
    *
    * with N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    * histories of w2 (the "novel-context" continuation probability —
    * KN's defining idea), T = distinct bigram types.
    *
    * Everything derives from ONE grouped bigram frame: c is the group
    * count, c(w1·)/N1+(w1·) one aggregation by w1, N1+(·w2) one by w2,
    * T a single-row count — no corpus rescans. All counts are exact
    * integers, so the few IEEE ops in P run bit-identically in any
    * engine ([[score]]'s determinism discipline).
    *
    * Returns (w1, w2, c, cw1, n1f, n1b, t) — the integer model frame;
    * [[knScore]] folds it into per-document quantized log-probs.
    */
  def knModel(bg: DataFrame): DataFrame = {
    // checkpoint-after-aggregation: the grouped bigram frame feeds
    // FOUR consumers (byW1, byW2, T, the model join) whose subtrees
    // differ, so ReuseExchange cannot share them all — materializing
    // the vocab-bounded aggregate once measured 1.41 → 0.93 s on
    // llm_kn_lm at sf0.1 (KnAbProbe, round 14)
    val c = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val byW1 = c.groupBy(col("w1"))
      .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n1f"))
    val byW2 = c.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val t = c.agg(count(lit(1)).as("t"))
    c.join(byW1, Seq("w1")).join(byW2, Seq("w2")).crossJoin(broadcast(t))
  }

  /** Per-document quantized KN log-prob score: (id, n_bigrams, q_sum),
    * q_sum = Σ floor(ln(P_KN)·10⁶) over the document's bigram
    * instances. The model frame is an UNBOUNDED vocabulary product —
    * never broadcast ([[TfIdf]]'s lesson): the instance⋈model join
    * keys on (w1, w2), both sides shuffle-partitioned on it, AQE free
    * to elect a runtime broadcast when the model turns out small.
    * Scoring the training corpus itself ⇒ every bigram is in the
    * model and P > 0 (c ≥ 1 and N1+(·w2) ≥ 1); an unseen-corpus
    * scorer would first need a backoff unigram leg.
    */
  def knScore(bg: DataFrame, model: DataFrame, d: Double = 0.75d): DataFrame = {
    val p = greatest(col("c") - lit(d), lit(0.0d)) / col("cw1").cast("double") +
      (lit(d) * col("n1f").cast("double") / col("cw1").cast("double")) *
        (col("n1b").cast("double") / col("t").cast("double"))
    bg.join(model, Seq("w1", "w2"))
      .select(col("id"), floor(log(p) * 1000000d).as("q"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("q_sum"))
  }
}
