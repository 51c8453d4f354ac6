package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classifier — the "train a cheap
  * linear classifier on a labeled slice, score the whole corpus" step
  * of an LLM data pipeline (GPT-3/CCNet-style quality classifiers,
  * fastText-style language ID; Joachims-style multinomial NB as
  * described in McCallum & Nigam, AAAI-98 workshop).
  *
  * Determinism design (same scheme as [[NgramLm]]): the model is
  * exact integer counts; per-token class log-likelihoods
  * ln((c+1)/(tot+V)) are quantized to integer micro-nats
  * (floor(ln·10⁶)) BEFORE the per-document sum, so document scores
  * are integer sums — immune to float summation order across
  * partitions and verifiable across engines. Argmax tie-break is the
  * lexicographically smallest label.
  *
  * Scale shape: training is ONE pass over the labeled slice (token
  * explode → (label, token) counted groupBy); class totals, priors
  * and vocabulary size all derive from the model frame / the labeled
  * slice's label column — never a second corpus scan. Scoring joins
  * the corpus's (doc, token) profile against the model on the token
  * key — the model is |vocab|·|classes| bounded whatever the corpus
  * size, so AQE broadcasts it when it fits and the corpus never
  * shuffles beyond its own doc-keyed aggregation. Class count is
  * assumed small (languages, quality buckets): the per-class score
  * expansion is a |classes|-way multiply of the doc-token frame.
  */
object NbClassifier {

  /** Trained model frames, all bounded by |vocab|·|classes|:
    *  - `tokenCounts`: (label, w, c) exact token counts;
    *  - `classStats`: (label, tot, n_docs, q_prior) — per-class token
    *    totals, doc counts, and quantized prior ln(n_docs/n_total);
    *  - `vocabSize`: 1-row (v) distinct training vocabulary.
    */
  final case class Model(tokenCounts: DataFrame, classStats: DataFrame,
      vocabSize: DataFrame)

  /** One-pass fit over a labeled slice: `docs` rows carry `label` and
    * a tokenized `words` array (empty-token docs still count toward
    * priors — a labeled empty document is evidence for its class).
    */
  def fit(docs: DataFrame, label: Column, words: Column): Model = {
    val toks = docs.select(label.as("label"), explode(words).as("w"))
    val tokenCounts = toks.groupBy(col("label"), col("w"))
      .agg(count(lit(1)).as("c"))
    val nTotal = docs.select(count(lit(1)).as("n_total"))
    val classStats = docs.groupBy(label.as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .join(tokenCounts.groupBy(col("label")).agg(sum(col("c")).as("tot")),
        Seq("label"), "left")
      .na.fill(0L, Seq("tot"))
      .crossJoin(nTotal)
      .select(col("label"), col("tot"), col("n_docs"),
        floor(log(col("n_docs").cast("double") / col("n_total").cast("double"))
          * 1000000d).cast("long").as("q_prior"))
    val vocabSize = tokenCounts.select(countDistinct(col("w")).as("v"))
    Model(tokenCounts, classStats, vocabSize)
  }

  /** Score + argmax: (id, <carry...>, pred_label, q_score) with
    * q_score the winner's integer micro-nat total (prior + Σ token
    * likelihoods).
    *
    * The model join is LEFT with zero-coalesced counts: a token the
    * training slice never saw scores (0+1)/(tot+V) under every class
    * — dropping it (inner join) would silently favor classes that
    * happen to share rare tokens with the doc. Documents with zero
    * tokens score prior-only (classified to the majority class), not
    * dropped: the per-doc token profile is built with a left-join
    * explode so empty docs keep one null-token row contributing 0.
    *
    * `carry` rides id-functionally-dependent columns (the true label,
    * a source tag) through the aggregations as extra group keys, so a
    * caller needing them alongside the prediction does NOT re-scan
    * and re-join the corpus — at 100 TB that second scan is the cost
    * that matters.
    */
  def predict(model: Model, docs: DataFrame, id: Column, words: Column,
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    val carryKeys = carry.map { case (n, _) => col(n) }
    // (id, carry..., w, m): token multiplicity per doc; empty docs
    // keep a null row (m=0) so they survive to the prior-only score.
    val profile = docs
      .select((id.as("id") +: carry.map { case (n, c) => c.as(n) }) :+
        explode(concat(words,
          when(size(words) === 0, array(lit(null).cast("string")))
            .otherwise(array().cast("array<string>")))).as("w"): _*)
      .groupBy(col("id") +: carryKeys :+ col("w"): _*)
      .agg(count(when(col("w").isNotNull, 1)).as("m"))
    // |classes|-way expansion × model lookup. classStats/vocab are
    // tiny (class count) and broadcast; tokenCounts is vocab-bounded
    // — plain join, AQE picks broadcast when it fits.
    val q = floor(
      log((coalesce(col("c"), lit(0L)) + 1L).cast("double")
          / (col("tot") + col("v")).cast("double")) * 1000000d)
      .cast("long")
    profile
      .crossJoin(broadcast(model.classStats))
      .join(model.tokenCounts, Seq("label", "w"), "left")
      .crossJoin(broadcast(model.vocabSize))
      .groupBy(col("id") +: carryKeys :+ col("label"): _*)
      .agg((first(col("q_prior")) + sum(col("m") * q)).as("q_sum"))
      // argmax by (q desc, label asc): min over struct(-q, label)
      // orders lexicographically — no window, one aggregation.
      .groupBy(col("id") +: carryKeys: _*)
      .agg(min(struct((-col("q_sum")).as("nq"), col("label").as("pred"),
        col("q_sum").as("q"))).as("best"))
      .select((col("id") +: carryKeys) ++ Seq(
        col("best.pred").as("pred_label"), col("best.q").as("q_score")): _*)
  }
}
