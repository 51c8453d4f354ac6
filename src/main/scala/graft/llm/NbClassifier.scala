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
    *
    * Literally one pass: a null marker token is appended to EVERY
    * doc's array before the explode, so the single (label, token)
    * aggregation yields both the token counts (non-null rows) and the
    * per-class doc counts (the null row's count) — no second corpus
    * scan for priors, no third for the total. Everything downstream
    * (class totals, vocabulary size, priors) aggregates the
    * |vocab|·|classes|-bounded model frame, never the corpus.
    */
  def fit(docs: DataFrame, label: Column, words: Column): Model = {
    val counts = docs
      .select(label.as("label"),
        explode(concat(coalesce(words, array().cast("array<string>")),
          array(lit(null).cast("string")))).as("w"))
      .groupBy(col("label"), col("w"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val tokenCounts = counts.filter(col("w").isNotNull)
    // class totals, doc counts AND priors off ONE aggregation of the
    // model frame — no join, no separate n_total subtree: the global
    // doc count is an unpartitioned window over the |classes|-row
    // aggregate (model-sized by definition, so the single-partition
    // window is free — this is the one place that shape is correct).
    val classStats = counts
      .groupBy(col("label"))
      .agg(sum(when(col("w").isNotNull, col("c")).otherwise(0L)).as("tot"),
        sum(when(col("w").isNull, col("c")).otherwise(0L)).as("n_docs"))
      .withColumn("n_total", sum(col("n_docs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
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
    * dropped: a null marker token appended to every doc keeps one
    * row per doc alive, contributing 0 to the likelihood sum.
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
    // (id, carry..., w) per token OCCURRENCE, plus one null marker
    // row per doc so empty docs survive to the prior-only score.
    // Deliberately NOT pre-aggregated to a (doc, token, multiplicity)
    // profile: the model lookup is a broadcast join either way (the
    // model is |vocab|·|classes|-bounded whatever the corpus size),
    // so scoring per occurrence feeds the per-(doc, class) partial
    // aggregation map-side and saves the profile's own corpus-sized
    // shuffle — one fewer Exchange, Σ_occurrences q ≡ Σ_distinct m·q
    // exactly (integer micro-nats both ways).
    val toks = docs
      .select((id.as("id") +: carry.map { case (n, c) => c.as(n) }) :+
        explode(concat(coalesce(words, array().cast("array<string>")),
          array(lit(null).cast("string")))).as("w"): _*)
    // |classes|-way expansion × model lookup. classStats/vocab are
    // tiny (class count) and broadcast; tokenCounts is vocab-bounded
    // — plain join, AQE picks broadcast when it fits.
    val q = floor(
      log((coalesce(col("c"), lit(0L)) + 1L).cast("double")
          / (col("tot") + col("v")).cast("double")) * 1000000d)
      .cast("long")
    toks
      .crossJoin(broadcast(model.classStats))
      .join(model.tokenCounts, Seq("label", "w"), "left")
      .crossJoin(broadcast(model.vocabSize))
      .groupBy(col("id") +: carryKeys :+ col("label"): _*)
      .agg((first(col("q_prior")) +
        sum(when(col("w").isNotNull, q).otherwise(lit(0L)))).as("q_sum"))
      // argmax by (q desc, label asc): min over struct(-q, label)
      // orders lexicographically — no window, one aggregation.
      .groupBy(col("id") +: carryKeys: _*)
      .agg(min(struct((-col("q_sum")).as("nq"), col("label").as("pred"),
        col("q_sum").as("q"))).as("best"))
      .select((col("id") +: carryKeys) ++ Seq(
        col("best.pred").as("pred_label"), col("best.q").as("q_score")): _*)
  }
}
