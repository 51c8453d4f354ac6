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
}
