package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical-diversity and n-gram language-model scoring beyond the
  * bigram Kneser-Ney form — corpus-quality signals a training-data
  * pipeline runs per document.
  *
  * Scale design: MATTR is a pure per-row array expression (no shuffle
  * of its own, stays inside WholeStageCodegen); stupid backoff is the
  * [[NgramLm]] shape — n-gram count frames keyed on their own grams,
  * per-occurrence scoring via equi-joins, integer-quantized log
  * scores summed as integers so the per-doc totals are engine-exact.
  */
object Lexical {

  /** Moving-average type-token ratio (Covington & McFall, JQL 2010):
    * the mean, over every `w`-token window of the document, of the
    * window's distinct-token count over `w`. Unlike raw TTR it does
    * not shrink with document length, so it is comparable across
    * docs — the lexical-diversity quality signal. Docs shorter than
    * `w` fall back to plain TTR (distinct/n); empty docs emit null.
    *
    * The window sum is an exact integer (a sum of distinct COUNTS);
    * the single division happens once at the end. Per-row cost is
    * O(n·w) array work with no shuffle — embarrassingly parallel at
    * any corpus size.
    */
  def mattr(ws: Column, w: Int): Column = {
    require(w >= 2, s"degenerate MATTR window $w")
    val n = size(ws)
    val winSum = aggregate(
      transform(sequence(lit(1), n - w + 1),
        i => size(array_distinct(slice(ws, i, lit(w)))).cast("long")),
      lit(0L), (acc, x) => acc + x)
    when(n >= w,
      winSum.cast("double")
        / ((n - w + 1).cast("double") * lit(w.toDouble)))
      .otherwise(when(n > 0,
        size(array_distinct(ws)).cast("double") / n.cast("double")))
  }

  /** Per-occurrence trigram frame: one row per position t ≥ 2 of each
    * doc, carrying the (u, v, w) = (t−2, t−1, t) tokens. Pure array
    * expressions until the explode.
    */
  def trigrams(docs: DataFrame, id: Column, ws: Column): DataFrame =
    docs.select(id.as("id"), ws.as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("__ws")) - 3),
        i => struct(
          element_at(col("__ws"), i + 1).as("u"),
          element_at(col("__ws"), i + 2).as("v"),
          element_at(col("__ws"), i + 3).as("w")))).as("g"))
      .select(col("id"), col("g.u"), col("g.v"), col("g.w"))

  /** Stupid-backoff trigram scoring (Brants, Popat, Xu, Och & Dean,
    * EMNLP 2007 §3): S(w|u,v) = c(uvw)/c(uv) when the trigram was
    * seen, else α·S(w|v), S(w|v) = c(vw)/c(v) else α·S(w), with
    * S(w) = c(w)/N and α = 0.4 — the score (not probability) that
    * matches Kneser-Ney quality at web scale without any discount
    * fitting. Counts come from `train`; `eval` trigram occurrences
    * are scored, so unseen grams exercise the backoff chain. Tokens
    * absent from the training vocabulary are OOV: counted per doc,
    * excluded from the score sum (no probability exists for them).
    *
    * Returns (id, n_scored, n_oov, q_sum): every column an exact
    * integer — the per-occurrence ln score is floor-quantized to
    * micro-nats BEFORE the per-doc sum, the [[NgramLm]] discipline.
    *
    * Scale: the count frames key on their own grams (map-side
    * combine), scoring is five equi-joins on gram keys — no
    * all-pairs, no driver state; everything shuffles at most
    * corpus-token rows.
    */
  def stupidBackoff(train: DataFrame, eval: DataFrame,
                    alpha: Double = 0.4d): DataFrame = {
    // c3 feeds three subtrees (both backoff marginals + the eval
    // join) — the checkpoint keeps the trigram aggregation single-pass
    val c3 = train.groupBy(col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("c3"))
      .localCheckpoint(false)
    // r17: the total and the unigram counts both derive from the
    // CHECKPOINTED c3 instead of re-scanning `train` (identical exact
    // integers: Σc3 = |train rows|, Σ_{u,v} c3 = per-w occurrence
    // count) — the old shape paid two extra full passes over the
    // trigram frame (QProfile r17: a 5.7 s-CPU (w)-agg kernel stage
    // for c1 alone). The one-row total is collected FIRST, which
    // anchors the c3 checkpoint (and any lazy checkpoint under
    // `train`) before the parallel model branches could race for it.
    val totRow = c3.agg(sum(col("c3"))).head()
    val nTot = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val c2uv = c3.groupBy(col("u"), col("v")).agg(sum(col("c3")).as("c2uv"))
    val c2vw = c3.groupBy(col("v"), col("w")).agg(sum(col("c3")).as("c2vw"))
    // unigram counts from w-position token occurrences: every trigram
    // row carries w once; u/v of the first/last trigrams under-count
    // doc edges by a constant 2 per doc — irrelevant as long as BOTH
    // the c(v) context total and c(w)/N use the SAME convention,
    // which they do (all from the w position).
    val c1 = c3.groupBy(col("w")).agg(sum(col("c3")).as("c1"))
    val a = lit(alpha)
    val s = coalesce(
      when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2uv").cast("double")),
      when(col("c2vw").isNotNull,
        a * col("c2vw").cast("double") / col("c1v").cast("double")),
      a * a * col("c1w").cast("double") / lit(nTot).cast("double"))
    eval
      .join(c3, Seq("u", "v", "w"), "left")
      .join(c2uv, Seq("u", "v"), "left")
      .join(c2vw.withColumnRenamed("w", "__w2")
        .withColumnRenamed("v", "__v2"),
        col("v") === col("__v2") && col("w") === col("__w2"), "left")
      .join(c1.select(col("w").as("__wv"), col("c1").as("c1v")),
        col("v") === col("__wv"), "left")
      .join(c1.select(col("w").as("__ww"), col("c1").as("c1w")),
        col("w") === col("__ww"), "left")
      .withColumn("__q",
        when(col("c1w").isNotNull,
          floor(log(s) * lit(1000000.0d)).cast("long")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("__q").isNull, 1L).otherwise(0L)).as("n_oov"),
        coalesce(sum(col("__q")), lit(0L)).as("q_sum"))
  }
}
