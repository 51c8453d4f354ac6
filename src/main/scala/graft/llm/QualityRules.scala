package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher/MassiveText document-filter rule set (Rae et al.,
  * "Scaling Language Models: Methods, Analysis & Insights from
  * Training Gopher", arXiv:2112.11446, Table A1) as pure Column
  * predicates — the rule-based companion to the score-based
  * `llm_quality`/`llm_quality_filter` path: each document either
  * passes every rule or is dropped with an auditable per-rule flag,
  * nothing is ranked.
  *
  * Every ratio threshold is evaluated by integer cross-multiplication
  * (`10·sym < n_words` instead of `sym/n_words < 0.1`), so the
  * pass/fail cut is exact in any engine — no float boundary can flip a
  * document between engines or runs. All rules are codegen'd
  * expressions over one `split`; the whole filter runs inside the scan
  * stage with zero shuffle at any scale.
  */
object QualityRules {

  /** Gopher Table A1 stop list ("must contain ≥ 2 of"). */
  val requiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Non-empty lines of the document. */
  def lines(text: Column): Column =
    filter(split(text, "\n"), l => length(l) > 0)

  /** Σ word length (exact Long; 0 for empty docs). */
  def sumWordLen(ws: Column): Column =
    aggregate(ws, lit(0L), (acc, w) => acc + length(w))

  /** 50 ≤ word count ≤ 100 000. */
  def okWordCount(nWords: Column): Column =
    nWords >= 50 && nWords <= 100000

  /** 3 ≤ mean word length ≤ 10, as 3n ≤ Σlen ≤ 10n. */
  def okMeanWordLen(nWords: Column, sumLen: Column): Column =
    nWords > 0 && sumLen >= lit(3L) * nWords && sumLen <= lit(10L) * nWords

  /** Symbol-to-word ratio (# and … / ...) < 0.1, as 10·sym < n. */
  def okSymbolRatio(text: Column, nWords: Column): Column = {
    val sym = size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
    nWords > 0 && lit(10L) * sym < nWords
  }

  /** < 90% of lines start with a bullet, as 10·bul < 9·lines. */
  def okBulletLines(ls: Column): Column = {
    val bul = size(filter(ls, l => l.rlike("^\\s*[-*•]")))
    lit(10L) * bul < lit(9L) * greatest(size(ls), lit(1))
  }

  /** < 30% of lines end with an ellipsis, as 10·ell < 3·lines. */
  def okEllipsisLines(ls: Column): Column = {
    val ell = size(filter(ls, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
    lit(10L) * ell < lit(3L) * greatest(size(ls), lit(1))
  }

  /** ≥ 80% of words contain an alphabetic char, as 5·alpha ≥ 4·n. */
  def okAlphaWords(ws: Column, nWords: Column): Column = {
    val alpha = size(filter(ws, w => w.rlike("[A-Za-z]")))
    nWords > 0 && lit(5L) * alpha >= lit(4L) * nWords
  }

  /** Contains ≥ 2 distinct words from [[requiredStopwords]]. */
  def okStopwords(ws: Column): Column =
    size(array_distinct(filter(ws,
      w => lower(w).isin(requiredStopwords: _*)))) >= 2
}
