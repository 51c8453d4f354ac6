package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All-pairs similarity join with prefix filtering (Bayardo, Ma &
  * Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007) — the
  * thresholded cousin of [[Similarity]]'s top-k family: emit EVERY
  * document pair whose cosine similarity over term-frequency vectors
  * clears a threshold t, without ever materializing the quadratic
  * token self-join.
  *
  * Why this and not the token self-join the oracle runs: the naive
  * candidate set costs Σ_g df(g)² pairs — at 100 TB a single hot
  * token makes that a cluster-killer. Prefix filtering bounds the
  * candidate join to rare tokens only: with features ordered
  * commonest→rarest per document, a document only needs to be indexed
  * under the minimal RARE suffix whose L2 mass reaches t (its
  * "prefix" in AllPairs terms); any pair with cos ≥ t provably shares
  * one of those indexed tokens, because the unindexed (common) mass
  * alone is too small to reach t. Candidates therefore come from a
  * join keyed on low-df tokens, and the exact dot product is computed
  * only for candidate pairs.
  *
  * Determinism discipline (the [[NgramLm]] / [[GraphOps]] rule):
  * normalized weights quantize to integer micro-units
  * (floor(w·10⁶ + 0.5)) BEFORE any cross-row sum, so the pair dot
  * product is an order-free integer sum and the qualifying set is
  * bit-identical in any engine. The prefix bound carries a 10⁻³
  * safety margin that absorbs the quantization slack (suffix dot ≤
  * ‖suffix‖·(10⁶ + ½√n) < t·10¹² whenever ‖suffix‖ < (t−10⁻³)·10⁶ for
  * any document under 10⁶ tokens), so the candidate set is a strict
  * superset of the qualifying set — the margin can only admit extra
  * candidates, never drop a qualifying pair.
  *
  * Scale shape: one (id,g) count aggregation, one vocab-sized df
  * aggregation (df-banded to [dfMin,dfMax] — the [[Dedup]] span-dedup
  * lesson: unbanded stopwords make ANY token join quadratic), one
  * per-document window pass for suffix mass, then candidate and
  * verify joins both keyed on token/id — no all-pairs stage anywhere.
  */
object AllPairs {

  /** Pairs `(id_a, id_b, dotq)` with id_a < id_b and quantized cosine
    * dotq ≥ floor(t·10¹²), over L2-normalized term-frequency vectors
    * restricted to tokens with document frequency in [dfMin, dfMax].
    * `dotq` is the exact integer micro-unit dot product; divide by
    * 10¹² for the cosine estimate.
    */
  def cosinePairs(docs: DataFrame, id: Column, words: Column, t: Double,
                  dfMin: Long, dfMax: Long): DataFrame = {
    require(t > 0d && t < 1d, s"threshold must be in (0,1), got $t")
    val tok = docs.select(id.as("id"), explode(words).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
    val dfq = tok.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= dfMin && col("df") <= dfMax)
    val kept = tok.join(dfq, Seq("g"))
    val nrm = kept.groupBy(col("id"))
      .agg(sum(col("c") * col("c")).as("n2"))
    // Integer micro-unit weights; consumed by the prefix pass, the
    // candidate probe side, and both verify legs — checkpoint once.
    val w = kept.join(nrm, Seq("id"))
      .select(col("id"), col("g"), col("df"),
        floor(col("c").cast("double") / sqrt(col("n2").cast("double"))
          * lit(1e6d) + lit(0.5d)).cast("long").as("wq"))
      .localCheckpoint(false)
    // Inclusive suffix mass in rarity order: cumulative Σwq² with the
    // COMMONEST feature first means each row sees the total mass of
    // itself plus every rarer feature — exactly ‖suffix starting
    // here‖². A row is indexed iff that mass can still reach t.
    val byCommonFirst = Window.partitionBy(col("id"))
      .orderBy(col("df").desc, col("g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tq = (t - 1e-3d) * 1e6d
    val prefix = w
      .withColumn("ssq", sum(col("wq") * col("wq")).over(byCommonFirst))
      .filter(col("ssq").cast("double") >= lit(tq * tq))
      .select(col("id"), col("g"))
    val cand = prefix.as("p")
      .join(w.select(col("id"), col("g")).as("f"),
        col("p.g") === col("f.g") && col("p.id") < col("f.id"))
      .select(col("p.id").as("id_a"), col("f.id").as("id_b"))
      .distinct()
    val thr = math.floor(t * 1e12d).toLong
    cand
      .join(w.as("a"), col("id_a") === col("a.id"))
      .join(w.as("b"),
        col("id_b") === col("b.id") && col("a.g") === col("b.g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("a.wq") * col("b.wq")).as("dotq"))
      .filter(col("dotq") >= lit(thr))
  }
}
