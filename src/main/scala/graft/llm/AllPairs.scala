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
    // Exchange-lean build (measured: the join-based df/norm chain was
    // 5 serial exchanges ≈ 6 s warm at sf0.1; this is 3): one (id,g)
    // count, one g-keyed window for df, then ONE id-keyed exchange
    // carrying both the full-partition norm and the ordered
    // suffix-mass scan.
    // explode_OUTER, not explode: the plain generator makes
    // InferFiltersFromGenerate synthesize `size(words)>0 AND
    // isnotnull(words)` below the Generate, and predicate pushdown
    // carries that through the union and the fanOut exchange down to
    // the single-split SCAN — where it re-evaluates the whole
    // shingling chain per row, interpreted, single-threaded (jstack'd:
    // StringSplit/ArrayTransform/ArrayJoin inside a pushed Filter;
    // 4.3 s + 2.0 s one-task stages at sf0.1, 60% of the query). The
    // outer generator infers nothing; the cheap null filter on the
    // generated attribute runs above the exchange.
    val tok = docs.select(id.as("id"), explode_outer(words).as("g"))
      .filter(col("g").isNotNull)
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
    val byG = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byId = Window.partitionBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // Inclusive prefix mass in commonness order: cumulative Σwq² with
    // the COMMONEST feature first means each row sees the mass of
    // itself plus every commoner feature — the common prefix ending
    // here. A row is indexed once that prefix mass reaches tq, so the
    // unindexed common prefix has L2 mass < tq and any qualifying
    // pair must share at least one indexed token.
    val byCommonFirst = Window.partitionBy(col("id"))
      .orderBy(col("df").desc, col("g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tq = (t - 1e-3d) * 1e6d
    // Weights + prefix flag in one frame; consumed by the candidate
    // join (both sides) and the verify vectors — checkpoint once.
    val w = tok
      .withColumn("df", count(lit(1)).over(byG))
      .filter(col("df") >= dfMin && col("df") <= dfMax)
      .withColumn("n2", sum(col("c") * col("c")).over(byId))
      .withColumn("wq",
        floor(col("c").cast("double") / sqrt(col("n2").cast("double"))
          * lit(1e6d) + lit(0.5d)).cast("long"))
      .withColumn("ssq", sum(col("wq") * col("wq")).over(byCommonFirst))
      .select(col("id"), col("g"), col("wq"),
        (col("ssq").cast("double") >= lit(tq * tq)).as("pfx"))
      .localCheckpoint(false)
    val cand = w.filter(col("pfx")).select(col("id"), col("g")).as("p")
      .join(w.select(col("id"), col("g")).as("f"),
        col("p.g") === col("f.g") && col("p.id") < col("f.id"))
      .select(col("p.id").as("id_a"), col("f.id").as("id_b"))
      .distinct()
    // Verify against per-document SORTED term vectors with the native
    // two-pointer merge ([[graft.functions.SortedDot]]): features as
    // 128-bit digests split into parallel ARRAY<BIGINT> columns, one
    // compiled zero-allocation O(n+m) merge per candidate. Build side
    // is one row per document (broadcastable at this scale; id-keyed
    // shuffle join beyond). See SortedDot's scaladoc for the measured
    // A/B against the exploded-join / map_zip_with / struct-merge
    // alternatives (14 s / 16 s / 12 s → this plan).
    val docvec = w.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(
        xxhash64(col("g")).as("k1"),
        xxhash64(lit("p2"), col("g")).as("k2"),
        col("wq").as("w")))).as("v"))
      .select(col("id"), struct(
        expr("transform(v, x -> x.k1)").as("k1"),
        expr("transform(v, x -> x.k2)").as("k2"),
        expr("transform(v, x -> x.w)").as("w")).as("sv"))
      .localCheckpoint(false)
    val thr = math.floor(t * 1e12d).toLong
    // Numbered repartition before the verify joins: candidate rows
    // are byte-small but each costs a SortedDot merge — the exact
    // class where AQE's size-based coalescing under-parallelizes (the
    // editNearDups Levenshtein lesson). Interleaved A/B r17
    // (ApVerifyProbe, 7 rounds, sf0.1): repart median 2.16 s vs AQE
    // 2.22 s, with the post-JIT rounds favoring repart 4/4 — a small
    // consistent win here, unlike llm_containment where AQE's 8-task
    // coalescing won (its posting stages are IO-shaped, not CPU/row).
    cand.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .join(broadcast(docvec.select(col("id").as("id_a"), col("sv").as("sa"))),
        Seq("id_a"))
      .join(broadcast(docvec.select(col("id").as("id_b"), col("sv").as("sb"))),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.SortedDot.sortedDot(col("sa"), col("sb"))
          .as("dotq"))
      .filter(col("dotq") >= lit(thr))
  }
}
