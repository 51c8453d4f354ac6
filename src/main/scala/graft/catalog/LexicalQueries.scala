package graft.catalog

import graft.core.Tables
import graft.llm.{Lexical, TextOps, TfIdf}
import graft.catalog.Oracle._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical-diversity, backoff-LM, and retrieval-evaluation queries —
  * the round-14 additions to the training-data-pipeline surface:
  * MATTR (the length-robust type-token ratio), trigram stupid backoff
  * scored on a held-out split (so the backoff chain is live, not dead
  * code), and the per-language ranking-quality harness (P@10, MRR@10,
  * nDCG@10) every retrieval stack reports.
  */
object LexicalQueries {

  private def wordsSql(e: String): String =
    s"list_filter(string_split(trim($e), ' '), x -> x <> '')"

  // ----------------------------------------------------------- MATTR
  /** [[Lexical.mattr]] (window 50) per document. The window sum is an
    * exact integer count; one double division, r4'd. Short docs fall
    * back to plain TTR; the n_words column certifies which branch ran.
    */
  private def mattrQ(s: SparkSession, d: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
        r4(Lexical.mattr(col("ws"), 50)).as("mattr"))
      .orderBy(col("doc_id"))
  }

  private val mattrSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |), m AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
       |         CASE WHEN len(ws) >= 50 THEN
       |           CAST(list_sum(list_transform(range(1, len(ws) - 50 + 2),
       |                  i -> len(list_distinct(list_slice(ws, i, i + 49)))))
       |                AS DOUBLE)
       |             / (CAST(len(ws) - 50 + 1 AS DOUBLE) * 50.0)
       |         WHEN len(ws) > 0 THEN
       |           CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
       |         END AS mattr
       |  FROM docs
       |)
       |SELECT doc_id, n_words, ${r4Sql("mattr")} AS mattr
       |FROM m ORDER BY doc_id""".stripMargin

  // -------------------------------------------- stupid backoff LM
  /** [[Lexical.stupidBackoff]]: trigram counts from the EVEN doc_ids,
    * per-occurrence scores over the ODD doc_ids — the held-out shape
    * that keeps every branch of the backoff chain reachable. Output
    * is all exact integers (micro-nat floor-quantized before the
    * per-doc sum) plus the r4'd per-trigram average.
    */
  private def sboQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    val tri = Lexical.trigrams(docs, col("doc_id"), col("ws"))
      .localCheckpoint(false)
    val train = tri.filter(col("id") % 2 === 0)
      .select(col("u"), col("v"), col("w"))
    val eval = tri.filter(col("id") % 2 =!= 0)
    Lexical.stupidBackoff(train, eval)
      .select(col("id").as("doc_id"), col("n_tri"), col("n_oov"),
        col("q_sum"),
        r4(when(col("n_tri") > col("n_oov"),
          col("q_sum").cast("double")
            / (col("n_tri") - col("n_oov")).cast("double")
            / lit(1000000.0d))).as("avg_logs"))
      .orderBy(col("doc_id"))
  }

  private val sboSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |), tri AS (
       |  SELECT doc_id AS id, ws[i+1] AS u, ws[i+2] AS v, ws[i+3] AS w
       |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - 2)) AS i
       |        FROM docs WHERE len(ws) >= 3)
       |), train AS (SELECT u, v, w FROM tri WHERE id % 2 = 0),
       |ev AS (SELECT * FROM tri WHERE id % 2 <> 0),
       |c3 AS (
       |  SELECT u, v, w, CAST(count(*) AS BIGINT) AS c3 FROM train GROUP BY 1, 2, 3
       |), c2uv AS (
       |  SELECT u, v, CAST(sum(c3) AS BIGINT) AS c2uv FROM c3 GROUP BY 1, 2
       |), c2vw AS (
       |  SELECT v, w, CAST(sum(c3) AS BIGINT) AS c2vw FROM c3 GROUP BY 1, 2
       |), c1 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM train GROUP BY 1
       |), nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM train),
       |scored AS (
       |  SELECT ev.id,
       |         CASE WHEN c1w.c1 IS NOT NULL THEN
       |           CAST(floor(ln(coalesce(
       |             CASE WHEN c3.c3 IS NOT NULL
       |               THEN CAST(c3.c3 AS DOUBLE) / CAST(c2uv.c2uv AS DOUBLE) END,
       |             CASE WHEN c2vw.c2vw IS NOT NULL
       |               THEN CAST(0.4 AS DOUBLE) * CAST(c2vw.c2vw AS DOUBLE)
       |                    / CAST(c1v.c1 AS DOUBLE) END,
       |             CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
       |               * CAST(c1w.c1 AS DOUBLE) / CAST(nt.n_tot AS DOUBLE)
       |           )) * 1000000) AS BIGINT)
       |         END AS q
       |  FROM ev
       |  LEFT JOIN c3 USING (u, v, w)
       |  LEFT JOIN c2uv USING (u, v)
       |  LEFT JOIN c2vw ON ev.v = c2vw.v AND ev.w = c2vw.w
       |  LEFT JOIN c1 c1v ON ev.v = c1v.w
       |  LEFT JOIN c1 c1w ON ev.w = c1w.w
       |  CROSS JOIN nt
       |)
       |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_tri,
       |       CAST(sum(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |       CAST(coalesce(sum(q), 0) AS BIGINT) AS q_sum,
       |       ${r4Sql("CASE WHEN count(*) > sum(CASE WHEN q IS NULL THEN 1 ELSE 0 END)" +
                       " THEN CAST(coalesce(sum(q), 0) AS DOUBLE)" +
                       " / CAST(count(*) - sum(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS DOUBLE)" +
                       " / 1000000.0 END")} AS avg_logs
       |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ------------------------------------------- retrieval evaluation
  /** Ranking-quality harness: for each language, the query is that
    * language's 3 most-document-frequent terms (deterministic by
    * df desc, term), scored over the whole corpus with the exact
    * integer-quantized BM25 of `llm_bm25`; relevance is lang match.
    * Reports P@10, MRR@10 and nDCG@10 per language.
    *
    * Cross-engine float discipline: the rank discounts 1/log₂(i+1)
    * are NOT recomputed per engine (libm log₂ may differ in the last
    * ulp and flip a floor) — they are a fixed integer nano-unit table
    * computed once and embedded as literals in both plans, so DCG and
    * ideal-DCG are exact integer sums and nDCG is one double
    * division. MRR and P@10 are single divisions of exact integers.
    */
  private val discountQ: Seq[Long] = Seq(
    1000000000L, 630929754L, 500000000L, 430676558L, 386852807L,
    356207187L, 333333333L, 315464877L, 301029996L, 289064826L)
  private val idcgPrefix: Seq[Long] = discountQ.scanLeft(0L)(_ + _).tail

  private def retrievalEvalQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"), TextOps.words(col("text")).as("ws"))
    // (A dl-as-window-on-tf collapse was A/B-REJECTED here —
    // R16AbProbe interleaved: 2.62 vs 2.41 s; the id-window's sort
    // costs more than the separate dl aggregation + join-back saves.)
    val tf = TfIdf.termFreq(docs.select(col("doc_id"), col("ws")),
      col("doc_id"), col("ws")).localCheckpoint(false)
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    // one-row corpus totals collect to literals (the TfIdf.bm25 move —
    // a broadcast subquery's build would re-execute the dl subtree);
    // running this FIRST also anchors the lazy tf checkpoint before
    // the scoring branches could race for it (the stupidBackoff trick)
    val totR = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
    val nDocs = totR.getLong(0)
    val sumdl = if (totR.isNullAt(1)) 0L else totR.getLong(1)
    // per-lang query terms: top-3 by lang-df. A (lang, w) document
    // count is exactly the tf frame (one row per doc×term) joined to
    // the doc→lang map — deriving it from the CHECKPOINTED tf replaces
    // a second tokenize+explode pass over the corpus with a pruned
    // two-column scan + one aggregation. (Deriving the GLOBAL df from
    // langDf instead — which removes the vocab shuffle but needs an
    // eager langDf checkpoint for its two consumers — was
    // A/B-REJECTED: R16AbProbe interleaved 2.22 vs 1.88 s; the
    // vocab-sized materialization costs more than the shuffle.)
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val docLang = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("lang"))
    val langDf = tf.select(col("id"), col("w")).join(docLang, "id")
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("ldf"))
    // broadcast the ≤3·|langs|-row top-3 side, never the
    // vocabulary-sized df frame: the r15 orientation collected the
    // whole vocab to the driver per execution — fine at sf0.1, wrong
    // at scale (TfIdf's own rule: unbounded vocab frames carry no
    // broadcast hint). Costs ~7% at sf0.1 (R16AbProbe interleaved,
    // 2.14 vs 2.00 s — one nested broadcast wave inside the qTerms
    // build); a driver-side top3 collect was ALSO rejected (0.81x —
    // it serializes a job the broadcast futures overlap).
    val top3 = langDf
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("ldf").desc, col("w"))))
      .filter(col("__rk") <= 3).select(col("lang"), col("w"))
    val qTerms = df.join(broadcast(top3), "w")
    // exact llm_bm25 per-term score, quantized to integer micro-units
    val perTerm = tf.join(broadcast(qTerms), "w")
      .join(dl, "id")
      .withColumn("__qs", floor(
        log(lit(1.0d) + (lit(nDocs) - col("df") + lit(0.5d))
          / (col("df") + lit(0.5d)))
          * (col("tf") * (lit(1.2d) + lit(1.0d)))
          / (col("tf") + lit(1.2d) * (lit(1.0d) - lit(0.75d)
            + lit(0.75d) * col("dl")
            / (lit(sumdl).cast("double") / lit(nDocs).cast("double"))))
          * lit(1000000.0d)).cast("long"))
      .groupBy(col("lang"), col("id"))
      .agg(sum(col("__qs")).as("score"))
    val top10 = perTerm
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 10)
      .join(docLang.select(col("id"), col("lang").as("__dlang")), "id")
      .withColumn("rel", (col("__dlang") === col("lang")).cast("long"))
    val relTotal = docLang.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rel_corpus"))
    val dArr = array(discountQ.map(lit): _*)
    val pArr = array(idcgPrefix.map(lit): _*)
    top10.groupBy(col("lang"))
      .agg(sum(col("rel")).as("__nrel"),
        min(when(col("rel") === 1L, col("rank"))).as("__firstrel"),
        sum(when(col("rel") === 1L,
          element_at(dArr, col("rank").cast("int"))).otherwise(0L)).as("__dcgq"))
      .join(broadcast(relTotal), "lang")
      .select(col("lang"), col("n_rel_corpus"),
        r4(col("__nrel").cast("double") / lit(10.0d)).as("p_at_10"),
        r4(when(col("__firstrel").isNotNull,
          lit(1.0d) / col("__firstrel").cast("double"))).as("mrr_at_10"),
        r4(col("__dcgq").cast("double")
          / element_at(pArr, least(col("n_rel_corpus"), lit(10L)).cast("int"))
            .cast("double")).as("ndcg_at_10"))
      .orderBy(col("lang"))
  }

  private val retrievalEvalSql: String = {
    val dCase = discountQ.zipWithIndex
      .map { case (q, i) => s"WHEN ${i + 1} THEN $q" }.mkString(" ")
    val pCase = idcgPrefix.zipWithIndex
      .map { case (q, i) => s"WHEN ${i + 1} THEN $q" }.mkString(" ")
    s"""WITH docs AS (
       |  SELECT doc_id, lang, ${wordsSql("text")} AS ws FROM documents
       |), tfc AS (
       |  SELECT doc_id AS id, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS w FROM docs) GROUP BY 1, 2
       |), dfc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1
       |), dl AS (
       |  SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM tfc GROUP BY 1
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl
       |), ldf AS (
       |  SELECT lang, w, CAST(count(*) AS BIGINT) AS ldf
       |  FROM (SELECT lang, doc_id, unnest(list_distinct(ws)) AS w FROM docs)
       |  GROUP BY 1, 2
       |), qterms AS (
       |  SELECT lang, w, df FROM (
       |    SELECT lang, w,
       |           row_number() OVER (PARTITION BY lang ORDER BY ldf DESC, w) AS rk
       |    FROM ldf) JOIN dfc USING (w)
       |  WHERE rk <= 3
       |), per_term AS (
       |  SELECT q.lang, t.id,
       |         CAST(floor(
       |           ln(1 + (tot.n - q.df + CAST(0.5 AS DOUBLE)) / (q.df + CAST(0.5 AS DOUBLE)))
       |             * (t.tf * (CAST(1.2 AS DOUBLE) + 1))
       |             / (t.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
       |                  + CAST(0.75 AS DOUBLE) * d.dl
       |                  / (CAST(tot.sumdl AS DOUBLE) / CAST(tot.n AS DOUBLE))))
       |           * 1000000) AS BIGINT) AS qs
       |  FROM tfc t JOIN qterms q ON t.w = q.w JOIN dl d ON d.id = t.id CROSS JOIN tot
       |), scored AS (
       |  SELECT lang, id, CAST(sum(qs) AS BIGINT) AS score
       |  FROM per_term GROUP BY 1, 2
       |), ranked AS (
       |  SELECT lang, id,
       |         row_number() OVER (PARTITION BY lang ORDER BY score DESC, id) AS rank
       |  FROM scored
       |), top10 AS (
       |  SELECT r.lang, r.id, r.rank,
       |         CASE WHEN dd.lang = r.lang THEN 1 ELSE 0 END AS rel
       |  FROM ranked r JOIN documents dd ON r.id = dd.doc_id
       |  WHERE r.rank <= 10
       |), rel_tot AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_rel_corpus FROM docs GROUP BY 1
       |), agg AS (
       |  SELECT lang,
       |         CAST(sum(rel) AS BIGINT) AS nrel,
       |         min(CASE WHEN rel = 1 THEN rank END) AS firstrel,
       |         CAST(sum(CASE WHEN rel = 1 THEN
       |           CASE rank $dCase END ELSE 0 END) AS BIGINT) AS dcgq
       |  FROM top10 GROUP BY 1
       |)
       |SELECT a.lang, n_rel_corpus,
       |       ${r4Sql("CAST(nrel AS DOUBLE) / 10.0")} AS p_at_10,
       |       ${r4Sql("CASE WHEN firstrel IS NOT NULL THEN 1.0 / CAST(firstrel AS DOUBLE) END")} AS mrr_at_10,
       |       ${r4Sql(s"CAST(dcgq AS DOUBLE) / CAST(CASE least(n_rel_corpus, 10) $pCase END AS DOUBLE)")} AS ndcg_at_10
       |FROM agg a JOIN rel_tot USING (lang) ORDER BY lang""".stripMargin
  }

  // ------------------------------------- population stability index
  /** PSI per source against the whole-corpus document-length
    * distribution — the drift monitor a production data pipeline
    * alarms on (PSI > 0.25 = major shift). Bins are the global
    * deciles of n_chars assigned by ntile(10) over the total
    * (n_chars, doc_id) order — both engines place the remainder rows
    * in the leading bins identically, so bin membership is exact.
    * PSI = Σ_b (p_sb − q_b)·ln(p_sb/q_b); every share is an exact
    * rational, each bin term is floor-quantized to pico-units before
    * the ≤10-term sum, so the sum is an exact integer. Bins where the
    * source has no documents are skipped and counted (the standard
    * ε-free convention, reported rather than fudged).
    *
    * Scale note: exact global ntile is the ORACLE-expressible binning
    * (one total-order pass, the W4 global-row_number precedent). At
    * 100 TB the bin edges come from approx_percentile (or the
    * [[graft.llm.Sketches]] KMV quantiles) computed once and joined
    * as literals — the PSI arithmetic downstream is unchanged.
    */
  private def psiQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("bin", ntile(10).over(
        Window.orderBy(col("n_chars"), col("doc_id"))))
    val cells = docs.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_sb"))
    val byBin = docs.groupBy(col("bin")).agg(count(lit(1)).as("n_b"))
    val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val n = docs.agg(count(lit(1)).as("n_tot"))
    cells.join(broadcast(byBin), "bin").join(broadcast(bySrc), "source")
      .crossJoin(broadcast(n))
      .withColumn("__term", floor(
        (col("n_sb").cast("double") / col("n_s").cast("double")
          - col("n_b").cast("double") / col("n_tot").cast("double"))
          * log((col("n_sb") * col("n_tot")).cast("double")
            / (col("n_s") * col("n_b")).cast("double"))
          * lit(1.0e12d) + lit(0.5d)).cast("long"))
      .groupBy(col("source"))
      .agg(first(col("n_s")).as("n_docs"),
        count(lit(1)).as("n_bins_present"),
        sum(col("__term")).as("__psi_q"))
      .select(col("source"), col("n_docs"), col("n_bins_present"),
        r4(col("__psi_q").cast("double") / lit(1.0e12d)).as("psi"))
      .orderBy(col("source"))
  }

  private val psiSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source, n_chars,
       |         ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
       |  FROM documents
       |), cells AS (
       |  SELECT source, bin, CAST(count(*) AS BIGINT) AS n_sb
       |  FROM docs GROUP BY 1, 2
       |), by_bin AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n_b FROM docs GROUP BY 1
       |), by_src AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM docs GROUP BY 1
       |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM docs),
       |terms AS (
       |  SELECT source, n_s,
       |         CAST(floor(
       |           (CAST(n_sb AS DOUBLE) / CAST(n_s AS DOUBLE)
       |             - CAST(n_b AS DOUBLE) / CAST(n_tot AS DOUBLE))
       |           * ln(CAST(n_sb * n_tot AS DOUBLE) / CAST(n_s * n_b AS DOUBLE))
       |           * 1000000000000.0 + 0.5) AS BIGINT) AS term
       |  FROM cells JOIN by_bin USING (bin) JOIN by_src USING (source)
       |  CROSS JOIN tot
       |)
       |SELECT source, any_value(n_s) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_bins_present,
       |       ${r4Sql("CAST(sum(term) AS DOUBLE) / 1000000000000.0")} AS psi
       |FROM terms GROUP BY 1 ORDER BY source""".stripMargin

  // --------------------------------------------- clustering evaluation
  /** External clustering quality of the k-means cells against the
    * labeled embeddings: per-cell majority label + exact purity, and
    * corpus NMI = I(C;L)/√(H(C)·H(L)) (Strehl & Ghosh 2002). The fit
    * is the catalog's Lloyd convention (k = 4, 3 iterations, first-k
    * init); the oracle unrolls the SAME fit in SQL (the
    * `llm_kmeans_ivf` fixture-stability caveat applies). All counts
    * are exact integers; each mutual-information / entropy term is
    * floor-quantized to pico-units before its sum, so I, H(C), H(L)
    * are exact integers and NMI is one double expression over them.
    * Global purity and NMI are broadcast onto the per-cell rows.
    */
  private def clusterEvalQ(s: SparkSession, d: String): DataFrame = {
    import graft.llm.Similarity
    val emb = Tables.embeddings(s, d)
    val cents = Similarity.kMeansFit(emb, col("vec_id"), col("embedding"),
      k = 4, iters = 3)
    val assigned = Similarity.kMeansAssign(
        emb.select(col("vec_id").as("id"), col("embedding").as("v")), cents)
      .join(emb.select(col("vec_id").as("id"), col("label")), "id")
    val cells = assigned.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("n_cl"))
      .localCheckpoint(false)
    val byCell = cells.groupBy(col("cell")).agg(sum(col("n_cl")).as("n_c"),
      max_by(col("label"), col("n_cl") * lit(1000L) - col("label")).as("maj_label"),
      max(col("n_cl")).as("n_maj"))
    val byLabel = cells.groupBy(col("label")).agg(sum(col("n_cl")).as("n_l"))
    val n = cells.agg(sum(col("n_cl")).as("n_tot"))
    val iq = cells.join(broadcast(byCell.select(col("cell"), col("n_c"))), "cell")
      .join(broadcast(byLabel), "label").crossJoin(broadcast(n))
      .select(floor(
        (col("n_cl").cast("double") / col("n_tot").cast("double"))
          * log((col("n_cl") * col("n_tot")).cast("double")
            / (col("n_c") * col("n_l")).cast("double"))
          * lit(1.0e12d) + lit(0.5d)).cast("long").as("t"))
      .agg(sum(col("t")).as("i_q"))
    def entQ(counts: DataFrame, cnt: Column): DataFrame =
      counts.crossJoin(broadcast(n))
        .select(floor(
          -(cnt.cast("double") / col("n_tot").cast("double"))
            * log(cnt.cast("double") / col("n_tot").cast("double"))
            * lit(1.0e12d) + lit(0.5d)).cast("long").as("t"))
        .agg(sum(col("t")).as("h_q"))
    val hc = entQ(byCell.select(col("n_c")), col("n_c"))
      .withColumnRenamed("h_q", "hc_q")
    val hl = entQ(byLabel.select(col("n_l")), col("n_l"))
      .withColumnRenamed("h_q", "hl_q")
    val purity = byCell.agg(sum(col("n_maj")).as("p_num"))
    byCell
      .crossJoin(broadcast(purity)).crossJoin(broadcast(n))
      .crossJoin(broadcast(iq)).crossJoin(broadcast(hc)).crossJoin(broadcast(hl))
      .select(col("cell"), col("n_c"), col("maj_label"), col("n_maj"),
        r4(col("p_num").cast("double") / col("n_tot").cast("double")).as("purity"),
        r4(col("i_q").cast("double")
          / sqrt(col("hc_q").cast("double") * col("hl_q").cast("double"))).as("nmi"))
      .orderBy(col("cell"))
  }

  private val clusterEvalSql: String = {
    val k = 4; val iters = 3; val dimPlus1 = 65
    def centsCte(i: Int, from: String): String =
      s"""ccomp$i AS (
         |  SELECT cell, i, avg(v[i]) AS c
         |  FROM $from CROSS JOIN (SELECT i FROM range(1, $dimPlus1) t(i))
         |  GROUP BY 1, 2
         |), ccents$i AS (SELECT cell, list(c ORDER BY i) AS centroid FROM ccomp$i GROUP BY 1)"""
        .stripMargin
    def d2Sql(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dimPlus1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT id, v, label, cell FROM (
         |    SELECT p.id, p.v, p.label, c.cell,
         |           row_number() OVER (PARTITION BY p.id
         |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
         |    FROM pts p CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      assignCte(s"cassign$i", s"ccents${i - 1}") + ",\n" +
        centsCte(i, s"cassign$i")
    }.mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v, label FROM embeddings
       |), ccents0 AS (
       |  SELECT (row_number() OVER (ORDER BY id)) - 1 AS cell, v AS centroid
       |  FROM pts QUALIFY row_number() OVER (ORDER BY id) <= $k
       |),
       |$iterCtes,
       |${assignCte("final_assign", s"ccents$iters")},
       |cells AS (
       |  SELECT cell, label, CAST(count(*) AS BIGINT) AS n_cl
       |  FROM final_assign GROUP BY 1, 2
       |), by_cell AS (
       |  SELECT cell, CAST(sum(n_cl) AS BIGINT) AS n_c,
       |         CAST(arg_max(label, n_cl * 1000 - label) AS INTEGER) AS maj_label,
       |         CAST(max(n_cl) AS BIGINT) AS n_maj
       |  FROM cells GROUP BY 1
       |), by_label AS (
       |  SELECT label, CAST(sum(n_cl) AS BIGINT) AS n_l FROM cells GROUP BY 1
       |), tot AS (SELECT CAST(sum(n_cl) AS BIGINT) AS n_tot FROM cells),
       |iq AS (
       |  SELECT CAST(sum(CAST(floor(
       |           (CAST(n_cl AS DOUBLE) / CAST(n_tot AS DOUBLE))
       |           * ln(CAST(n_cl * n_tot AS DOUBLE) / CAST(n_c * n_l AS DOUBLE))
       |           * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS i_q
       |  FROM cells JOIN by_cell USING (cell) JOIN by_label USING (label)
       |  CROSS JOIN tot
       |), hc AS (
       |  SELECT CAST(sum(CAST(floor(
       |           -(CAST(n_c AS DOUBLE) / CAST(n_tot AS DOUBLE))
       |           * ln(CAST(n_c AS DOUBLE) / CAST(n_tot AS DOUBLE))
       |           * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hc_q
       |  FROM by_cell CROSS JOIN tot
       |), hl AS (
       |  SELECT CAST(sum(CAST(floor(
       |           -(CAST(n_l AS DOUBLE) / CAST(n_tot AS DOUBLE))
       |           * ln(CAST(n_l AS DOUBLE) / CAST(n_tot AS DOUBLE))
       |           * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hl_q
       |  FROM by_label CROSS JOIN tot
       |), pur AS (SELECT CAST(sum(n_maj) AS BIGINT) AS p_num FROM by_cell)
       |SELECT CAST(cell AS INTEGER) AS cell, n_c, maj_label, n_maj,
       |       ${r4Sql("CAST(p_num AS DOUBLE) / CAST(n_tot AS DOUBLE)")} AS purity,
       |       ${r4Sql("CAST(i_q AS DOUBLE) / sqrt(CAST(hc_q AS DOUBLE) * CAST(hl_q AS DOUBLE))")} AS nmi
       |FROM by_cell CROSS JOIN tot CROSS JOIN iq CROSS JOIN hc CROSS JOIN hl
       |CROSS JOIN pur
       |ORDER BY cell""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_mattr" -> mattrQ,
    "llm_stupid_backoff" -> sboQ,
    "llm_retrieval_eval" -> retrievalEvalQ,
    "llm_psi" -> psiQ,
    "llm_cluster_eval" -> clusterEvalQ,
  )

  def oracleSql: Map[String, String] = Map(
    "llm_mattr" -> mattrSql,
    "llm_stupid_backoff" -> sboSql,
    "llm_retrieval_eval" -> retrievalEvalSql,
    "llm_psi" -> psiSql,
    "llm_cluster_eval" -> clusterEvalSql,
  )
}
