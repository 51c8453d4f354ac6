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
    val tf = TfIdf.termFreq(docs.select(col("doc_id"), col("ws")),
      col("doc_id"), col("ws")).localCheckpoint(false)
    // global BM25 stats
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val tot = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    // per-lang query terms: top-3 by lang-df
    val langDf = docs.select(col("lang"), col("doc_id"), explode(array_distinct(col("ws"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("ldf"))
    val qTerms = langDf
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("ldf").desc, col("w"))))
      .filter(col("__rk") <= 3).select(col("lang"), col("w"))
      .join(broadcast(df), "w")
    // exact llm_bm25 per-term score, quantized to integer micro-units
    val perTerm = tf.join(broadcast(qTerms), "w")
      .join(dl, "id").crossJoin(broadcast(tot))
      .withColumn("__qs", floor(
        log(lit(1.0d) + (col("n") - col("df") + lit(0.5d))
          / (col("df") + lit(0.5d)))
          * (col("tf") * (lit(1.2d) + lit(1.0d)))
          / (col("tf") + lit(1.2d) * (lit(1.0d) - lit(0.75d)
            + lit(0.75d) * col("dl")
            / (col("sumdl").cast("double") / col("n").cast("double"))))
          * lit(1000000.0d)).cast("long"))
      .groupBy(col("lang"), col("id"))
      .agg(sum(col("__qs")).as("score"))
    val top10 = perTerm
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 10)
      .join(Tables.documents(s, d)
        .select(col("doc_id").as("id"), col("lang").as("__dlang")), "id")
      .withColumn("rel", (col("__dlang") === col("lang")).cast("long"))
    val relTotal = docs.groupBy(col("lang"))
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_mattr" -> mattrQ,
    "llm_stupid_backoff" -> sboQ,
    "llm_retrieval_eval" -> retrievalEvalQ,
  )

  def oracleSql: Map[String, String] = Map(
    "llm_mattr" -> mattrSql,
    "llm_stupid_backoff" -> sboSql,
    "llm_retrieval_eval" -> retrievalEvalSql,
  )
}
