package graft.catalog

import graft.core.Tables
import graft.llm.{AllPairs, GraphOps, TextOps}
import graft.catalog.Oracle._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14c additions — the similarity-join / directed-centrality /
  * document-statistics corner of the training-data-pipeline surface:
  *
  *  - `llm_allpairs_sim`: thresholded cosine ALL-pairs join with
  *    prefix filtering ([[AllPairs]], Bayardo et al. WWW'07) — the
  *    missing sibling of the top-k ANN family: "give me every pair
  *    above t", never materializing the quadratic token self-join the
  *    oracle brute-forces.
  *  - `llm_hits`: Kleinberg hubs/authorities over the near-dup graph
  *    oriented later→earlier ([[GraphOps.hits]]) — canonical-source
  *    vs re-packager scoring that undirected PageRank can't separate.
  *  - `llm_readability`: Flesch reading-ease / Flesch-Kincaid grade
  *    with the standard vowel-group syllable heuristic — the
  *    classic document-quality feature next to the Gopher rules.
  *  - `ts_gini`: Gini concentration of per-user spend by event type —
  *    computed over the VALUE HISTOGRAM (tie-block algebra), so the
  *    sort is over distinct amounts, not users; the oracle runs the
  *    naive ranked form and the integer tie-block identity makes them
  *    exactly equal.
  */
object SimGraphQueries {

  private def wordsSql(e: String): String =
    s"list_filter(string_split(trim($e), ' '), x -> x <> '')"

  // ------------------------------------------ all-pairs similarity
  /** [[AllPairs.cosinePairs]] at t=0.7 over df-banded [2,64]
    * word-TRIGRAM vectors (the corpus vocabulary is ~31 words, so
    * unigram features degenerate — the same reason the MinHash
    * pipeline shingles 3-grams), on the corpus + truncated
    * near-copies (the `llm_minhash_lsh` fixture shape — doc_id%5
    * gets a copy with the last 3 words dropped, cosine ≈ 1 against
    * its source). The oracle brute-forces Σdf² shingle pairs; our
    * plan generates candidates from rare-shingle prefixes only.
    */
  private def allPairsQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
    val pert = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w"))
    val base = docs.unionByName(pert)
      .select(col("doc_id"), TextOps.wordNgrams(col("w"), 3).as("sh"))
    AllPairs.cosinePairs(base, col("doc_id"), col("sh"),
        t = 0.7d, dfMin = 2L, dfMax = 64L)
      .select(col("id_a"), col("id_b"),
        r4(col("dotq").cast("double") / lit(1e12d)).as("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val allPairsSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS w FROM documents
       |), base AS (
       |  SELECT doc_id, w FROM docs
       |  UNION ALL
       |  SELECT doc_id + 100000, w[1:greatest(len(w)-3, 0)] FROM docs
       |  WHERE doc_id % 5 = 0
       |), tok AS (
       |  SELECT doc_id AS id, g, CAST(count(*) AS BIGINT) AS c
       |  FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(w) >= 3
       |      THEN list_transform(range(1, len(w)-1),
       |             i -> array_to_string(w[i:i+2], ' '))
       |      ELSE CAST([] AS VARCHAR[]) END) AS g
       |    FROM base) GROUP BY 1, 2
       |), dfq AS (
       |  SELECT g FROM tok GROUP BY 1
       |  HAVING count(*) BETWEEN 2 AND 64
       |), kept AS (
       |  SELECT t.id, t.g, t.c FROM tok t JOIN dfq USING (g)
       |), nrm AS (
       |  SELECT id, CAST(sum(c * c) AS BIGINT) AS n2 FROM kept GROUP BY 1
       |), wv AS (
       |  SELECT id, g,
       |         CAST(floor(CAST(c AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE))
       |              * 1e6 + 0.5) AS BIGINT) AS wq
       |  FROM kept JOIN nrm USING (id)
       |), p AS (
       |  SELECT a.id AS ia, b.id AS ib,
       |         CAST(sum(a.wq * b.wq) AS BIGINT) AS dotq
       |  FROM wv a JOIN wv b ON a.g = b.g AND a.id < b.id GROUP BY 1, 2
       |)
       |SELECT ia AS id_a, ib AS id_b,
       |       ${r4Sql("CAST(dotq AS DOUBLE) / 1e12")} AS cosine
       |FROM p WHERE dotq >= CAST(floor(0.7 * 1e12) AS BIGINT)
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------ HITS centrality
  /** [[GraphOps.hits]] (3 iterations) over the thresholded MinHash
    * near-dup graph of `llm_dedup_clusters`/`llm_pagerank`, oriented
    * id_b→id_a (later document points at the earlier one it
    * duplicates). The oracle unrolls the same 3 alternating
    * pico-quantized half-steps.
    */
  private def hitsQ(s: SparkSession, d: String): DataFrame =
    GraphOps.hits(LlmQueries.minhashPairs(s, d),
        col("id_b"), col("id_a"), iters = 3)
      .select(col("id").as("doc_id"), col("out_deg"), col("in_deg"),
        r4(col("h")).as("hub"), r4(col("a")).as("auth"))
      .orderBy(col("doc_id"))

  private val hitsSql: String = {
    val iter = (1 to 3).map { k =>
      s"""aq$k AS MATERIALIZED (
         |  SELECT e.dst,
         |         CAST(SUM(CAST(floor(r.h * 1e12) AS BIGINT)) AS BIGINT) AS sq
         |  FROM he e JOIN h${k - 1} r ON r.id = e.src GROUP BY 1
         |), at$k AS MATERIALIZED (SELECT CAST(SUM(sq) AS BIGINT) AS s FROM aq$k),
         |a$k AS MATERIALIZED (
         |  SELECT n.id,
         |         CAST(coalesce(q.sq, 0) AS DOUBLE) / CAST(t.s AS DOUBLE) AS a
         |  FROM hn n LEFT JOIN aq$k q ON q.dst = n.id CROSS JOIN at$k t
         |), hq$k AS MATERIALIZED (
         |  SELECT e.src,
         |         CAST(SUM(CAST(floor(r.a * 1e12) AS BIGINT)) AS BIGINT) AS sq
         |  FROM he e JOIN a$k r ON r.id = e.dst GROUP BY 1
         |), ht$k AS MATERIALIZED (SELECT CAST(SUM(sq) AS BIGINT) AS s FROM hq$k),
         |h$k AS MATERIALIZED (
         |  SELECT n.id,
         |         CAST(coalesce(q.sq, 0) AS DOUBLE) / CAST(t.s AS DOUBLE) AS h
         |  FROM hn n LEFT JOIN hq$k q ON q.src = n.id CROSS JOIN ht$k t
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${LlmQueries.mhPairsCtes}, hp AS MATERIALIZED (
       |  SELECT i.id_a, i.id_b
       |  FROM inter i
       |  JOIN sizes sa ON sa.id = i.id_a
       |  JOIN sizes sb ON sb.id = i.id_b
       |  WHERE i.ninter * 1.0 / (sa.n + sb.n - i.ninter) >= 0.5
       |), he AS MATERIALIZED (
       |  SELECT id_b AS src, id_a AS dst FROM hp
       |), hn AS MATERIALIZED (
       |  SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM he UNION ALL SELECT dst FROM he)
       |), h0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM hn),
       |$iter,
       |od AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS c FROM he GROUP BY 1),
       |idg AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS c FROM he GROUP BY 1)
       |SELECT n.id AS doc_id,
       |       coalesce(od.c, 0) AS out_deg, coalesce(idg.c, 0) AS in_deg,
       |       ${r4Sql("h3.h")} AS hub, ${r4Sql("a3.a")} AS auth
       |FROM hn n
       |LEFT JOIN od ON od.id = n.id
       |LEFT JOIN idg ON idg.id = n.id
       |JOIN h3 ON h3.id = n.id
       |JOIN a3 ON a3.id = n.id
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------- label propagation
  /** [[GraphOps.labelPropagate]] (2 rounds) over the thresholded
    * MinHash near-dup graph: seeds are the `lang` labels of base
    * documents with doc_id % 3 ≠ 0 (a third held out, and the planted
    * +100000 copies are unlabeled by construction), so the rounds do
    * real recovery work — a near-copy of a labeled document inherits
    * its language without a classifier. Majority vote, (count desc,
    * label asc) tie-break, all-integer.
    */
  private def labelPropQ(s: SparkSession, d: String): DataFrame = {
    val seeds = Tables.documents(s, d)
      .filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("lang"))
    GraphOps.labelPropagate(LlmQueries.minhashPairs(s, d),
        col("id_a"), col("id_b"), seeds, col("doc_id"), col("lang"),
        rounds = 2)
      .select(col("id").as("doc_id"), col("label"), col("is_seed"))
      .orderBy(col("doc_id"))
  }

  private val labelPropSql: String = {
    val round = (1 to 2).map { k =>
      s"""nb$k AS MATERIALIZED (
         |  SELECT e.y AS id, l.label, CAST(count(*) AS BIGINT) AS c
         |  FROM lsym e JOIN l${k - 1} l ON l.id = e.x GROUP BY 1, 2
         |), md$k AS MATERIALIZED (
         |  SELECT id, label FROM (
         |    SELECT id, label,
         |           row_number() OVER (PARTITION BY id
         |                              ORDER BY c DESC, label) AS rn
         |    FROM nb$k) WHERE rn = 1
         |), l$k AS MATERIALIZED (
         |  SELECT id, label FROM l0
         |  UNION ALL
         |  SELECT m.id, m.label FROM md$k m
         |  LEFT JOIN l0 s ON s.id = m.id WHERE s.id IS NULL
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${LlmQueries.mhPairsCtes}, lp AS MATERIALIZED (
       |  SELECT i.id_a, i.id_b
       |  FROM inter i
       |  JOIN sizes sa ON sa.id = i.id_a
       |  JOIN sizes sb ON sb.id = i.id_b
       |  WHERE i.ninter * 1.0 / (sa.n + sb.n - i.ninter) >= 0.5
       |), lsym AS MATERIALIZED (
       |  SELECT id_a AS x, id_b AS y FROM lp
       |  UNION
       |  SELECT id_b, id_a FROM lp
       |), lnodes AS MATERIALIZED (
       |  SELECT DISTINCT x AS id FROM lsym
       |), l0 AS MATERIALIZED (
       |  SELECT n.id, dd.lang AS label
       |  FROM lnodes n JOIN documents dd ON dd.doc_id = n.id
       |  WHERE dd.doc_id % 3 <> 0
       |), $round
       |SELECT n.id AS doc_id, l.label,
       |       (s.id IS NOT NULL) AS is_seed
       |FROM lnodes n
       |LEFT JOIN l2 l ON l.id = n.id
       |LEFT JOIN l0 s ON s.id = n.id
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------- readability
  /** Flesch reading ease + Flesch-Kincaid grade per document (Flesch
    * 1948; Kincaid et al. 1975), with the standard deterministic
    * heuristics: sentences = runs of [.!?], syllables per word =
    * max(1, vowel-group runs). All three counts are exact integers;
    * the two scores are fixed-order double expressions, r4'd.
    */
  private def readabilityQ(s: SparkSession, d: String): DataFrame = {
    val counted = Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextOps.words(col("text")).as("ws"), col("text"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        greatest(lit(1L),
          expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"))
          .as("n_sentences"),
        expr("""aggregate(
                  transform(ws, w -> greatest(1,
                    size(regexp_extract_all(lower(w), '[aeiouy]+', 0)))),
                  0L, (acc, x) -> acc + CAST(x AS BIGINT))""")
          .as("n_syllables"))
      .filter(col("n_words") > 0L)
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    counted.select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        r4(lit(206.835d) - lit(1.015d) * wps - lit(84.6d) * spw).as("fre"),
        r4(lit(0.39d) * wps + lit(11.8d) * spw - lit(15.59d)).as("fkgl"))
      .orderBy(col("doc_id"))
  }

  private val readabilitySql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text, ${wordsSql("text")} AS ws FROM documents
       |  WHERE text IS NOT NULL
       |), c AS (
       |  SELECT doc_id,
       |         CAST(len(ws) AS BIGINT) AS n_words,
       |         greatest(CAST(1 AS BIGINT),
       |           CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
       |           AS n_sentences,
       |         CAST(coalesce(list_sum(list_transform(ws,
       |           w -> greatest(1,
       |                len(regexp_extract_all(lower(w), '[aeiouy]+'))))), 0)
       |           AS BIGINT) AS n_syllables
       |  FROM docs
       |), f AS (
       |  SELECT doc_id, n_words, n_sentences, n_syllables,
       |         CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS wps,
       |         CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) AS spw
       |  FROM c WHERE n_words > 0
       |)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |       ${r4Sql("206.835 - 1.015 * wps - 84.6 * spw")} AS fre,
       |       ${r4Sql("0.39 * wps + 11.8 * spw - 15.59")} AS fkgl
       |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- Gini concentration
  /** Gini coefficient of per-user total spend, by event type:
    * G = Σᵢ(2i−n−1)xᵢ / (n·Σx) over ascending per-user cent totals.
    * The Spark plan aggregates the VALUE HISTOGRAM — one tie-block
    * row per distinct amount, contribution x·m·(2·cum−m−n) — so the
    * per-type window runs over distinct amounts, not users (the
    * 100 TB shape: amounts are bounded, users are not). Numerator in
    * decimal(38,0) (the `ts_beta` ADVICE lesson: BIGINT moment sums
    * wrap where the oracle auto-promotes); the single double division
    * happens on exact <2⁵³ integers in both engines.
    */
  private def giniQ(s: SparkSession, d: String): DataFrame = {
    val ux = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(cents(col("value"))).as("x"))
    val blocks = ux.groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("m"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = blocks
      .withColumn("cc", sum(col("m")).over(run))
      .withColumn("n", sum(col("m")).over(all))
      .withColumn("s", sum(col("x") * col("m")).over(all))
    scored.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_users"), max(col("s")).as("sum_cents"),
        sum(col("x").cast("decimal(38,0)") * col("m")
          * (col("cc") * 2 - col("m") - col("n"))).as("num"))
      .select(col("event_type"), col("n_users"), col("sum_cents"),
        r4(col("num").cast("double")
          / (col("n_users").cast("double") * col("sum_cents").cast("double")))
          .as("gini"))
      .orderBy(col("event_type"))
  }

  private val giniSql: String =
    s"""WITH ux AS (
       |  SELECT event_type, user_id,
       |         CAST(SUM(${centsSql("value")}) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2
       |), r AS (
       |  SELECT event_type, x,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY x, user_id) AS i,
       |         count(*) OVER (PARTITION BY event_type) AS n,
       |         SUM(x) OVER (PARTITION BY event_type) AS s
       |  FROM ux
       |), g AS (
       |  SELECT event_type,
       |         CAST(max(n) AS BIGINT) AS n_users,
       |         CAST(max(s) AS BIGINT) AS sum_cents,
       |         SUM(CAST(x AS HUGEINT) * (2 * i - n - 1)) AS num
       |  FROM r GROUP BY 1
       |)
       |SELECT event_type, n_users, sum_cents,
       |       ${r4Sql("CAST(num AS DOUBLE) / (CAST(n_users AS DOUBLE) * CAST(sum_cents AS DOUBLE))")} AS gini
       |FROM g ORDER BY event_type""".stripMargin

  // --------------------------------------------------- Benford screen
  /** First-significant-digit distribution of event values per type vs
    * Benford's law, with the chi-square statistic — the classic
    * data-quality / fraud screen. Digit extraction is STRING-based on
    * the exact cent total (first char of the decimal rendering), so
    * no engine's log10 ulp can flip a boundary value; expected
    * frequencies log10(1+1/d) are a fixed 9-entry literal table in
    * both engines; missing digits contribute their full n·p term via
    * a digit spine.
    */
  private val benfordP: Seq[Double] =
    (1 to 9).map(d => math.log10(1d + 1d / d))

  private def benfordQ(s: SparkSession, d: String): DataFrame = {
    val obs = Tables.events(s, d)
      .select(col("event_type"), cents(col("value")).as("c"))
      .filter(col("c") > 0L)
      .select(col("event_type"),
        substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val spine = obs.select(col("event_type")).distinct()
      .crossJoin(s.range(1, 10).select(col("id").as("digit")))
    val pArr = array(benfordP.map(lit): _*)
    val full = spine.join(obs, Seq("event_type", "digit"), "left")
      .select(col("event_type"), col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        element_at(pArr, col("digit").cast("int")).as("p"))
    val tot = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = full.withColumn("n", sum(col("n_obs")).over(tot))
      .withColumn("share", col("n_obs").cast("double") / col("n").cast("double"))
      .withColumn("term",
        (col("share") - col("p")) * (col("share") - col("p")) / col("p"))
    // chi2 = n·Σ terms; the per-digit terms are summed in digit order
    // via the pico-quantized integer trick so both engines add the
    // same exact integers
    scored
      .withColumn("tq", floor(col("term") * lit(1e12d)).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        sum(col("tq")).as("chiq"),
        sum(when(col("n_obs") > 0L, 1L).otherwise(0L)).as("n_digits"))
      .select(col("event_type"), col("n"), col("n_digits"),
        r4(col("n").cast("double")
          * (col("chiq").cast("double") / lit(1e12d))).as("chi2"))
      .orderBy(col("event_type"))
  }

  private val benfordSql: String = {
    val pList = benfordP.map(p => s"CAST($p AS DOUBLE)").mkString(", ")
    s"""WITH bo AS (
       |  SELECT event_type,
       |         CAST(substr(CAST(${centsSql("value")} AS VARCHAR), 1, 1)
       |              AS BIGINT) AS digit
       |  FROM events WHERE ${centsSql("value")} > 0
       |), oc AS (
       |  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_obs
       |  FROM bo GROUP BY 1, 2
       |), sp AS (
       |  SELECT t.event_type, d.digit
       |  FROM (SELECT DISTINCT event_type FROM oc) t
       |  CROSS JOIN (SELECT unnest(range(1, 10)) AS digit) d
       |), pv AS (SELECT [$pList] AS ps),
       |fl AS (
       |  SELECT sp.event_type, sp.digit,
       |         coalesce(oc.n_obs, 0) AS n_obs,
       |         pv.ps[CAST(sp.digit AS INTEGER)] AS p
       |  FROM sp LEFT JOIN oc USING (event_type, digit) CROSS JOIN pv
       |), sc AS (
       |  SELECT event_type, digit, n_obs, p,
       |         CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM fl
       |), tq AS (
       |  SELECT event_type, n, n_obs,
       |         CAST(floor(
       |           (CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - p)
       |           * (CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - p) / p
       |           * 1e12) AS BIGINT) AS t
       |  FROM sc
       |)
       |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |       CAST(sum(CASE WHEN n_obs > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_digits,
       |       ${r4Sql("CAST(max(n) AS DOUBLE) * (CAST(sum(t) AS DOUBLE) / 1e12)")} AS chi2
       |FROM tq GROUP BY 1 ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------ LSH recall audit
  /** End-to-end detection recall of the MinHash-LSH near-dup pipeline
    * against the PLANTED ground truth: every doc_id % 5 == 0 has a
    * truncated copy at +100000 (Jaccard ≈ 0.9), so the pipeline
    * should return each (a, a+100000) pair. The eval-harness
    * counterpart of `llm_ann_recall` for the dedup stack: recall of
    * planted pairs, plus how many additional (natural or band-noise)
    * pairs came back. One row.
    */
  private def lshRecallQ(s: SparkSession, d: String): DataFrame = {
    val pairs = LlmQueries.minhashPairs(s, d)
      .select(col("id_a"), col("id_b")).localCheckpoint(false)
    val planted = Tables.documents(s, d)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id_a"),
        (col("doc_id") + 100000L).as("id_b"))
    val found = planted.join(pairs, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
    val nPairs = pairs.agg(count(lit(1)).as("n_returned"))
    nPlanted.crossJoin(found).crossJoin(nPairs)
      .select(col("n_planted"), col("n_found"), col("n_returned"),
        (col("n_returned") - col("n_found")).as("n_extra"),
        r4(col("n_found").cast("double") / col("n_planted").cast("double"))
          .as("recall"))
  }

  private val lshRecallSql: String =
    s"""WITH ${LlmQueries.mhPairsCtes}, rp AS MATERIALIZED (
       |  SELECT i.id_a, i.id_b
       |  FROM inter i
       |  JOIN sizes sa ON sa.id = i.id_a
       |  JOIN sizes sb ON sb.id = i.id_b
       |  WHERE i.ninter * 1.0 / (sa.n + sb.n - i.ninter) >= 0.5
       |), pl AS (
       |  SELECT doc_id AS id_a, doc_id + 100000 AS id_b FROM documents
       |  WHERE doc_id % 5 = 0
       |), fnd AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_found
       |  FROM pl WHERE EXISTS (
       |    SELECT 1 FROM rp WHERE rp.id_a = pl.id_a AND rp.id_b = pl.id_b)
       |), np AS (SELECT CAST(count(*) AS BIGINT) AS n_planted FROM pl),
       |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_returned FROM rp)
       |SELECT n_planted, n_found, n_returned,
       |       n_returned - n_found AS n_extra,
       |       ${r4Sql("CAST(n_found AS DOUBLE) / CAST(n_planted AS DOUBLE)")} AS recall
       |FROM np CROSS JOIN fnd CROSS JOIN nr""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_benford"       -> benfordQ,
    "llm_lsh_recall"   -> lshRecallQ,
    "llm_allpairs_sim" -> allPairsQ,
    "llm_hits"         -> hitsQ,
    "llm_label_prop"   -> labelPropQ,
    "llm_readability"  -> readabilityQ,
    "ts_gini"          -> giniQ,
  )

  def oracleSql: Map[String, String] = Map(
    "ts_benford"       -> benfordSql,
    "llm_lsh_recall"   -> lshRecallSql,
    "llm_allpairs_sim" -> allPairsSql,
    "llm_hits"         -> hitsSql,
    "llm_label_prop"   -> labelPropSql,
    "llm_readability"  -> readabilitySql,
    "ts_gini"          -> giniSql,
  )
}
