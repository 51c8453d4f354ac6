package graft.catalog

import graft.core.Tables
import graft.llm.{Bpe, CorpusIo, CorpusStats, Dedup, Dsir, GraphOps, IncrementalDedup, Multimodal, NbClassifier, NgramLm, Packing, Pca, Retrieval, Sampling, Similarity, TextOps, TfIdf}
import graft.catalog.Oracle._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline queries (dedup, similarity search,
  * text analysis, multimodal plumbing) over `documents`/`embeddings`,
  * each with a DuckDB oracle. Output conventions as in
  * TimeSeriesQueries.
  *
  * Where a pipeline needs guaranteed positives (exact/near duplicates)
  * the query constructs deterministic perturbed copies of a slice of
  * `documents` (id + 100000, text truncated) inside both the Spark
  * plan and the oracle, so the detector's hits are verifiable.
  */
object LlmQueries {

  /** DuckDB twin of [[TextOps.normalize]]. */
  private def normSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  private def wordsSql(e: String): String =
    s"list_filter(string_split(trim($e), ' '), x -> x <> '')"

  // ----------------------------------------------------- exact dedup
  private def exactDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val dups = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    Dedup.exactDupMapping(
        docs.unionByName(dups), col("doc_id"), TextOps.fingerprint(col("text")))
      .orderBy(col("id"))
  }

  private val exactDedupSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0
       |), keyed AS (
       |  SELECT doc_id AS id, md5(${normSql("text")}) AS digest FROM base
       |), canon AS (SELECT digest, min(id) AS canon_id FROM keyed GROUP BY 1)
       |SELECT id, canon_id FROM keyed JOIN canon USING (digest)
       |WHERE id <> canon_id ORDER BY id""".stripMargin

  // ----------------------------------------------- MinHash + LSH
  /** The perturbed-dup MinHash pair pipeline, shared by
    * `llm_minhash_lsh` (the pairs themselves) and `llm_dedup_clusters`
    * (components over them).
    */
  private[graft] def minhashPairs(s: SparkSession, d: String): DataFrame = {
    // fanOut: shingling is CPU-bound and otherwise runs inside the
    // single-row-group scan task (MinHashProbe A/B: fused 1.97s →
    // 1.38s with the fan; fused vs factored is a wash — the r3 bench's
    // 5.4s fused reading was box contention, not the array payloads).
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
    val pert = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w"))
    val base = docs.unionByName(pert)
      .withColumn("sh", TextOps.wordNgrams(col("w"), 3))
    Dedup.minHashNearDups(base, col("doc_id"), col("sh"), 8, 2, 0.5d)
  }

  private def minhashLsh(s: SparkSession, d: String): DataFrame =
    minhashPairs(s, d)
      .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  /** Shared CTE chain for the MinHash pair pipeline (through `inter`
    * + `sizes`; a consumer appends its own final SELECT / more CTEs).
    */
  private[catalog] val mhPairsCtes: String =
    s"""docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS w FROM documents
       |), base AS (
       |  SELECT doc_id, w FROM docs
       |  UNION ALL
       |  SELECT doc_id + 100000, w[1:greatest(len(w)-3, 0)] FROM docs WHERE doc_id % 5 = 0
       |), sh AS (
       |  SELECT doc_id AS id, unnest(list_distinct(
       |    CASE WHEN len(w) >= 3
       |         THEN list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
       |         ELSE CAST([] AS VARCHAR[]) END)) AS s
       |  FROM base
       |), sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
       |mh AS (
       |  SELECT id, seed, min(substring(md5(CAST(seed // 4 AS VARCHAR) || '|' || s), 1 + 8 * (seed % 4), 8)) AS m
       |  FROM sh CROSS JOIN (SELECT seed FROM range(8) t(seed)) GROUP BY 1, 2
       |), bands AS (
       |  SELECT id, seed // 2 AS band, string_agg(m, '' ORDER BY seed) AS bk
       |  FROM mh GROUP BY 1, 2
       |), cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id
       |), inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS ninter
       |  FROM cand c
       |  JOIN sh x ON x.id = c.id_a
       |  JOIN sh y ON y.id = c.id_b AND y.s = x.s
       |  GROUP BY 1, 2
       |)""".stripMargin

  private val minhashLshSql: String =
    s"""WITH $mhPairsCtes
       |SELECT i.id_a, i.id_b,
       |       ${r4Sql("i.ninter * 1.0 / (sa.n + sb.n - i.ninter)")} AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.id = i.id_a
       |JOIN sizes sb ON sb.id = i.id_b
       |WHERE i.ninter * 1.0 / (sa.n + sb.n - i.ninter) >= 0.5
       |ORDER BY 1, 2""".stripMargin

  // --------------------------------------------- weighted sampling
  /** Importance-weighted corpus selection ([[Sampling.weightedSample]],
    * Efraimidis–Spirakis A-Res): top-50 documents by `ln(u)/w` with
    * w = n_chars — longer documents get proportionally better odds,
    * unlike the uniform `llm_hash_sample`. u is exact dyadic
    * arithmetic from a 52-bit md5 prefix, so both engines compute the
    * identical key and the identical ranking; the oracle replays the
    * same formula with DuckDB's hex cast.
    */
  private def weightedSampleQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("n_chars"))
    Sampling.weightedSample(docs, col("doc_id"), col("n_chars"), 50, "ws1")
      // 50-row frame: the rank window is driver-trivial by construction
      .withColumn("rank",
        row_number().over(Window.orderBy(col("__wkey").desc, col("doc_id")))
          .cast("long"))
      .select(col("rank"), col("doc_id"), col("n_chars"))
      .orderBy(col("rank"))
  }

  private val weightedSampleSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, n_chars FROM documents
       |  WHERE text IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
       |), keyed AS (
       |  SELECT doc_id, n_chars,
       |         ln((CAST(('0x' || substring(md5('ws1|' || CAST(doc_id AS VARCHAR)), 1, 13)) AS UBIGINT)
       |             + 0.5) / 4503599627370496.0) / n_chars AS k
       |  FROM docs
       |), ranked AS (
       |  SELECT doc_id, n_chars,
       |         row_number() OVER (ORDER BY k DESC, doc_id) AS rank
       |  FROM keyed
       |)
       |SELECT rank, doc_id, n_chars FROM ranked
       |WHERE rank <= 50 ORDER BY rank""".stripMargin

  // --------------------------------------------- wordlist (dictionary) filter
  /** C4-style banned-wordlist scan ([[graft.functions.AcCount]]): every
    * document walks the Aho-Corasick automaton once, O(bytes+matches)
    * whatever the dictionary size — at a real 10k-term blocklist a
    * regex alternation degrades to per-position alternative scans.
    * Counting is overlap-exact (every pattern × end position): the
    * oracle certifies it with a literal position scan per term, which
    * a `replace`-count formulation would fail on the fixture's
    * "batch batch batch" runs. Per-source summary keeps the output
    * compact: docs, flagged docs, total hits, worst document.
    */
  private val wordlistTerms =
    Seq("scan", "table scan", "batch batch", "merge", "data line")

  private def wordlistFilter(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d)).filter(col("text").isNotNull)
    docs.select(col("source"),
        graft.functions.AcCount.acCount(col("text"), wordlistTerms).as("n_hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_hits")).as("total_hits"),
        max(col("n_hits")).as("max_hits"))
      .orderBy(col("source"))
  }

  private val wordlistFilterSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL
       |), dict AS (
       |  SELECT unnest(['scan','table scan','batch batch','merge','data line']) AS p
       |), per AS (
       |  SELECT doc_id, source,
       |         len(list_filter(range(1, length(text) - length(p) + 2),
       |             i -> substring(text, i, length(p)) = p)) AS c
       |  FROM docs CROSS JOIN dict
       |), perdoc AS (
       |  SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n_hits
       |  FROM per GROUP BY 1, 2
       |)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |       CAST(sum(n_hits) AS BIGINT) AS total_hits,
       |       max(n_hits) AS max_hits
       |FROM perdoc GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------ edit-distance-verified near-dup
  /** Sequence-level near-dup verification ([[Dedup.editNearDups]]):
    * MinHash-LSH candidates (same 8×2 geometry as `llm_minhash_lsh`)
    * verified by normalized Levenshtein similarity ≥ 0.75 instead of
    * set Jaccard — the verifier that catches what set overlap cannot
    * (reordered text shares shingle bags; edit distance does not
    * forgive the rearrangement). The perturbed corpus truncates the
    * LAST 25 characters of every fifth document, so the expected sim
    * of a (doc, copy) pair is exactly `1 − 25/len`: pairs pass iff
    * len ≥ 100, giving the fixture both kept and boundary-rejected
    * candidates. τ = 0.75 on purpose — 1−τ = 0.25 is a dyadic
    * rational, so every threshold constant is the same IEEE double in
    * both engines with no decimal-vs-binary literal drift.
    */
  private def editNearDup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val pert = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        col("text").substr(lit(1), greatest(length(col("text")) - 25, lit(0))).as("text"))
    val base = docs.unionByName(pert)
      .withColumn("sh", TextOps.wordNgrams(TextOps.words(col("text")), 3))
    Dedup.editNearDups(base, col("doc_id"), col("text"), col("sh"), 8, 2, 0.75d)
      .select(col("id_a"), col("id_b"), col("dist"), r4(col("sim")).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val editNearDupSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |), base AS (
       |  SELECT doc_id AS id, text AS t FROM docs
       |  UNION ALL
       |  SELECT doc_id + 100000, substring(text, 1, greatest(length(text) - 25, 0))
       |  FROM docs WHERE doc_id % 5 = 0
       |), w AS (
       |  SELECT id, ${wordsSql("t")} AS w FROM base
       |), sh AS (
       |  SELECT id, unnest(list_distinct(
       |    CASE WHEN len(w) >= 3
       |         THEN list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
       |         ELSE CAST([] AS VARCHAR[]) END)) AS s
       |  FROM w
       |), mh AS (
       |  SELECT id, seed, min(substring(md5(CAST(seed // 4 AS VARCHAR) || '|' || s), 1 + 8 * (seed % 4), 8)) AS m
       |  FROM sh CROSS JOIN (SELECT seed FROM range(8) t(seed)) GROUP BY 1, 2
       |), bands AS (
       |  SELECT id, seed // 2 AS band, string_agg(m, '' ORDER BY seed) AS bk
       |  FROM mh GROUP BY 1, 2
       |), cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id
       |), hyd AS (
       |  SELECT c.id_a, c.id_b, x.t AS ta, y.t AS tb,
       |         length(x.t) AS la, length(y.t) AS lb,
       |         greatest(length(x.t), length(y.t)) AS maxlen
       |  FROM cand c JOIN base x ON x.id = c.id_a JOIN base y ON y.id = c.id_b
       |), v AS (
       |  SELECT id_a, id_b, levenshtein(ta, tb) AS dist, maxlen
       |  FROM hyd
       |  WHERE CAST(abs(la - lb) AS DOUBLE) <= CAST(0.25 AS DOUBLE) * maxlen + 1.0
       |), sims AS (
       |  SELECT id_a, id_b, dist,
       |         CASE WHEN maxlen = 0 THEN CAST(1.0 AS DOUBLE)
       |              ELSE 1.0 - CAST(dist AS DOUBLE) / maxlen END AS sim_x
       |  FROM v
       |)
       |SELECT id_a, id_b, dist, ${r4Sql("sim_x")} AS sim
       |FROM sims WHERE sim_x >= CAST(0.75 AS DOUBLE)
       |ORDER BY 1, 2""".stripMargin

  // --------------------------------------- near-dup cluster resolution
  /** Cluster resolution over the MinHash near-dup pairs: connected
    * components via [[Dedup.components]] (4 min-label-propagation
    * rounds — the fixture's star-shaped dup clusters reach fixpoint
    * after 1, see the components scaladoc; the oracle unrolls the SAME
    * 4 rounds, so the compare is exact whatever the topology), then
    * one row per cluster: canonical survivor id (= component min),
    * member count, largest member. The keep-one corpus is documents
    * anti-joined against `id <> canon_id` members — exercised in
    * spec:LlmOpsSpec; this query pins the cluster structure itself.
    */
  private def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = minhashPairs(s, d)
    Dedup.components(pairs, col("id_a"), col("id_b"), iters = 4)
      .groupBy(col("label").as("canon_id"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_member"))
      .orderBy(col("canon_id"))
  }

  /** Unrolled min-label connected components over the MinHash pair
    * graph (thresholded pairs → symmetrized edges → `rounds`
    * propagation rounds of label := min(label, neighbours' labels)).
    * CTE names get `prefix` so two consumers can coexist in one
    * statement (`llm_dedup_clusters` uses "", `llm_split_assign`
    * "s"); the last CTE is `<prefix>l<rounds>` (id, label).
    */
  private def componentCtes(prefix: String, rounds: Int): String = {
    val rs = (1 to rounds).map { k =>
      s"""${prefix}l$k AS (
         |  SELECT l.id, least(l.label, coalesce(min(nl.label), l.label)) AS label
         |  FROM ${prefix}l${k - 1} l
         |  LEFT JOIN ${prefix}sym e ON e.src = l.id
         |  LEFT JOIN ${prefix}l${k - 1} nl ON nl.id = e.dst
         |  GROUP BY l.id, l.label
         |)""".stripMargin
    }.mkString(", ")
    s"""${prefix}pairs AS (
       |  SELECT i.id_a, i.id_b
       |  FROM inter i
       |  JOIN sizes sa ON sa.id = i.id_a
       |  JOIN sizes sb ON sb.id = i.id_b
       |  WHERE i.ninter * 1.0 / (sa.n + sb.n - i.ninter) >= 0.5
       |), ${prefix}sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM ${prefix}pairs
       |  UNION
       |  SELECT id_b, id_a FROM ${prefix}pairs
       |), ${prefix}l0 AS (
       |  SELECT DISTINCT src AS id, src AS label FROM ${prefix}sym
       |), $rs""".stripMargin
  }

  private val dedupClustersSql: String =
    s"""WITH $mhPairsCtes, ${componentCtes("", 4)}
       |SELECT label AS canon_id, count(*) AS n_members, max(id) AS max_member
       |FROM l4 GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- near-dup graph stats
  /** [[GraphOps.triangleStats]] over the MinHash near-dup pair graph
    * (same ≥ 0.5-Jaccard pairs as `llm_dedup_clusters`): exact
    * triangle count by the degree-oriented node-iterator (Schank &
    * Wagner 2005 / Suri & Vassilvitskii WWW'11 — wedge generation
    * bounded O(m^1.5) by orienting every edge toward the higher
    * (degree, id) endpoint) plus the global clustering coefficient.
    * High GCC on a duplicate graph means near-dup sets are CLIQUES
    * (true duplicate groups); low GCC flags chain-shaped false
    * positives from band collisions. The oracle reproduces the
    * orientation + wedge-close joins verbatim over the shared pairs
    * CTE.
    */
  private def graphStatsQ(s: SparkSession, d: String): DataFrame =
    GraphOps.triangleStats(minhashPairs(s, d), col("id_a"), col("id_b"))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"), r4(col("gcc")).as("gcc"))

  private val graphStatsSql: String =
    s"""WITH $mhPairsCtes, pe AS (
       |  SELECT i.id_a AS x, i.id_b AS y
       |  FROM inter i
       |  JOIN sizes sa ON sa.id = i.id_a
       |  JOIN sizes sb ON sb.id = i.id_b
       |  WHERE i.ninter * 1.0 / (sa.n + sb.n - i.ninter) >= 0.5
       |), deg AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT x AS id FROM pe UNION ALL SELECT y FROM pe)
       |  GROUP BY 1
       |), ori AS (
       |  SELECT CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND e.x < e.y)
       |              THEN e.x ELSE e.y END AS src,
       |         CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND e.x < e.y)
       |              THEN e.y ELSE e.x END AS dst
       |  FROM pe e JOIN deg dx ON dx.id = e.x JOIN deg dy ON dy.id = e.y
       |), wedge AS (
       |  SELECT a.src, a.dst AS d1, b.dst AS d2
       |  FROM ori a JOIN ori b ON a.src = b.src AND a.dst < b.dst
       |), tri AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
       |  FROM wedge w WHERE EXISTS (
       |    SELECT 1 FROM pe WHERE pe.x = w.d1 AND pe.y = w.d2)
       |), nn AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |         CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
       |  FROM deg
       |), ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM pe)
       |SELECT n_nodes, n_edges, n_triangles, n_wedges,
       |       ${r4Sql("CASE WHEN n_wedges > 0 THEN 3.0 * CAST(n_triangles AS DOUBLE)" +
                       " / CAST(n_wedges AS DOUBLE) ELSE 0.0 END")} AS gcc
       |FROM nn CROSS JOIN ne CROSS JOIN tri""".stripMargin

  // --------------------------------------- quality-aware survivor pick
  /** [[Dedup.keepBest]] over the MinHash near-dup clusters: each
    * cluster keeps its HIGHEST-quality member (stopword-ratio score,
    * the `llm_quality_filter` formula) instead of the lowest id —
    * the production dedup choice (keep the cleanest extraction of a
    * page, not the first-crawled). Deterministic: DOUBLE score both
    * engines, ties (q desc, id asc).
    */
  private def keepBestQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
    val pert = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w"))
    val base = docs.unionByName(pert)
    val stop = TextOps.langStopwords.head._2
    val scored = base.select(col("doc_id"),
      when(size(col("w")) > 0,
        lit(1.0d) / (lit(1.0d) +
          TextOps.stopwordHits(col("w"), stop).cast("double")
            / size(col("w")).cast("double")))
        .otherwise(lit(0.0d)).as("q"))
    val labels = Dedup.components(
      minhashPairs(s, d), col("id_a"), col("id_b"), iters = 4)
    Dedup.keepBest(labels, scored, col("doc_id"), col("q"))
      .select(col("label").as("cluster"), col("id").as("kept_id"),
        r4(col("q")).as("q"), col("n_members"))
      .orderBy(col("cluster"))
  }

  private val keepBestSql: String = {
    val set = TextOps.langStopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH $mhPairsCtes, ${componentCtes("", 4)},
       |qs AS (
       |  SELECT doc_id AS id,
       |         CASE WHEN len(w) > 0
       |              THEN CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
       |                   + CAST(len(list_filter(w, x -> x IN ($set))) AS DOUBLE)
       |                     / CAST(len(w) AS DOUBLE))
       |              ELSE CAST(0.0 AS DOUBLE) END AS q
       |  FROM base
       |), m AS (
       |  SELECT l.id, l.label, qs.q FROM l4 l JOIN qs USING (id)
       |), mc AS (
       |  SELECT label, count(*) AS n_members FROM m GROUP BY 1
       |), mr AS (
       |  SELECT id, label, q,
       |         row_number() OVER (PARTITION BY label ORDER BY q DESC, id) AS rn
       |  FROM m
       |)
       |SELECT r.label AS cluster, r.id AS kept_id, ${r4Sql("r.q")} AS q,
       |       c.n_members
       |FROM mr r JOIN mc c USING (label) WHERE rn = 1
       |ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------ corpus snapshot diff
  /** [[Dedup.snapshotDiff]] — the release-over-release audit: old =
    * `documents`; new = the same corpus with every 7th doc removed,
    * every 5th (surviving) doc's text edited, and 1-in-11 new ids
    * appended. Per-status counts with id sums pin exact membership;
    * fingerprints are [[TextOps.fingerprint]] digests, so the compare
    * never ships text.
    */
  private def corpusDiffQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val newDocs = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    Dedup.snapshotDiff(docs, newDocs, col("doc_id"),
        TextOps.fingerprint(col("text")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
      .orderBy(col("status"))
  }

  private val corpusDiffSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |), newdocs AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END AS text
       |  FROM docs WHERE doc_id % 7 <> 0
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM docs WHERE doc_id % 11 = 0
       |), o AS (SELECT doc_id AS id, md5(${normSql("text")}) AS fp FROM docs),
       |n AS (SELECT doc_id AS id, md5(${normSql("text")}) AS fp FROM newdocs),
       |j AS (
       |  SELECT coalesce(o.id, n.id) AS id,
       |         CASE WHEN o.fp IS NULL THEN 'added'
       |              WHEN n.fp IS NULL THEN 'removed'
       |              WHEN o.fp = n.fp THEN 'unchanged'
       |              ELSE 'changed' END AS status
       |  FROM o FULL OUTER JOIN n ON o.id = n.id
       |)
       |SELECT status, count(*) AS n, CAST(sum(id) AS BIGINT) AS id_sum
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------- leakage-safe split assign
  /** Cluster-consistent train/validation split — the leakage guard a
    * training pipeline needs BETWEEN splits: hashing each document
    * independently puts one near-duplicate in train and its twin in
    * validation, silently inflating eval. Here the split is decided
    * by md5 of the near-dup CLUSTER label (minhash pairs →
    * [[Dedup.components]], singletons = their own cluster), so an
    * entire dup cluster lands on one side; the 90/10 threshold uses
    * [[Sampling.rateThreshold]]'s exact hex form in both engines.
    * Scale: one left join of the corpus against the (much smaller)
    * clustered-id frame, then a map-side hash — nothing beyond the
    * components cost itself.
    */
  /** [[CorpusStats.ksPairs]] — two-sample Kolmogorov–Smirnov distance
    * between every source pair's n_chars distribution. `d_num` is the
    * exact integer D·n_a·n_b (peer-inclusive RANGE-frame cumulative
    * counts), so the hash gate compares exact rationals; `d` is the
    * one r4'd division.
    */
  private def ksDriftQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.ksPairs(Tables.documents(s, d), col("source"), col("n_chars"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("d_num"), r4(col("d")).as("d"))
      .orderBy(col("source_a"), col("source_b"))

  private val ksDriftSql: String =
    s"""WITH dd AS (
       |  SELECT CAST(source AS VARCHAR) AS g, CAST(n_chars AS BIGINT) AS x
       |  FROM documents
       |), sizes AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n FROM dd GROUP BY 1
       |), pairs AS (
       |  SELECT a.g AS sa, a.n AS na, b.g AS sb, b.n AS nb
       |  FROM sizes a JOIN sizes b ON a.g < b.g
       |), u AS (
       |  SELECT p.sa, p.sb, p.na, p.nb, dd.x,
       |         CAST(1 AS BIGINT) AS ia, CAST(0 AS BIGINT) AS ib
       |  FROM dd JOIN pairs p ON dd.g = p.sa
       |  UNION ALL
       |  SELECT p.sa, p.sb, p.na, p.nb, dd.x, 0, 1
       |  FROM dd JOIN pairs p ON dd.g = p.sb
       |), run AS (
       |  SELECT sa, sb, na, nb,
       |         sum(ia) OVER w AS ca, sum(ib) OVER w AS cb
       |  FROM u WINDOW w AS (PARTITION BY sa, sb ORDER BY x)
       |), agg AS (
       |  SELECT sa, sb, na, nb,
       |         CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num
       |  FROM run GROUP BY 1, 2, 3, 4
       |)
       |SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b, d_num,
       |       ${r4Sql("CAST(d_num AS DOUBLE) / CAST(na * nb AS DOUBLE)")} AS d
       |FROM agg ORDER BY 1, 2""".stripMargin

  /** [[Sampling.neymanAlloc]] — a 1000-doc labeling budget split
    * across sources ∝ N_h·s_h of the n_chars distribution (Neyman
    * 1934 optimal allocation). Allocations are exact integers summing
    * exactly to the budget (largest-remainder rounding); weights are
    * integer micro-units floor-quantized from one per-stratum double
    * expression, so no cross-stratum float sum exists on either
    * engine.
    */
  private def neymanAllocQ(s: SparkSession, d: String): DataFrame =
    Sampling.neymanAlloc(Tables.documents(s, d), col("source"),
        col("n_chars"), budget = 1000L)
      .orderBy(col("stratum"))

  private val neymanAllocSql: String =
    s"""WITH mo AS (
       |  SELECT CAST(source AS VARCHAR) AS g, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(n_chars) AS BIGINT) AS sx,
       |         sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
       |  FROM documents GROUP BY 1
       |), wts AS (
       |  SELECT g, n,
       |         CASE WHEN n < 2 THEN 0
       |              ELSE CAST(floor(CAST(n AS DOUBLE)
       |                   * sqrt(CAST(CAST(n AS HUGEINT) * sxx
       |                               - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |                          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
       |                   * 1000000.0) AS BIGINT) END AS wq
       |  FROM mo
       |), tot AS (SELECT CAST(sum(wq) AS BIGINT) AS sw FROM wts),
       |raw AS (
       |  SELECT g, n, wq,
       |         CASE WHEN sw > 0
       |              THEN CAST(1000 AS DOUBLE) * CAST(wq AS DOUBLE)
       |                   / CAST(sw AS DOUBLE)
       |              ELSE 0.0 END AS r
       |  FROM wts, tot
       |), fl AS (
       |  SELECT g, n, wq, r, CAST(floor(r) AS BIGINT) AS b,
       |         row_number() OVER (ORDER BY r - floor(r) DESC, g) AS rk
       |  FROM raw
       |), sh AS (
       |  SELECT CASE WHEN (SELECT sw FROM tot) > 0
       |              THEN 1000 - CAST(sum(b) AS BIGINT) ELSE 0 END AS short
       |  FROM fl)
       |SELECT g AS stratum, n AS n_rows, wq AS w_micro,
       |       CAST(b + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM fl, sh ORDER BY stratum""".stripMargin

  /** [[Sampling.rendezvousShard]] — HRW shard placement of every doc
    * across 8 shards, with the minimal-disruption property made
    * measurable: `n_moved` counts the docs of each shard-8 bucket
    * whose assignment CHANGES when a 9th shard joins (every mover
    * goes to the new shard; expected total fraction 1/9). Per-shard
    * counts pin balance, the moved column pins stability — the two
    * numbers a resharding plan is sized by. Both columns are exact
    * integer counts off one map stage + one 8-row aggregation.
    */
  private def shardAssignQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        Sampling.rendezvousShard(col("doc_id"), 8).as("s8"),
        Sampling.rendezvousShard(col("doc_id"), 9).as("s9"))
      .groupBy(col("s8").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("n_moved"))
      .orderBy(col("shard"))

  private val shardAssignSql: String =
    s"""WITH g8 AS (
       |  SELECT doc_id, arg_max(s, w) AS s8 FROM (
       |    SELECT doc_id, s,
       |           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)) AS w
       |    FROM documents, range(8) t(s))
       |  GROUP BY doc_id
       |), g9 AS (
       |  SELECT doc_id, arg_max(s, w) AS s9 FROM (
       |    SELECT doc_id, s,
       |           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)) AS w
       |    FROM documents, range(9) t(s))
       |  GROUP BY doc_id
       |)
       |SELECT CAST(s8 AS INTEGER) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |FROM g8 JOIN g9 USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private def splitAssign(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"))
    val universe = base.unionByName(
      base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id")))
    val comp = Dedup.components(minhashPairs(s, d), col("id_a"), col("id_b"), iters = 4)
    val labeled = universe
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster"))
    labeled.select(col("doc_id"), col("cluster"),
        when(substring(md5(concat(lit("split|"), col("cluster").cast("string"))), 1, 8)
            < lit(Sampling.rateThreshold(0.9d)), "train")
          .otherwise("val").as("split"))
      .orderBy(col("doc_id"))
  }

  private val splitAssignSql: String = {
    s"""WITH $mhPairsCtes, ${componentCtes("s", 4)}, universe AS (
       |  SELECT doc_id FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 FROM documents WHERE doc_id % 5 = 0
       |), labeled AS (
       |  SELECT u.doc_id, COALESCE(c.label, u.doc_id) AS cluster
       |  FROM universe u LEFT JOIN sl4 c ON c.id = u.doc_id
       |)
       |SELECT doc_id, cluster,
       |       CASE WHEN substr(md5('split|' || CAST(cluster AS VARCHAR)), 1, 8)
       |                 < '${Sampling.rateThreshold(0.9d)}'
       |            THEN 'train' ELSE 'val' END AS split
       |FROM labeled ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- SimHash
  private def simhash(s: SparkSession, d: String): DataFrame = {
    val bag = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("wrd"))
    Dedup.simHash(bag, col("doc_id"), col("wrd"), 16)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  private val simhashSql: String =
    s"""WITH wb AS (
       |  SELECT doc_id, unnest(${wordsSql("text")}) AS wrd FROM documents
       |), votes AS (
       |  SELECT doc_id, j,
       |         SUM(((instr('0123456789abcdef', substr(md5(wrd), j+1, 1)) - 1) % 2) * 2 - 1) AS v
       |  FROM wb CROSS JOIN (SELECT j FROM range(16) t(j)) GROUP BY 1, 2
       |)
       |SELECT doc_id,
       |       CAST(SUM(CASE WHEN v > 0 THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
       |FROM votes GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------ SimHash Hamming-radius pairs
  /** SimHash near-dup PAIRS (Hamming ≤ 2 over 32-bit fingerprints —
    * 16 bits cluster badly on this small-vocabulary corpus, measured
    * ~2% of ALL pairs within radius 2, which is noise, not dedup) on
    * the same perturbed-dup fixture as `llm_minhash_lsh`, via the
    * exact pigeonhole block decomposition ([[Dedup.simHashPairs]]:
    * recall AND precision exactly 1 — no LSH curve, unlike the
    * MinHash/SRP paths). The oracle is the quadratic self-join; the
    * engine's block-bucketed plan must reproduce it bit-for-bit, which
    * also certifies the pigeonhole cover (a missed pair = hash
    * mismatch). Integer-only arithmetic end to end.
    */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
    val pert = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w"))
    val bag = docs.unionByName(pert)
      .select(col("doc_id"), explode(col("w")).as("wrd"))
    val fps = Dedup.simHash(bag, col("doc_id"), col("wrd"), 32)
    Dedup.simHashPairs(fps, col("id"), col("simhash"), 32, 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val simhashPairsSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS w FROM documents
       |), base AS (
       |  SELECT doc_id, w FROM docs
       |  UNION ALL
       |  SELECT doc_id + 100000, w[1:greatest(len(w)-3, 0)] FROM docs WHERE doc_id % 5 = 0
       |), wb AS (
       |  SELECT doc_id, unnest(w) AS wrd FROM base
       |), votes AS (
       |  SELECT doc_id, j,
       |         SUM(((instr('0123456789abcdef', substr(md5(wrd), j+1, 1)) - 1) % 2) * 2 - 1) AS v
       |  FROM wb CROSS JOIN (SELECT j FROM range(32) t(j)) GROUP BY 1, 2
       |), fp AS (
       |  SELECT doc_id AS id,
       |         CAST(SUM(CASE WHEN v > 0 THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY 1
       |)
       |SELECT a.id AS id_a, b.id AS id_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM fp a JOIN fp b ON a.id < b.id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
       |ORDER BY 1, 2""".stripMargin

  // --------------------------------------- char n-gram Jaccard pairs
  /** Char-5-gram Jaccard near-dup pairs within (lang, source) blocks,
    * composed as MinHash-LSH candidate generation → exact in-pair
    * verification (k=24 xxhash64 min-sketch, then size prune +
    * array_intersect) — the LSH pre-blocking the earlier
    * block-quadratic self-join only promised. The pair space is now
    * band-bucket-local, so the dominant (en, web) block at 100 TB
    * never goes block²; k=24/bandsOf=4 (6 bands of 4) gives recall
    * 0.988 at J=0.85, ≥0.998 at J ≥ 0.9 (real near-dups; this
    * fixture's true pair sits at J=0.98, next-highest natural pair
    * 0.28) and ~1/3 at the 0.5 cliff — the r9 geometry: JaccardProbe6
    * measured bandsOf=3's junk-candidate admission (J≈0.3 pairs pass
    * a 3-hash band at 0.027 vs 0.008 for 4) at 51k candidates for a
    * 10x corpus vs 6.7k under bandsOf=4, with IDENTICAL verified
    * pairs at both scales and the intersect stage 6.6 s → 1.7 s;
    * candidate growth is linear in the corpus under 4 (11x at 10x
    * data). A 24-component sketch prefilter before the intersect was
    * also measured (cuts bandsOf=3's verify 4.3x) but rejected: the
    * estimate is 24 Bernoulli(J) trials, so a TRUE J=0.5 pair fails
    * an est ≥ 8/24 gate with ~5% probability — not exact, unlike the
    * band geometry change. The exact prefix-filter
    * alternative ([[Dedup.prefixFilterCandidates]]) was measured not
    * to prune at t=0.5 on natural text (92% of all pairs survive —
    * mid-frequency shingles are too shared); it remains the right
    * generator at t ≳ 0.7. Earlier measured alternatives at sf0.1:
    * all-pairs-in-block shuffle-hash join (quadratic in the block),
    * exploded inverted-index pair count (~10M pair rows), broadcast
    * of the array side (single-threaded multi-M hash build).
    *
    * Length filter mirrors the oracle's WHERE; without it two sub-5
    * -char docs in one block would yield 0/0 = NaN, which Spark's
    * NaN-ordering lets through `>= 0.5` while DuckDB emits nothing.
    */
  private def charJaccard(s: SparkSession, d: String): DataFrame = {
    // Shingling is the dominant cost, so the plan computes it ONCE: a
    // native one-pass gram-set expression (functions/CharNgramSet —
    // the interpreted transform+array_distinct composition and the
    // offset-explode alternative both measured 2-4x slower) feeds a
    // SINGLE groupBy(doc) that yields the gram set AND the 24 min-hash
    // sketch together. Bands, the candidate join, and both hydration
    // sides all hang off that one aggregation, so exchange reuse
    // materializes the shuffle once instead of re-shingling the corpus
    // per consumer (measured 2x end-to-end on top of the native
    // expression's win). t=0.5 sits below the prefix-filter cliff, so
    // the generator is the LSH path with the catalog's documented
    // k=24/bandsOf=4 recall curve ([[Dedup.jaccardCandidates]] keeps
    // the threshold dispatch for API callers; at t >= 0.7 use it to
    // get the exact prefix filter).
    val grams = Tables.fanOut(Tables.documents(s, d))
      .filter(length(col("text")) >= 5)
      .select(col("doc_id").as("id"), col("lang"), col("source"),
        explode(graft.functions.CharNgramSet.charNgramSet(col("text"), 5)).as("s"))
    val sigAggs = (0 until 24).map { k =>
      min(xxhash64(lit(k), col("s"))).cast("string").as(s"m$k") }
    // ... but the bands side PRUNES gs, which splits the aggregation
    // into two non-reusable exchanges (RecomputeScan r15: 6.7 + 2.8 s
    // CPU twin jobs) — the lazy checkpoint restores the single pass
    // the comment above promises
    val docsig = grams.groupBy(col("id"), col("lang"), col("source"))
      .agg(collect_list(col("s")).as("gs"), sigAggs: _*)
      .localCheckpoint(false)
    // (lang, source) folded INTO the band bucket key: cross-block
    // candidates never materialize, so the block predicate needs no
    // post-join filter — at 100 TB that prunes every spurious
    // cross-block band collision before the pair join.
    val cand = Dedup.lshCandidates(
      Dedup.lshBands(docsig, 24, 4, Seq(col("lang"), col("source"))))
    val a = docsig.select(col("id").as("id_a"), col("gs").as("ga"))
    val b = docsig.select(col("id").as("id_b"), col("gs").as("gb"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("na", size(col("ga"))).withColumn("nb", size(col("gb")))
      .filter(greatest(col("na"), col("nb")) <= least(col("na"), col("nb")) * 2)
      .withColumn("ninter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("j", col("ninter") * lit(1.0d) /
        (col("na") + col("nb") - col("ninter")))
      .filter(col("j") >= 0.5d)
      .select(col("id_a"), col("id_b"), r4(col("j")).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val charJaccardSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, lang, source,
       |         list_distinct(list_transform(range(1, length(text)-3), i -> substr(text, i, 5))) AS gs
       |  FROM documents WHERE length(text) >= 5
       |), p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         len(list_intersect(a.gs, b.gs)) * 1.0
       |           / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) AS j
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, ${r4Sql("j")} AS jaccard
       |FROM p WHERE j >= 0.5 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------- brute-force ANN
  private def cosineTopK(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(
        Tables.embeddings(s, d), col("vec_id"), col("embedding"),
        col("vec_id") === 0L, 10)
      .select(col("id"), r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))

  // ---------------------------------------------- MMR re-ranking
  /** [[Similarity.mmrRerank]] — Maximal Marginal Relevance (λ = 0.7)
    * over the top-20 cosine candidates of query vec 0, picking 5.
    * The oracle unrolls the same greedy chain (the kcenterSql
    * pattern): candidate page by rel DESC, then 5 steps of
    * argmax(λ·rel − (1−λ)·max-sim-to-selected) with the running max
    * folded in per step. (1−λ) is written as the SUBTRACTION on both
    * sides — the IEEE value of 1.0−0.7 is not the literal 0.3 — and
    * ties break (score DESC, rel DESC, id ASC) identically. Ranking
    * happens on unrounded doubles; outputs are r4.
    */
  private def mmrRerankQ(s: SparkSession, d: String): DataFrame =
    Similarity.mmrRerank(Tables.embeddings(s, d), col("vec_id"),
        col("embedding"), col("vec_id") === 0L,
        nCandidates = 20, k = 5, lambda = 0.7d)
      .select(col("rank"), col("id"), r4(col("rel")).as("rel"),
        r4(col("mmr")).as("mmr"))
      .orderBy(col("rank"))

  private val mmrRerankSql: String = {
    def cos(a: String, b: String): String =
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    val score = "0.7 * rel - (1.0 - 0.7) * msim"
    val steps = (2 to 5).map { t =>
      s"""m${t - 1} AS (
         |  SELECT p.id, p.v, p.rel,
         |         greatest(p.msim, ${cos("p.v", "s.v")}) AS msim
         |  FROM m${t - 2} p, s${t - 1} s WHERE p.id <> s.id
         |), s$t AS (
         |  SELECT id, v, rel, $score AS mmr FROM m${t - 1}
         |  ORDER BY $score DESC, rel DESC, id LIMIT 1
         |)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map(t =>
      s"SELECT CAST($t AS INTEGER) AS rank, id, ${r4Sql("rel")} AS rel, " +
        s"${r4Sql("mmr")} AS mmr FROM s$t").mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |c0 AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
       |         ${cos("embedding::DOUBLE[]", "qv")} AS rel
       |  FROM embeddings, q WHERE vec_id <> 0
       |  ORDER BY rel DESC, vec_id LIMIT 20
       |),
       |m0 AS (SELECT id, v, rel, CAST(0 AS DOUBLE) AS msim FROM c0),
       |s1 AS (
       |  SELECT id, v, rel, $score AS mmr FROM m0
       |  ORDER BY $score DESC, rel DESC, id LIMIT 1
       |),
       |$steps
       |$out
       |ORDER BY rank""".stripMargin
  }

  // ------------------------------------------- binary-quantized ANN
  /** [[Similarity.signBitTopK]]: 1-bit sign signatures (two 32-bit
    * words per vector, the cross-engine bit discipline), Hamming
    * top-50 candidates, exact cosine rerank to top-10 — the
    * memory-floor ANN path (8 signature bytes scanned per vector).
    */
  private def binaryQuantQ(s: SparkSession, d: String): DataFrame =
    Similarity.signBitTopK(
        Tables.embeddings(s, d), col("vec_id"), col("embedding"),
        col("vec_id") === 0L, candidates = 50, k = 10)
      .select(col("id"), col("ham"), r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))

  private val binaryQuantSql: String =
    s"""WITH sig AS (
       |  SELECT vec_id, embedding,
       |         (SELECT CAST(sum(CASE WHEN embedding[i + 1] > 0
       |             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT)
       |          FROM range(0, 32) t(i)) AS w0,
       |         (SELECT CAST(sum(CASE WHEN embedding[i + 33] > 0
       |             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT)
       |          FROM range(0, 32) t(i)) AS w1
       |  FROM embeddings
       |), q AS (SELECT embedding::DOUBLE[] AS qv, w0 AS q0, w1 AS q1
       |         FROM sig WHERE vec_id = 0),
       |cand AS (
       |  SELECT s.vec_id AS id, s.embedding::DOUBLE[] AS v, q.qv,
       |         CAST(bit_count(xor(s.w0, q.q0)) + bit_count(xor(s.w1, q.q1)) AS BIGINT) AS ham
       |  FROM sig s, q WHERE s.vec_id <> 0
       |  ORDER BY ham ASC, id ASC LIMIT 50
       |), rer AS (
       |  SELECT id, ham,
       |         list_dot_product(v, qv)
       |           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM cand
       |  ORDER BY sim DESC, id ASC LIMIT 10
       |)
       |SELECT id, ham, ${r4Sql("sim")} AS sim FROM rer
       |ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin

  private val cosineTopKSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |d AS (
       |  SELECT vec_id AS id,
       |         list_dot_product(embedding::DOUBLE[], qv)
       |           / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
       |              * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM embeddings, q WHERE vec_id <> 0
       |), topk AS (SELECT id, sim FROM d ORDER BY sim DESC, id LIMIT 10)
       |SELECT id, ${r4Sql("sim")} AS sim FROM topk
       |ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin

  // ------------------------------------------------------- IVF ANN
  private def ivfTopK(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(
        Tables.embeddings(s, d), col("vec_id"), col("label"), col("embedding"),
        col("vec_id") === 0L, 5)
      .select(col("id"), col("picked_cell").cast("int").as("picked_cell"),
        r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))

  private val ivfTopKSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |pts AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |comp AS (
       |  SELECT label, i, avg(v[i]) AS c
       |  FROM pts CROSS JOIN (SELECT i FROM range(1, 65) t(i)) GROUP BY 1, 2
       |), cents AS (SELECT label, list(c ORDER BY i) AS centroid FROM comp GROUP BY 1),
       |best AS (
       |  SELECT label FROM cents, q
       |  ORDER BY list_dot_product(centroid, qv)
       |             / (sqrt(list_dot_product(centroid, centroid))
       |                * sqrt(list_dot_product(qv, qv))) DESC, label
       |  LIMIT 1
       |), sel AS (
       |  SELECT p.vec_id AS id, p.label AS picked_cell,
       |         list_dot_product(p.v, qv)
       |           / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM pts p JOIN best USING (label), q
       |), topk AS (SELECT * FROM sel ORDER BY sim DESC, id LIMIT 5)
       |SELECT id, picked_cell, ${r4Sql("sim")} AS sim FROM topk
       |ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin

  // -------------------------------------------- multi-probe IVF
  /** [[Similarity.ivfTopKMultiProbe]] with nprobe=3: candidates from
    * the three nearest cells, so a query near a cell boundary can
    * rank true neighbors the single-probe form never scans. Same
    * oracle scaffolding as llm_ivf_topk with the probe LIMIT raised.
    */
  private def ivfMultiProbe(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopKMultiProbe(
        Tables.embeddings(s, d), col("vec_id"), col("label"), col("embedding"),
        col("vec_id") === 0L, 5, 3)
      .select(col("id"), col("picked_cell").cast("int").as("picked_cell"),
        r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))

  private val ivfMultiProbeSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |pts AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |comp AS (
       |  SELECT label, i, avg(v[i]) AS c
       |  FROM pts CROSS JOIN (SELECT i FROM range(1, 65) t(i)) GROUP BY 1, 2
       |), cents AS (SELECT label, list(c ORDER BY i) AS centroid FROM comp GROUP BY 1),
       |probed AS (
       |  SELECT label FROM cents, q
       |  ORDER BY list_dot_product(centroid, qv)
       |             / (sqrt(list_dot_product(centroid, centroid))
       |                * sqrt(list_dot_product(qv, qv))) DESC, label
       |  LIMIT 3
       |), sel AS (
       |  SELECT p.vec_id AS id, p.label AS picked_cell,
       |         list_dot_product(p.v, qv)
       |           / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM pts p JOIN probed USING (label), q
       |), topk AS (SELECT * FROM sel ORDER BY sim DESC, id LIMIT 5)
       |SELECT id, picked_cell, ${r4Sql("sim")} AS sim FROM topk
       |ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin

  // ------------------------------------------------- language ID
  /** Exploded single-pass form of [[TextOps.langId]]: one word explode,
    * one aggregation with 5 conditional sums — the tokenizer runs once
    * per doc instead of once per language (CollapseProject would
    * re-inline a withColumn).
    */
  private def langId(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val hits = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("wrd"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("wrd").isin(TextOps.langStopwords.head._2: _*), 1L)
          .otherwise(0L)).as(s"n_${TextOps.langStopwords.head._1}"),
        TextOps.langStopwords.tail.map { case (l, sw) =>
          sum(when(col("wrd").isin(sw: _*), 1L).otherwise(0L)).as(s"n_$l")
        }: _*)
    val joined = docs.join(hits, Seq("doc_id"), "left")
    val scored = TextOps.langStopwords.map { case (l, _) =>
      (l, coalesce(col(s"n_$l"), lit(0L)))
    }
    joined.select(col("doc_id"),
        TextOps.argMaxLabel(scored).as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  private val langIdSql: String = {
    // coalesce(...,0): a NULL text must score 0 -> 'und', matching the
    // Spark side's left-join-miss coalescing (NULL would otherwise
    // fall through every CASE arm to the last language).
    val hits = TextOps.langStopwords.map { case (l, sw) =>
      val set = sw.map(w => s"'$w'").mkString(", ")
      s"coalesce(len(list_filter(w, x -> x IN ($set))), 0) AS n_$l"
    }.mkString(",\n       |         ")
    val langs = TextOps.langStopwords.map(_._1)
    val mx = s"greatest(${langs.map("n_" + _).mkString(", ")})"
    val caseArms = langs.init
      .map(l => s"WHEN n_$l = $mx THEN '$l'").mkString(" ")
    s"""WITH w AS (
       |  SELECT doc_id, ${wordsSql("text")} AS w FROM documents
       |), h AS (
       |  SELECT doc_id,
       |         $hits
       |  FROM w
       |)
       |SELECT doc_id,
       |       CASE WHEN $mx = 0 THEN 'und' $caseArms ELSE '${langs.last}' END AS pred_lang
       |FROM h ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------ language-ID confusion matrix
  /** [[langId]] evaluated against the table's labeled `lang` — the
    * confusion matrix + row-normalized share (the diagonal is
    * per-language recall), the artifact a pipeline reads before
    * trusting the classifier for routing. Same exploded one-pass hit
    * aggregation as `llm_langid` with the true label carried as a
    * group key (never a second scan); counts exact, one r4'd division
    * over the ≤|langs|² frame.
    */
  private def langidConfusionQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val hits = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("wrd"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("wrd").isin(TextOps.langStopwords.head._2: _*), 1L)
          .otherwise(0L)).as(s"n_${TextOps.langStopwords.head._1}"),
        TextOps.langStopwords.tail.map { case (l, sw) =>
          sum(when(col("wrd").isin(sw: _*), 1L).otherwise(0L)).as(s"n_$l")
        }: _*)
    val scored = TextOps.langStopwords.map { case (l, _) =>
      (l, coalesce(col(s"n_$l"), lit(0L)))
    }
    docs.join(hits, Seq("doc_id"), "left")
      .select(col("lang").as("true_lang"),
        TextOps.argMaxLabel(scored).as("pred_lang"))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", r4(col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("true_lang"))).cast("double")))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  private val langidConfusionSql: String = {
    val hits = TextOps.langStopwords.map { case (l, sw) =>
      val set = sw.map(w => s"'$w'").mkString(", ")
      s"coalesce(len(list_filter(w, x -> x IN ($set))), 0) AS n_$l"
    }.mkString(",\n       |         ")
    val langs = TextOps.langStopwords.map(_._1)
    val mx = s"greatest(${langs.map("n_" + _).mkString(", ")})"
    val caseArms = langs.init
      .map(l => s"WHEN n_$l = $mx THEN '$l'").mkString(" ")
    s"""WITH w AS (
       |  SELECT doc_id, lang, ${wordsSql("text")} AS w FROM documents
       |), h AS (
       |  SELECT doc_id, lang,
       |         $hits
       |  FROM w
       |), p AS (
       |  SELECT lang AS true_lang,
       |         CASE WHEN $mx = 0 THEN 'und' $caseArms
       |              ELSE '${langs.last}' END AS pred_lang
       |  FROM h
       |), c AS (
       |  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM p GROUP BY 1, 2
       |)
       |SELECT true_lang, pred_lang, n,
       |       ${r4Sql("CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY true_lang) AS DOUBLE)")} AS share
       |FROM c ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------- quality scoring
  private def quality(s: SparkSession, d: String): DataFrame = {
    val w = TextOps.words(col("text"))
    val stop = TextOps.langStopwords.head._2
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        size(w).cast("long").as("n_words"),
        TextOps.punctCount(col("text")).cast("long").as("n_punct"),
        r4(TextOps.stopwordRatio(w, stop)).as("stop_ratio"),
        r4(
          when(size(w) > 0,
            lit(1.0d) / (lit(1.0d) + TextOps.stopwordHits(w, stop).cast("double") / size(w).cast("double")))
            .otherwise(lit(0.0d))).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  private val qualitySql: String = {
    val set = TextOps.langStopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, text, ${wordsSql("text")} AS w FROM documents
       |), m AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars_calc,
       |         len(w) AS n_words,
       |         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
       |         len(list_filter(w, x -> x IN ($set))) AS hits
       |  FROM w
       |)
       |SELECT doc_id, n_chars_calc, n_words, n_punct,
       |       ${r4Sql("CASE WHEN n_words > 0 THEN hits * 1.0 / n_words ELSE 0.0 END")} AS stop_ratio,
       |       ${r4Sql("CASE WHEN n_words > 0 THEN 1.0 / (1.0 + hits * 1.0 / n_words) ELSE 0.0 END")} AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ token counting
  private def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("ws_tokens"),
        TextOps.alnumTokenCount(col("text")).cast("long").as("alnum_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"))
      .orderBy(col("doc_id"))

  private val tokensSql: String =
    s"""SELECT doc_id,
       |       len(${wordsSql("text")}) AS ws_tokens,
       |       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS alnum_tokens,
       |       length(text) AS n_chars_calc
       |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- fingerprint
  private def fingerprintQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val fingerprintSql: String =
    s"""SELECT doc_id, md5(${normSql("text")}) AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------- winnowing fingerprint
  /** Rolling-hash winnowing ([[Dedup.winnowFingerprints]], k=8 char
    * grams, w=4 windows) over normalized text, summarized per doc as
    * (selected-hash count, lexicographic min/max) — a different
    * selection at ANY window moves the count or an extremum, so the
    * hash compare pins the whole selection without dumping ~100 rows
    * per document. The oracle replays the identical rolling min with
    * a SQL window frame.
    */
  private def winnowQ(s: SparkSession, d: String): DataFrame = {
    // The selected set is per-document (native WinnowSet), so the
    // summary needs no groupBy at all: size/min/max over the array.
    // Zero shuffles besides the final presentation sort.
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.normalize(col("text")).as("t"))
    docs
      // Generate barrier (explode of a 1-element array): the filter's
      // size(fps)>0 substitution otherwise re-inlines the winnow
      // kernel — and the normalize inside it — for a 2x per-row run
      // of the query's only expensive stage (DupExprAudit: winnowset=2
      // regexp_replace=4 in the plan; no shuffle here for exchange
      // reuse to dedup, unlike llm_char_jaccard's post-aggregation 4)
      .select(col("doc_id"),
        explode(array(
          graft.functions.WinnowSet.winnowSet(col("t"), 8, 4))).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
      // checkpoint BEFORE the total-order sort: with no exchange
      // between the winnow kernel and the orderBy, the range
      // partitioner's boundary-sampling job re-ran the whole kernel
      // before the sort ran it again (IncDedupProbe4 r16: twin
      // 5.3 s-CPU jobs). The materialized rows are the 4-column
      // summary — tiny next to one kernel execution.
      .localCheckpoint(false)
      .orderBy(col("doc_id"))
  }

  private val winnowSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${normSql("text")} AS t FROM documents
       |), p AS (
       |  SELECT doc_id, t, length(t) AS n,
       |         unnest(range(1, length(t) - 6)) AS pos
       |  FROM d
       |), g AS (
       |  SELECT doc_id, pos, n, md5(substr(t, pos::INT, 8)) AS h FROM p
       |), sel AS (
       |  SELECT DISTINCT doc_id, fp FROM (
       |    SELECT doc_id, pos, n,
       |           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
       |    FROM g) WHERE pos <= n - 10
       |)
       |SELECT doc_id, count(*) AS n_fp, min(fp) AS min_fp, max(fp) AS max_fp
       |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------- multimodal stub
  /** Binary-column pipeline: text bytes stand in for media blobs; the
    * deterministic StubDecoder runs in mapPartitions (the real-codec
    * slot). Oracle recomputes the stub's arithmetic in SQL.
    */
  private def multimodal(s: SparkSession, d: String): DataFrame = {
    val withBin = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    Multimodal.extractFeatures(withBin, "blob", Seq("doc_id"))
      .select(col("doc_id"), col("n_bytes"), col("digest"),
        col("width"), col("height"))
      .orderBy(col("doc_id"))
  }

  private val multimodalSql: String =
    s"""SELECT doc_id,
       |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |       md5(text) AS digest,
       |       CAST((instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
       |            + instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1 AS INTEGER) AS width,
       |       CAST((instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
       |            + instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1 AS INTEGER) AS height
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------- perceptual image near-dup
  /** [[Multimodal.perceptualHash]] (dHash over the stubbed byte-
    * sampling thumbnail) feeding [[Dedup.simHashPairs]]'s pigeonhole
    * Hamming machinery — image dedup as a first-class pipeline op.
    * Constructed near-dups: docs with doc_id % 10 == 0 get a copy
    * (id + 100000) with 3 characters overwritten mid-text — a small
    * byte perturbation that moves only the cells covering it, so the
    * pair lands within the Hamming radius; byte-identical dup texts
    * pair at distance 0. The oracle recomputes the thumbnail sums
    * from hex(blob) bytes, the cross-multiplied bit comparisons, and
    * an all-pairs Hamming filter (ground truth — the Spark plan is
    * block-bucket-local, never all-pairs).
    */
  private def imageNearDup(s: SparkSession, d: String): DataFrame = {
    // NULL and EMPTY text must be excluded in BOTH engines: Spark's
    // decoder error path drops them (ok=false) while the oracle's
    // grid CTE would otherwise hand them the all-zero hash and pair
    // every empty doc with every other — a latent divergence (and a
    // candidate-pair flood) on future fixtures. The filter ALSO keeps
    // an empty doc out of the perturbation source: 'ZZZ'+empty would
    // hash fine on the Spark side but be absent from the oracle's.
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull && col("text") =!= "")
    val pert = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(substring(col("text"), 1, 5), lit("ZZZ"),
          expr("substring(text, 9)")).as("text"))
    val blobs = base.unionByName(pert)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val ph = Multimodal.perceptualHash(blobs, "blob", Seq("doc_id"))
    val fp = ph.filter(col("ok")).select(col("doc_id"),
      shiftleft(col("ph_hi"), 32).bitwiseOR(col("ph_lo")).as("fp"))
    Dedup.simHashPairs(fp, col("doc_id"), col("fp"), 64, 4)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val imageNearDupSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND text <> ''
       |  UNION ALL
       |  SELECT doc_id + 100000, substr(text, 1, 5) || 'ZZZ' || substr(text, 9)
       |  FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL AND text <> ''
       |), blobs AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM base
       |), bytes AS (
       |  SELECT doc_id, n, unnest(range(0, n)) AS p, hx FROM blobs
       |), vals AS (
       |  SELECT doc_id, n, (p * 72) // n AS cell,
       |         (instr('0123456789abcdef', substr(hx, CAST(2*p+1 AS INTEGER), 1)) - 1) * 16
       |          + instr('0123456789abcdef', substr(hx, CAST(2*p+2 AS INTEGER), 1)) - 1 AS v
       |  FROM bytes
       |), cells AS (
       |  SELECT doc_id, cell, SUM(v) AS s, COUNT(*) AS c FROM vals GROUP BY 1, 2
       |), grid AS (
       |  SELECT b.doc_id, rr, cc
       |  FROM (SELECT DISTINCT doc_id FROM blobs) b
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS rr)
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS cc)
       |), bits AS (
       |  SELECT g.doc_id, (g.rr*8 + g.cc) AS k,
       |         CASE WHEN COALESCE(l.s, 0) * COALESCE(r.c, 0)
       |                 > COALESCE(r.s, 0) * COALESCE(l.c, 0) THEN 1 ELSE 0 END AS bit
       |  FROM grid g
       |  LEFT JOIN cells l ON l.doc_id = g.doc_id AND l.cell = g.rr*9 + g.cc
       |  LEFT JOIN cells r ON r.doc_id = g.doc_id AND r.cell = g.rr*9 + g.cc + 1
       |), ph AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << CAST(k - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS hi,
       |         CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << CAST(k AS INTEGER)) ELSE 0 END) AS BIGINT) AS lo
       |  FROM bits GROUP BY 1
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 4
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------- incremental dedup
  /** [[IncrementalDedup.admit]] end-to-end: increment 1 (doc_id % 3
    * == 0) seeds the fingerprint state; increment 2 (the remaining
    * docs, plus constructed near-dups of %9 docs with their last 3
    * words cut) admits only what history hasn't seen — exact dups by
    * digest, near dups by LSH-banded signature-overlap estimate
    * ≥ 0.5. The state table lives in a per-run temp dir (contents
    * fully deterministic); the oracle recomputes both increments'
    * admission logic declaratively over the same corpus, so the hash
    * compare pins digesting, in-batch keep-lowest-id, band keying,
    * and the estimate threshold in one go.
    */
  private def incrementalDedupQ(s: SparkSession, d: String): DataFrame = {
    // fanOut before admit: the minhash fingerprint kernel inside admit
    // is the query's CPU center (~4.3 s of md5/shingle CPU across both
    // increments, IncDedupProbe4), and a small parquet scan is ONE
    // split — without the fan the kernels run as 1-2 tasks
    val docs = Tables.fanOut(Tables.documents(s, d)).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val ws = TextOps.words(col("text"))
    val pert = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"),
        array_join(slice(ws, lit(1), greatest(size(ws) - 3, lit(0))), " ").as("text"))
    val b2 = docs.filter(col("doc_id") % 3 =!= 0).unionByName(pert)
    val t = new graft.storage.TxTable(s,
      java.nio.file.Files.createTempDirectory("inc_dedup_q").toString)
    // the bucketed band index is the 100 TB candidate path — running
    // it here puts the bucket-local join under the oracle hash gate
    // (admissions must be identical to the derive-from-state form)
    val run = java.util.UUID.randomUUID().toString.replace("-", "")
    val bi = new graft.llm.BandIndex(s, s"inc_bands_q_$run")
    val di = new graft.llm.DigestIndex(s, s"inc_digests_q_$run")
    try {
      // prepare() both increments up front: increment 2's fingerprint
      // kernel (the CPU center) materializes concurrently with the
      // whole of increment 1's admit — kernels are state-independent,
      // so the catch-up pipeline hides increment 1's joins and commit
      // under increment 2's kernel
      val p1 = IncrementalDedup.prepare(b1, col("doc_id"), col("text"))
      val p2 = IncrementalDedup.prepare(b2, col("doc_id"), col("text"))
      IncrementalDedup.admitPrepared(t, p1, "2021-01-01",
        bands = Some(bi), digests = Some(di))
      // withDigest: the admitted fingerprint IS the state digest the
      // admit already computed — selecting it (instead of re-hashing
      // text) lets column pruning drop the text read from the final
      // join entirely
      IncrementalDedup.admitPrepared(t, p2, "2021-01-02",
        bands = Some(bi), digests = Some(di), withDigest = true)
        .select(col("doc_id"), col("digest").as("fp"))
        .orderBy(col("doc_id"))
    } finally {
      // the returned frame reads only the checkpointed admission frame
      // and the input parquet, never the indexes — dropping the managed
      // tables here (data included) is safe and keeps repeated catalog
      // runs from accumulating orphaned per-run tables
      s.sql(s"DROP TABLE IF EXISTS ${bi.table}")
      s.sql(s"DROP TABLE IF EXISTS ${di.table}")
    }
  }

  private val incrementalDedupSql: String =
    s"""WITH ib1 AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND doc_id % 3 = 0
       |), ib2 AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND doc_id % 3 <> 0
       |  UNION ALL
       |  SELECT doc_id + 300000,
       |         array_to_string(ws[1:greatest(len(ws)-3, 0)], ' ')
       |  FROM (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |        WHERE text IS NOT NULL AND doc_id % 9 = 0)
       |), id1 AS (SELECT doc_id, md5(${normSql("text")}) AS digest FROM ib1),
       |ib2f AS (SELECT doc_id, text, md5(${normSql("text")}) AS digest FROM ib2),
       |ib2u AS (
       |  SELECT doc_id, text, digest FROM (
       |    SELECT doc_id, text, digest,
       |           row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
       |    FROM ib2f) WHERE rn = 1
       |), inoex AS (
       |  SELECT * FROM ib2u WHERE digest NOT IN (SELECT digest FROM id1)
       |), ish1 AS (
       |  SELECT doc_id AS id, unnest(list_distinct(
       |    CASE WHEN len(ws) >= 3
       |         THEN list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' '))
       |         ELSE CAST([] AS VARCHAR[]) END)) AS s
       |  FROM (SELECT doc_id, ${wordsSql("text")} AS ws FROM ib1)
       |), ish2 AS (
       |  SELECT doc_id AS id, unnest(list_distinct(
       |    CASE WHEN len(ws) >= 3
       |         THEN list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' '))
       |         ELSE CAST([] AS VARCHAR[]) END)) AS s
       |  FROM (SELECT doc_id, ${wordsSql("text")} AS ws FROM inoex)
       |), imh1 AS (
       |  SELECT id, seed, min(substring(md5(CAST(seed // 4 AS VARCHAR) || '|' || s), 1 + 8 * (seed % 4), 8)) AS m
       |  FROM ish1 CROSS JOIN (SELECT seed FROM range(8) t(seed)) GROUP BY 1, 2
       |), imh2 AS (
       |  SELECT id, seed, min(substring(md5(CAST(seed // 4 AS VARCHAR) || '|' || s), 1 + 8 * (seed % 4), 8)) AS m
       |  FROM ish2 CROSS JOIN (SELECT seed FROM range(8) t(seed)) GROUP BY 1, 2
       |), ibd1 AS (
       |  SELECT id, seed // 2 AS band, string_agg(m, '' ORDER BY seed) AS bk
       |  FROM imh1 GROUP BY 1, 2
       |), ibd2 AS (
       |  SELECT id, seed // 2 AS band, string_agg(m, '' ORDER BY seed) AS bk
       |  FROM imh2 GROUP BY 1, 2
       |), icand AS (
       |  SELECT DISTINCT n.id AS new_id, o.id AS old_id
       |  FROM ibd2 n JOIN ibd1 o ON n.band = o.band AND n.bk = o.bk
       |), isupp AS (
       |  SELECT DISTINCT c.new_id FROM icand c
       |  JOIN imh2 a ON a.id = c.new_id
       |  JOIN imh1 b ON b.id = c.old_id AND b.seed = a.seed
       |  GROUP BY c.new_id, c.old_id
       |  HAVING count(*) FILTER (WHERE a.m = b.m) * 1.0 / 8 >= 0.5
       |)
       |SELECT doc_id, digest AS fp FROM inoex
       |WHERE doc_id NOT IN (SELECT new_id FROM isupp)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ sequence packing
  /** [[Packing.packSequences]] — documents' whitespace tokens laid
    * end-to-end in doc_id order and cut into 512-token training
    * sequences (docs split across boundaries, zero padding waste;
    * the public GPT/Megatron data layout). The Spark plan computes
    * the global token offset as a two-level parallel prefix sum
    * (deterministic id-range shards; the only global window runs
    * over one row per shard), so the answer is shard-count-invariant
    * — which is exactly what the single-window DuckDB oracle proves.
    */
  private def packSeqs(s: SparkSession, d: String): DataFrame =
    Packing.packSequences(
        Tables.documents(s, d).filter(col("text").isNotNull),
        col("doc_id"), size(TextOps.words(col("text"))), seqLen = 512L)
      .orderBy(col("doc_id"), col("seq_id"))

  private val packSeqsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len(${wordsSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents WHERE text IS NOT NULL
       |), pos AS (
       |  SELECT doc_id, n_tok,
       |         SUM(n_tok) OVER (ORDER BY doc_id) AS cum
       |  FROM toks WHERE n_tok > 0
       |), spans AS (
       |  SELECT doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS strt,
       |         CAST(cum AS BIGINT) AS en
       |  FROM pos
       |), seqs AS (
       |  SELECT doc_id, strt, en,
       |         unnest(generate_series(strt // 512, (en - 1) // 512)) AS seq_id
       |  FROM spans
       |)
       |SELECT doc_id, seq_id,
       |       greatest(strt, seq_id * 512) - strt AS doc_off,
       |       least(en, (seq_id + 1) * 512) - greatest(strt, seq_id * 512) AS n_tok_in_seq
       |FROM seqs ORDER BY doc_id, seq_id""".stripMargin

  // --------------------------------------------- semantic packing
  /** [[Similarity.semanticOrder]] + [[Packing.packSequences]] — the
    * in-context-pretraining layout (Shi et al. arXiv:2310.10638):
    * documents ordered (k-means cell, cosine-to-centroid desc, id)
    * BEFORE packing, so each 256-token training sequence spans
    * topically-adjacent documents instead of random id-order splices.
    * The global position is the two-level grouped rank (keyed window
    * + |cells|-row base offsets — no corpus sort), and the rank then
    * drives the same two-level prefix-sum packing `llm_pack_sequences`
    * pins. Tokens come from the documents row sharing the embedding's
    * id; embeddings without a token row rank but don't pack — holes
    * in the rank sequence are part of the contract.
    */
  private def semanticPackQ(s: SparkSession, d: String): DataFrame = {
    val ord = Similarity.semanticOrder(
      Tables.embeddings(s, d), col("vec_id"), col("embedding"), k = 8, iters = 5)
    val toks = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        size(TextOps.words(col("text"))).cast("long").as("n_tok"))
    // Materialize the packing manifest ONCE: packSequences evaluates
    // its input three times (bounds action + local/prefix branches)
    // and the rank re-join below adds a fourth — without this, each
    // re-runs the tokenize + assign + rank pipeline. The checkpointed
    // frame is the narrow (id, cell, csim, rank, n_tok) manifest a
    // real layout pass would write to a table before packing.
    val input = ord.join(toks, "id").localCheckpoint(false)
    Packing.packSequences(input, col("rank"), col("n_tok"), seqLen = 256L)
      .withColumnRenamed("doc_id", "rank")
      .join(input.select(col("id").as("vec_id"), col("cell"), col("rank")), "rank")
      .select(col("rank"), col("vec_id"), col("cell").cast("int").as("cell"),
        col("seq_id"), col("doc_off"), col("n_tok_in_seq"))
      .orderBy(col("rank"), col("seq_id"))
  }

  private val semanticPackSql: String = {
    val k = 8; val iters = 5; val dimPlus1 = 65
    def centsCte(i: Int, from: String): String =
      s"""pkcomp$i AS (
         |  SELECT cell, i, avg(v[i]) AS c
         |  FROM $from CROSS JOIN (SELECT i FROM range(1, $dimPlus1) t(i))
         |  GROUP BY 1, 2
         |), pkcents$i AS (SELECT cell, list(c ORDER BY i) AS centroid FROM pkcomp$i GROUP BY 1)"""
        .stripMargin
    def d2Sql(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dimPlus1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assignCte(i: Int, cents: String): String =
      s"""pkassign$i AS (
         |  SELECT id, v, cell FROM (
         |    SELECT p.id, p.v, c.cell,
         |           row_number() OVER (PARTITION BY p.id
         |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
         |    FROM pts p CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      assignCte(i, s"pkcents${i - 1}") + ",\n" + centsCte(i, s"pkassign$i")
    }.mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
       |),
       |pkcents0 AS (
       |  SELECT (row_number() OVER (ORDER BY id)) - 1 AS cell, v AS centroid
       |  FROM pts QUALIFY row_number() OVER (ORDER BY id) <= $k
       |),
       |$iterCtes,
       |pkfinal AS (
       |  SELECT id, v, cell FROM (
       |    SELECT p.id, p.v, c.cell,
       |           row_number() OVER (PARTITION BY p.id
       |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
       |    FROM pts p CROSS JOIN pkcents$iters c)
       |  WHERE rn = 1
       |), pkcs AS (
       |  SELECT a.id, a.cell,
       |         list_dot_product(a.v, c.centroid)
       |           / (sqrt(list_dot_product(a.v, a.v))
       |              * sqrt(list_dot_product(c.centroid, c.centroid))) AS csim
       |  FROM pkfinal a JOIN pkcents$iters c USING (cell)
       |), ranked AS (
       |  SELECT id, cell,
       |         row_number() OVER (ORDER BY cell, csim DESC, id) - 1 AS rank
       |  FROM pkcs
       |), toks AS (
       |  SELECT doc_id AS id, CAST(len(${wordsSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents WHERE text IS NOT NULL
       |), withtok AS (
       |  SELECT r.rank, r.id, r.cell, t.n_tok
       |  FROM ranked r JOIN toks t USING (id)
       |  WHERE t.n_tok > 0
       |), pos AS (
       |  SELECT rank, id, cell, n_tok, SUM(n_tok) OVER (ORDER BY rank) AS cum
       |  FROM withtok
       |), spans AS (
       |  SELECT rank, id, cell, n_tok, CAST(cum - n_tok AS BIGINT) AS strt,
       |         CAST(cum AS BIGINT) AS en
       |  FROM pos
       |), seqs AS (
       |  SELECT rank, id, cell, strt, en,
       |         unnest(generate_series(strt // 256, (en - 1) // 256)) AS seq_id
       |  FROM spans
       |)
       |SELECT rank, id AS vec_id, CAST(cell AS INTEGER) AS cell, seq_id,
       |       greatest(strt, seq_id * 256) - strt AS doc_off,
       |       least(en, (seq_id + 1) * 256) - greatest(strt, seq_id * 256) AS n_tok_in_seq
       |FROM seqs ORDER BY rank, seq_id""".stripMargin
  }

  // -------------------------------------- audio-fingerprint near-dup
  /** [[Multimodal.audioHash]] (energy-delta fingerprint over the
    * stubbed sample slot) feeding the same pigeonhole Hamming
    * machinery as the image path — audio dedup as a pipeline op.
    * Constructed near-dups: docs with doc_id % 10 == 3 get a copy
    * (id + 200000) with 3 characters overwritten at offset 50; the
    * perturbation moves only the frames covering it. Oracle: exact
    * Σv² frame energies from hex(blob) bytes, sign-of-difference
    * bits, all-pairs Hamming ≤ 4 as ground truth.
    */
  private def audioNearDup(s: SparkSession, d: String): DataFrame = {
    // null/empty excluded for the same reasons as imageNearDup's base
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull && col("text") =!= "")
    val pert = base.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(substring(col("text"), 1, 50), lit("QQQ"),
          expr("substring(text, 54)")).as("text"))
    val blobs = base.unionByName(pert)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val fp = Multimodal.audioHash(blobs, "blob", Seq("doc_id"))
      .filter(col("ok")).select(col("doc_id"),
        shiftleft(col("fp_hi"), 32).bitwiseOR(col("fp_lo")).as("fp"))
    Dedup.simHashPairs(fp, col("doc_id"), col("fp"), 64, 4)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val audioNearDupSql: String =
    s"""WITH abase AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND text <> ''
       |  UNION ALL
       |  SELECT doc_id + 200000, substr(text, 1, 50) || 'QQQ' || substr(text, 54)
       |  FROM documents WHERE doc_id % 10 = 3 AND text IS NOT NULL AND text <> ''
       |), ablobs AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM abase
       |), abytes AS (
       |  SELECT doc_id, n, unnest(range(0, n)) AS p, hx FROM ablobs
       |), avals AS (
       |  SELECT doc_id, (p * 65) // n AS frame,
       |         (instr('0123456789abcdef', substr(hx, CAST(2*p+1 AS INTEGER), 1)) - 1) * 16
       |          + instr('0123456789abcdef', substr(hx, CAST(2*p+2 AS INTEGER), 1)) - 1 AS v
       |  FROM abytes
       |), aenergy AS (
       |  SELECT doc_id, frame, SUM(CAST(v AS BIGINT) * v) AS e
       |  FROM avals GROUP BY 1, 2
       |), agrid AS (
       |  SELECT b.doc_id, k
       |  FROM (SELECT DISTINCT doc_id FROM ablobs) b
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS k)
       |), abits AS (
       |  SELECT g.doc_id, g.k,
       |         CASE WHEN COALESCE(l.e, 0) > COALESCE(r.e, 0) THEN 1 ELSE 0 END AS bit
       |  FROM agrid g
       |  LEFT JOIN aenergy l ON l.doc_id = g.doc_id AND l.frame = g.k
       |  LEFT JOIN aenergy r ON r.doc_id = g.doc_id AND r.frame = g.k + 1
       |), afp AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << CAST(k - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS hi,
       |         CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << CAST(k AS INTEGER)) ELSE 0 END) AS BIGINT) AS lo
       |  FROM abits GROUP BY 1
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
       |FROM afp a JOIN afp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 4
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------- video frame sampling
  /** [[Multimodal.frameSample]] — the video slot: blobs demuxed as
    * fixed-size-frame containers (64-byte stub frames), every 3rd
    * frame emitted as its own (doc_id, frame_idx, frame) row off a
    * lazy per-partition iterator. The hash compare pins the frame
    * BYTES (hex), boundaries, sampling stride, and partial-frame
    * drop; the oracle slices the identical windows out of the blob's
    * hex image.
    */
  private def frameSampleQ(s: SparkSession, d: String): DataFrame = {
    val blobs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    Multimodal.frameSample(blobs, "blob", Seq("doc_id"), 64, 3)
      .filter(col("ok"))
      .select(col("doc_id"), col("frame_idx"),
        lower(hex(col("frame"))).as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val frameSampleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents WHERE text IS NOT NULL
       |), f AS (
       |  SELECT doc_id, unnest(range(0, n // 64)) AS frame_idx, hx FROM b
       |)
       |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       |       substr(hx, CAST(frame_idx * 128 + 1 AS INTEGER), 128) AS frame_hex
       |FROM f WHERE frame_idx % 3 = 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ------------------------------------------- video near-duplicate
  /** Frame-level video near-dup — [[Multimodal.frameSample]] composed
    * into the dedup machinery: two videos pair when they share ≥ 2
    * distinct sampled-frame contents. Frames repeated within one doc
    * count once; frames present in > 32 docs are pruned as
    * boilerplate (no dedup signal, and the prune is what keeps the
    * frame-keyed pair join bucket-local at scale — the same min/max
    * document-frequency discipline as the line scrub). Constructed
    * near-dups: doc_id % 10 == 0 gets a copy (+200000) with 3 chars
    * overwritten — one damaged frame, every other sampled frame
    * still shared. The oracle replays frames as 128-hex-digit slices.
    */
  private def videoNearDupQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val pert = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(substring(col("text"), 1, 5), lit("ZZZ"),
          expr("substring(text, 9)")).as("text"))
    val blobs = base.unionByName(pert)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val frames = Multimodal.frameSample(blobs, "blob", Seq("doc_id"), 64, 3)
      .filter(col("ok"))
      .select(col("doc_id"), lower(hex(col("frame"))).as("fh"))
      .distinct()
    val keep = frames.groupBy("fh").count()
      .filter(col("count").between(2, 32)).select("fh")
    val f = frames.join(keep, Seq("fh"))
    f.as("x").join(f.as("y"),
        col("x.fh") === col("y.fh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val videoNearDupSql: String =
    s"""WITH vbase AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |  UNION ALL
       |  SELECT doc_id + 200000, substr(text, 1, 5) || 'ZZZ' || substr(text, 9)
       |  FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL
       |), vb AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM vbase
       |), vf0 AS (
       |  SELECT doc_id, unnest(range(0, n // 64)) AS fi, hx FROM vb
       |), vf AS (
       |  SELECT DISTINCT doc_id, substr(hx, CAST(fi * 128 + 1 AS INTEGER), 128) AS fh
       |  FROM vf0 WHERE fi % 3 = 0
       |), vkeep AS (
       |  SELECT fh FROM vf GROUP BY fh HAVING count(*) BETWEEN 2 AND 32
       |), vff AS (
       |  SELECT vf.doc_id, vf.fh FROM vf JOIN vkeep USING (fh)
       |)
       |SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
       |FROM vff x JOIN vff y ON x.fh = y.fh AND x.doc_id < y.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------ thumbnail resize
  /** [[Multimodal.resize]] — 6×4 grayscale thumbnails from the
    * stubbed codec slot: cell = integer mean of the raw bytes binned
    * by (p·24)/n, the dHash binning factored into a standalone
    * resize stage. Integer-exact, so the oracle rebuilds every
    * thumbnail byte (two hex digits at a time) and the hash compare
    * pins the binning, the mean, and the empty-cell letterboxing.
    */
  private def resizeQ(s: SparkSession, d: String): DataFrame = {
    val blobs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    Multimodal.resize(blobs, "blob", Seq("doc_id"), 6, 4)
      .filter(col("ok"))
      .select(col("doc_id"), lower(hex(col("thumb"))).as("thumb_hex"))
      .orderBy(col("doc_id"))
  }

  private val resizeSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents
       |  WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
       |), bytes AS (
       |  SELECT doc_id, n, unnest(range(0, n)) AS p, hx FROM b
       |), vals AS (
       |  SELECT doc_id, (p * 24) // n AS cell,
       |         (instr('0123456789abcdef', substr(hx, CAST(2*p+1 AS INTEGER), 1)) - 1) * 16
       |          + instr('0123456789abcdef', substr(hx, CAST(2*p+2 AS INTEGER), 1)) - 1 AS v
       |  FROM bytes
       |), cells AS (
       |  SELECT doc_id, cell, SUM(v) // COUNT(*) AS m FROM vals GROUP BY 1, 2
       |), grid AS (
       |  SELECT d.doc_id, g.cell
       |  FROM (SELECT DISTINCT doc_id FROM b) d
       |  CROSS JOIN (SELECT unnest(range(0, 24)) AS cell) g
       |)
       |SELECT g.doc_id,
       |       lower(string_agg(lpad(to_hex(COALESCE(c.m, 0)), 2, '0'), '' ORDER BY g.cell)) AS thumb_hex
       |FROM grid g LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.cell = g.cell
       |GROUP BY 1 ORDER BY g.doc_id""".stripMargin

  // ---------------------------------------------------- IVF-PQ ANN
  /** [[Similarity.ivfPqTopK]] — IVFADC (Jégou et al. TPAMI 2011) over
    * the label cells: product-quantized residuals (M=8 subspaces ×
    * ksub=16 codewords, 3 grouped-Lloyd rounds), nprobe=3 probed
    * cells, ADC candidate ordering, exact-cosine rerank of the top
    * 80. Operating point chosen by measurement (PqProbe, 2026-08-13):
    * within-probe recall 10/10 — every neighbor the probed cells
    * contain survives PQ — while the candidate scan itself reads only
    * M int8-sized codes + one norm per vector, the property that
    * makes ANN memory-bounded at 100 TB.
    *
    * The oracle unrolls the SAME grouped per-subspace Lloyd fit in
    * SQL (m is just a grouping key, so all 8 subspaces share each
    * unrolled round), then reproduces the ADC table, per-cell
    * constants, rank-80 cut and exact rerank. Fixture-stability
    * caveat as llm_kmeans_ivf: avg() centroids and the ADC sums are
    * summation-order-dependent, so candidate-boundary flips below
    * ~1e-12 are possible in principle, absent here; the emitted sims
    * are exact-vector cosines, r4-rounded.
    */
  private def ivfPq(s: SparkSession, d: String): DataFrame =
    Similarity.ivfPqTopK(
        Tables.embeddings(s, d), col("vec_id"), col("label"), col("embedding"),
        col("vec_id") === 0L, 10, 3, 80, mSub = 8, dim = 64, ksub = 16, iters = 3)
      .select(col("id"), col("picked_cell").cast("int").as("picked_cell"),
        r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))

  private val ivfPqSql: String = {
    val m = 8; val dsub = 8; val ksub = 16; val iters = 3
    val dsubP1 = dsub + 1
    def d2Sub(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dsubP1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assignCte(i: Int, cb: String): String =
      s"""passign$i AS (
         |  SELECT id, cell, m, subv, code FROM (
         |    SELECT s.id, s.cell, s.m, s.subv, c.code,
         |           row_number() OVER (PARTITION BY s.id, s.m
         |             ORDER BY ${d2Sub("s.subv", "c.centroid")}, c.code) AS rn
         |    FROM sub s JOIN $cb c USING (m)) WHERE rn = 1)""".stripMargin
    def centsCte(i: Int): String =
      s"""pcomp$i AS (
         |  SELECT m, code, i, avg(subv[i]) AS c
         |  FROM passign$i CROSS JOIN (SELECT i FROM range(1, $dsubP1) t(i))
         |  GROUP BY 1, 2, 3
         |), cb$i AS (SELECT m, code, list(c ORDER BY i) AS centroid FROM pcomp$i GROUP BY 1, 2)"""
        .stripMargin
    val iterCtes = (1 to iters)
      .map(i => assignCte(i, s"cb${i - 1}") + ",\n" + centsCte(i)).mkString(",\n")
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |pts AS (SELECT vec_id AS id, label AS cell, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |comp AS (
       |  SELECT cell, i, avg(v[i]) AS c
       |  FROM pts CROSS JOIN (SELECT i FROM range(1, 65) t(i)) GROUP BY 1, 2
       |), cents AS (SELECT cell, list(c ORDER BY i) AS centroid FROM comp GROUP BY 1),
       |resid AS (
       |  SELECT p.id, p.cell, list_transform(range(1, 65), i -> p.v[i] - c.centroid[i]) AS r
       |  FROM pts p JOIN cents c USING (cell)
       |), sub AS (
       |  SELECT id, cell, m, r[(m*$dsub+1):((m+1)*$dsub)] AS subv
       |  FROM resid CROSS JOIN (SELECT m FROM range(0, $m) t(m))
       |), cb0 AS (
       |  SELECT m, (row_number() OVER (PARTITION BY m ORDER BY id)) - 1 AS code, subv AS centroid
       |  FROM sub QUALIFY row_number() OVER (PARTITION BY m ORDER BY id) <= $ksub
       |),
       |$iterCtes,
       |${assignCte(iters + 1, s"cb$iters")},
       |tab AS (
       |  SELECT c.m, c.code, list_dot_product(c.centroid, qv[(c.m*$dsub+1):((c.m+1)*$dsub)]) AS ip
       |  FROM cb$iters c, q
       |), cconst AS (
       |  SELECT cell, list_dot_product(centroid, qv) AS cip,
       |         list_dot_product(centroid, qv)
       |           / (sqrt(list_dot_product(centroid, centroid)) * sqrt(list_dot_product(qv, qv))) AS csim
       |  FROM cents, q
       |), probed AS (SELECT cell, cip FROM cconst ORDER BY csim DESC, cell LIMIT 3),
       |rip AS (
       |  SELECT k.id, list_sum(list(t.ip ORDER BY k.m)) AS rip
       |  FROM passign${iters + 1} k JOIN probed USING (cell) JOIN tab t USING (m, code)
       |  GROUP BY k.id
       |), cand AS (
       |  SELECT p.id, p.cell AS picked_cell, p.v, sqrt(list_dot_product(p.v, p.v)) AS nv, pr.cip
       |  FROM pts p JOIN probed pr USING (cell)
       |), approx AS (
       |  SELECT c.id, c.picked_cell, c.v,
       |         (c.cip + r.rip) / (c.nv * sqrt(list_dot_product(qv, qv))) AS a
       |  FROM cand c JOIN rip r USING (id), q
       |  ORDER BY a DESC, c.id LIMIT 80
       |), rer AS (
       |  SELECT id, picked_cell,
       |         list_dot_product(v, qv)
       |           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM approx, q
       |), topk AS (SELECT * FROM rer ORDER BY sim DESC, id LIMIT 10)
       |SELECT id, CAST(picked_cell AS INTEGER) AS picked_cell, ${r4Sql("sim")} AS sim
       |FROM topk ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin
  }

  // ----------------------------------- IVF-PQ probe path (PqIndex)
  /** Build-once / probe-many fixture cache for [[graft.llm.PqIndex]]
    * (the TimeSeriesQueries dmlFixtures pattern): the first call per
    * testdata dir builds and persists the index; every later call —
    * including every bench round — pays ONLY the probe. This is the
    * deployment lifecycle the bench row should price: `llm_ivf_pq`
    * deliberately keeps fitting in-query (the oracle pins the fit),
    * while this row prices the partition-pruned probe itself.
    */
  private val pqIdxFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** [[graft.llm.PqIndex.topK]] against the prebuilt index — value-
    * identical to `llm_ivf_pq` (PqIndexSpec pins the equivalence; the
    * oracle SQL is shared verbatim), but the measured plan is the
    * DEPLOYED one: nprobe cell directories partition-pruned from the
    * codes scan (PlanShapeSpec pins the PartitionFilters), ADC as
    * literal-array folds, exact rerank joining base vectors for the
    * 80 survivors only.
    */
  private def ivfPqProbe(s: SparkSession, d: String): DataFrame = {
    val dir = pqIdxFixtures.computeIfAbsent(d, { dd =>
      val idx = java.nio.file.Files.createTempDirectory("pq_idx_q").toString
      graft.llm.PqIndex.build(
        Tables.embeddings(s, dd).filter(col("vec_id") =!= 0L),
        col("vec_id"), col("label"), col("embedding"), idx)
      idx
    })
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), x => x.cast("double")).as("qv"))
      .head().getSeq[Double](0)
    graft.llm.PqIndex.topK(s, dir, emb.filter(col("vec_id") =!= 0L),
        col("vec_id"), col("embedding"), q, k = 10, nprobe = 3, rerank = 80)
      .select(col("id"), col("picked_cell").cast("int").as("picked_cell"),
        r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))
  }

  /** IVF over deterministic k-means cells — the data-driven ANN scale
    * path (label-based IVF measured 1/5 recall on this data; k-means
    * cells actually contain the neighbors). The oracle unrolls the
    * same 5 Lloyd iterations in SQL (init = vectors of the k smallest
    * ids, assignment ties to the lowest cell, mean recompute), then
    * probes the best cell by centroid cosine and takes the in-cell
    * top-10 — byte-identical semantics to [[Similarity.ivfKMeansTopK]],
    * so the previously rows-only check is now a full hash compare.
    * Floating-point note: both engines fold distances over doubles;
    * assignments only diverge on distance near-ties (< 1e-12), absent
    * in this fixture, and the emitted sims are r4-rounded.
    */
  private def kmeansIvf(s: SparkSession, d: String): DataFrame =
    // NOT fanned out (measured slower both with and without the fit's
    // persist): the assignment/probe path re-executes the repartition
    // exchange, and the 32-thread win on a 2000-row vector scan never
    // repays it. kMeansFit persists its own input for the Lloyd loop.
    Similarity.ivfKMeansTopK(
        Tables.embeddings(s, d), col("vec_id"), col("embedding"),
        col("vec_id") === 0L, 10, cells = 8, iters = 5)
      .select(col("id"), col("picked_cell"), r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))

  /** 5 unrolled Lloyd iterations + probe, mirroring
    * [[Similarity.kMeansFit]]/[[Similarity.ivfKMeansTopK]]: the argmin
    * orders by the same explicit ascending-index squared distance both
    * sides (no sqrt — see d2Sql below). Residual caveat: both engines'
    * `avg()` centroid recompute is summation-order-dependent, so the
    * compare is fixture-stable (assignments diverge only on <1e-12
    * centroid-distance near-ties, absent here), not proof of
    * engine-exactness over 5 iterations.
    */
  private val kmeansIvfSql: String = {
    val k = 8; val iters = 5; val dimPlus1 = 65
    def centsCte(i: Int, from: String): String =
      s"""comp$i AS (
         |  SELECT cell, i, avg(v[i]) AS c
         |  FROM $from CROSS JOIN (SELECT i FROM range(1, $dimPlus1) t(i))
         |  GROUP BY 1, 2
         |), cents$i AS (SELECT cell, list(c ORDER BY i) AS centroid FROM comp$i GROUP BY 1)"""
        .stripMargin
    // squared distance as an explicit ascending-index sum of products,
    // matching the Spark side's aggregate-fold exactly: list_distance's
    // sqrt could collapse distinct squared distances into float ties
    // that the cell tiebreak then resolves differently per engine
    def d2Sql(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dimPlus1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assignCte(i: Int, cents: String): String =
      s"""assign$i AS (
         |  SELECT id, v, cell FROM (
         |    SELECT p.id, p.v, c.cell,
         |           row_number() OVER (PARTITION BY p.id
         |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
         |    FROM pts p CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      assignCte(i, s"cents${i - 1}") + ",\n" + centsCte(i, s"assign$i")
    }.mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0
       |), q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |cents0 AS (
       |  SELECT (row_number() OVER (ORDER BY id)) - 1 AS cell, v AS centroid
       |  FROM pts QUALIFY row_number() OVER (ORDER BY id) <= $k
       |),
       |$iterCtes,
       |final_assign AS (
       |  SELECT id, v, cell FROM (
       |    SELECT p.id, p.v, c.cell,
       |           row_number() OVER (PARTITION BY p.id
       |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
       |    FROM pts p CROSS JOIN cents$iters c)
       |  WHERE rn = 1
       |), best AS (
       |  SELECT cell FROM cents$iters, q
       |  ORDER BY list_dot_product(centroid, qv)
       |             / (sqrt(list_dot_product(centroid, centroid))
       |                * sqrt(list_dot_product(qv, qv))) DESC, cell
       |  LIMIT 1
       |), sel AS (
       |  SELECT a.id, a.cell AS picked_cell,
       |         list_dot_product(a.v, qv)
       |           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM final_assign a JOIN best USING (cell), q
       |), topk AS (SELECT * FROM sel ORDER BY sim DESC, id LIMIT 10)
       |SELECT id, CAST(picked_cell AS INTEGER) AS picked_cell, ${r4Sql("sim")} AS sim
       |FROM topk ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin
  }

  /** [[graft.llm.CorpusIo]] round-trip under the oracle hash gate:
    * the documents table is exported as JSONL shards ONCE per dir
    * (build-once fixture — a corpus lands on disk once, is ingested
    * many times), re-ingested through the declared-schema
    * text+from_json path, and aggregated per lang; DuckDB computes
    * the same aggregate from the ORIGINAL parquet, so a hash match
    * certifies the edge is lossless (every doc_id, every n_chars,
    * zero error-channel rows — asserted inside the query via the
    * errors count folded into a guard column).
    */
  private val jsonlDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = jsonlDirs.computeIfAbsent(d, _ => {
      val out = java.nio.file.Files.createTempDirectory("jsonl").toString
      CorpusIo.writeJsonl(Tables.documents(s, d), out)
      out
    })
    val (rows, errors) = CorpusIo.readJsonl(s, dir)
    rows.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(col("doc_id")).as("id_sum"))
      // n_err rides every row: a single corrupt line flips the hash
      .crossJoin(broadcast(errors.agg(count(lit(1)).as("n_err"))))
      .orderBy(col("lang"))
  }

  private val jsonlRoundtripSql: String =
    s"""SELECT lang, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(n_chars) AS BIGINT) AS chars,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       CAST(0 AS BIGINT) AS n_err
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** [[Similarity.kCenterSample]] — greedy farthest-point diversity
    * selection (Gonzalez 1985), k=5 over the embeddings table. The
    * oracle unrolls the same greedy chain: seed = smallest id, then
    * each step takes the argmax of the running min-L2² to the selected
    * set (ties to the lowest id), with the distance folded in explicit
    * ascending-index order on both sides (the kmeansIvf d2Sql
    * discipline — min/least over exact doubles has no fold hazard, so
    * the chain is engine-exact; only the emitted radius is r4).
    */
  private def kcenterQ(s: SparkSession, d: String): DataFrame =
    Similarity.kCenterSample(
        Tables.embeddings(s, d), col("vec_id"), col("embedding"), 5)
      .select(col("rank"), col("id"), r4(col("d")).as("d"))
      .orderBy(col("rank"))

  private val kcenterSql: String = {
    val k = 5; val dimPlus1 = 65
    def l2(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dimPlus1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    val steps = (2 to k).map { t =>
      val prev = if (t == 2) "pts" else s"d${t - 2}"
      val dExpr = if (t == 2) l2("p.v", "s.v")
        else s"least(p.d, ${l2("p.v", "s.v")})"
      s"""d${t - 1} AS (
         |  SELECT p.id, p.v, $dExpr AS d
         |  FROM $prev p, s${t - 1} s WHERE p.id <> s.id
         |), s$t AS (SELECT id, v, d FROM d${t - 1} ORDER BY d DESC, id LIMIT 1)"""
        .stripMargin
    }.mkString(",\n")
    val out = (1 to k).map { t =>
      if (t == 1)
        s"SELECT CAST(1 AS INTEGER) AS rank, id, CAST(NULL AS DOUBLE) AS d FROM s1"
      else s"SELECT CAST($t AS INTEGER), id, ${r4Sql("d")} FROM s$t"
    }.mkString("\nUNION ALL ")
    s"""WITH pts AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
       |), s1 AS (SELECT id, v FROM pts ORDER BY id LIMIT 1),
       |$steps
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** [[Similarity.semanticDedup]] — SemDeDup (Abbas et al.,
    * arXiv:2303.09540) over the embeddings table: k-means (k=8, 5
    * Lloyd iterations, same deterministic fit as llm_kmeans_ivf),
    * then within each cluster drop every item with cosine ≥ 0.9 to
    * an earlier-ranked item (rank = cosine-to-centroid DESC, id ASC).
    * Duplicates are constructed exact copies of every 10th vector
    * (cosine exactly 1.0, identical L2 distances → same cell and
    * same centroid-cosine in both engines, rank tie broken by id),
    * so recall is 1 by construction and the compare is exact; the
    * natural max cosine in this data is ~0.51, far under τ. The
    * oracle unrolls the SAME Lloyd fit in SQL (kmeansIvfSql's
    * fixture-stability caveat applies) and reproduces the rank +
    * pairwise-drop join verbatim.
    */
  private def semanticDedupQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val copies = base.filter(col("id") % 10 === 0)
      .select((col("id") + 10000000L).as("id"), col("v"))
    Similarity.semanticDedup(base.unionByName(copies),
        col("id"), col("v"), k = 8, iters = 5, tau = 0.9d)
      .select(col("id"), col("cell").cast("int").as("cell"), col("keep"))
      .orderBy(col("id"))
  }

  private val semanticDedupSql: String = {
    val k = 8; val iters = 5; val dimPlus1 = 65
    def centsCte(i: Int, from: String): String =
      s"""scomp$i AS (
         |  SELECT cell, i, avg(v[i]) AS c
         |  FROM $from CROSS JOIN (SELECT i FROM range(1, $dimPlus1) t(i))
         |  GROUP BY 1, 2
         |), scents$i AS (SELECT cell, list(c ORDER BY i) AS centroid FROM scomp$i GROUP BY 1)"""
        .stripMargin
    def d2Sql(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dimPlus1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assignCte(i: Int, cents: String): String =
      s"""sassign$i AS (
         |  SELECT id, v, cell FROM (
         |    SELECT p.id, p.v, c.cell,
         |           row_number() OVER (PARTITION BY p.id
         |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
         |    FROM pts p CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      assignCte(i, s"scents${i - 1}") + ",\n" + centsCte(i, s"sassign$i")
    }.mkString(",\n")
    def cosSql(a: String, b: String): String =
      s"""list_dot_product($a, $b)
         |           / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
    s"""WITH pts AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000000, embedding::DOUBLE[] FROM embeddings
       |  WHERE vec_id % 10 = 0
       |),
       |scents0 AS (
       |  SELECT (row_number() OVER (ORDER BY id)) - 1 AS cell, v AS centroid
       |  FROM pts QUALIFY row_number() OVER (ORDER BY id) <= $k
       |),
       |$iterCtes,
       |final_assign AS (
       |  SELECT id, v, cell FROM (
       |    SELECT p.id, p.v, c.cell,
       |           row_number() OVER (PARTITION BY p.id
       |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
       |    FROM pts p CROSS JOIN scents$iters c)
       |  WHERE rn = 1
       |), rankc AS (
       |  SELECT a.id, a.cell, a.v,
       |         ${cosSql("a.v", "c.centroid")} AS csim
       |  FROM final_assign a JOIN scents$iters c USING (cell)
       |), ord AS (
       |  SELECT id, cell, v,
       |         row_number() OVER (PARTITION BY cell ORDER BY csim DESC, id) AS rk
       |  FROM rankc
       |), dup AS (
       |  SELECT DISTINCT b.id
       |  FROM ord a JOIN ord b ON a.cell = b.cell AND a.rk < b.rk
       |  WHERE ${cosSql("a.v", "b.v")} >= 0.9
       |)
       |SELECT o.id, CAST(o.cell AS INTEGER) AS cell, (d.id IS NULL) AS keep
       |FROM ord o LEFT JOIN dup d ON o.id = d.id
       |ORDER BY o.id""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs via distributed SRP-LSH
    * (signature → band buckets → in-bucket exact cosine verify),
    * threshold 0.9. Positives are constructed power-of-2-scaled copies
    * (cosine exactly 1.0 in IEEE arithmetic, and an identical LSH bit
    * signature — recall 1 by construction — so the oracle compare is
    * exact). Natural max cosine in this data is ~0.51, so the
    * detector's hits are exactly the constructed set. The oracle SQL
    * stays all-pairs (ground truth); the Spark plan is bucket-local
    * with no driver collect. On data with threshold-grazing pairs the
    * LSH recall floor is ≥0.93 at 0.9 (nbits=192/bandsOf=12 — see
    * [[Similarity.nearDupPairs]]); [[Similarity.nearDupPairsExact]]
    * is the contract-exact quadratic mode.
    */
  private def embedNearDup(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // offset far above any plausible vec_id cardinality at bench SFs
    // (sf100 ~ 2M rows) so constructed ids can never collide with base
    val pert = base.filter(col("id") % 10 === 0)
      .select((col("id") + 10000000L).as("id"),
        transform(col("v"), x => x * 2.0d).as("v"))
    val all = base.unionByName(pert)
    Similarity.nearDupPairs(all, col("id"), col("v"), 0.9d)
      .select(col("id_a"), col("id_b"), r4(col("c")).as("cos_sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val embedNearDupSql: String =
    s"""WITH base AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000000, list_transform(embedding::DOUBLE[], x -> x * 2.0)
       |  FROM embeddings WHERE vec_id % 10 = 0
       |), p AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |         list_dot_product(a.v, b.v)
       |           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS c
       |  FROM base a JOIN base b ON a.id < b.id
       |)
       |SELECT id_a, id_b, ${r4Sql("c")} AS cos_sim
       |FROM p WHERE c >= 0.9 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------- repetition metrics
  /** Gopher-style repetition quality filters (Rae et al., "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", arXiv:2112.11446 §A1.3), adapted to word granularity —
    * the corpus is single-line, so the line-level variants are
    * degenerate here:
    *
    *  - `dup_word_frac`: fraction of word occurrences that are
    *    repeats (1 − distinct/total) — the "duplicate line fraction"
    *    analog;
    *  - `top_word_frac`: occurrences of the most frequent word over
    *    total words;
    *  - `top_bigram_char_frac`: characters covered by all occurrences
    *    of the most frequent word 2-gram over total characters — the
    *    paper's "top 2-gram character fraction".
    *
    * Ties break deterministically to the lexicographically smallest
    * gram (row_number over (count desc, gram) — identical in both
    * engines, so the compare is exact). Shape: two keyed explode→
    * count aggregations (words, 2-grams) + per-doc top-1 via
    * row_number, joined back on doc_id — every shuffle keyed by
    * doc_id, no driver actions; at 100 TB this partitions like every
    * other per-doc op.
    */
  private def repetition(s: SparkSession, d: String): DataFrame =
    repetitionOver(Tables.fanOut(Tables.documents(s, d)))

  /** Spec entry: the repetition pipeline over an arbitrary
    * (doc_id, text) frame.
    */
  private[graft] def testRepetition(s: SparkSession, docsIn: DataFrame): DataFrame =
    repetitionOver(docsIn)

  private def repetitionOver(docsIn: DataFrame): DataFrame = {
    // one tokenization kernel, checkpointed: base/wtop/gtop each
    // consumed the words() chain from the scan, so the kernel ran
    // THREE times (IncDedupProbe4: 5.6 + 2.1 + 3.4 s CPU); the
    // eager barrier makes it one pass
    val docs = docsIn
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_t"),
        TextOps.words(col("text")).as("w"))
      .localCheckpoint(true)
    val base = docs.select(col("doc_id"), col("n_chars_t"),
      size(col("w")).cast("long").as("n_words"),
      size(array_distinct(col("w"))).cast("long").as("n_distinct"))
    // rank-1-per-doc as a min_by aggregate over (-count, token), not a
    // row_number window: the partial aggregate combines map-side and
    // there is no per-partition sort for AQE to coalesce into a
    // single CPU-dense task (trap #2 of the r14 sweep; the two window
    // stages ran as 4-task/1-task jobs here)
    val wtop = docs.select(col("doc_id"), explode(col("w")).as("wrd"))
      .groupBy(col("doc_id"), col("wrd")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("wrd"), col("c")),
        struct((-col("c")).as("nc"), col("wrd"))).as("__t"))
      .select(col("doc_id"), col("__t.wrd").as("top_word"), col("__t.c").as("wc"))
    val gtop = docs.select(col("doc_id"),
        explode(TextOps.wordNgrams(col("w"), 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("gram"), col("c")),
        struct((-col("c")).as("nc"), col("gram"))).as("__t"))
      .select(col("doc_id"), col("__t.gram").as("top_bigram"), col("__t.c").as("gc"))
    base.join(wtop, Seq("doc_id"), "left").join(gtop, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        r4(lit(1.0d) - col("n_distinct") * lit(1.0d) / col("n_words")).as("dup_word_frac"),
        col("top_word"),
        r4(col("wc") * lit(1.0d) / col("n_words")).as("top_word_frac"),
        col("top_bigram"),
        r4(col("gc") * length(col("top_bigram")) * lit(1.0d) / col("n_chars_t"))
          .as("top_bigram_char_frac"))
      .orderBy(col("doc_id"))
  }

  private val repetitionSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, length(text) AS n_chars_t, ${wordsSql("text")} AS w
       |  FROM documents
       |), base AS (
       |  SELECT doc_id, n_chars_t, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
       |  FROM d
       |), wcnt AS (
       |  SELECT doc_id, wrd, count(*) AS c
       |  FROM (SELECT doc_id, unnest(w) AS wrd FROM d) GROUP BY 1, 2
       |), wtop AS (
       |  SELECT doc_id, wrd AS top_word, c AS wc FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, wrd) AS rn
       |    FROM wcnt) WHERE rn = 1
       |), g AS (
       |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
       |    THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS gram FROM d
       |), gcnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
       |gtop AS (
       |  SELECT doc_id, gram AS top_bigram, c AS gc FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
       |    FROM gcnt) WHERE rn = 1
       |)
       |SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
       |       ${r4Sql("1.0 - b.n_distinct * 1.0 / b.n_words")} AS dup_word_frac,
       |       w.top_word,
       |       ${r4Sql("w.wc * 1.0 / b.n_words")} AS top_word_frac,
       |       g.top_bigram,
       |       ${r4Sql("g.gc * length(g.top_bigram) * 1.0 / b.n_chars_t")} AS top_bigram_char_frac
       |FROM base b
       |LEFT JOIN wtop w USING (doc_id)
       |LEFT JOIN gtop g USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin

  // -------------------------------------- line-level repetition
  /** Line-granularity Gopher repetition metrics (Rae et al.,
    * arXiv:2112.11446 §A1.3) — the real "duplicate line fraction" and
    * "duplicate line character fraction", beside [[repetition]]'s
    * word-level analogs. The bench corpus is single-line, so the
    * query first assembles newline-bearing "pages": `page =
    * doc_id div 10`, page text = the page's lowest-doc_id text (a
    * repeated boilerplate-header stand-in) + '\n' + all member texts
    * joined by '\n' in doc_id order. Every page therefore carries at
    * least one genuinely duplicated line, plus whatever exact-dup
    * texts the corpus itself contributes.
    *
    * Metrics per page, over `lines = split(page_text, '\n')`:
    *  - `dup_line_frac`: 1 − distinct/total line occurrences;
    *  - `dup_line_char_frac`: characters in excess occurrences of
    *    repeated lines over total characters — Σ(c−1)·len / Σc·len.
    *
    * Scale shape: page assembly is one doc_id-keyed groupBy whose
    * collect_list is bounded by page size (10 docs) — on a real
    * multi-line corpus the assembly disappears and the metric is just
    * explode + two page-keyed aggregations, partitioning like every
    * other per-doc op.
    */
  private def repetitionLines(s: SparkSession, d: String): DataFrame =
    repetitionLinesOver(
      Tables.documents(s, d).withColumn("page", expr("doc_id div 10")))

  /** Spec entry: line metrics over an arbitrary (page, text) frame —
    * each row's `text` may itself contain newlines; rows of a page
    * are joined in `doc_id` order under a repeated header line.
    */
  private[graft] def testRepetitionLines(s: SparkSession, docsIn: DataFrame): DataFrame =
    repetitionLinesOver(docsIn)

  private def repetitionLinesOver(docsIn: DataFrame): DataFrame = {
    val pages = docsIn
      .groupBy(col("page"))
      .agg(concat(
        min_by(col("text"), col("doc_id")), lit("\n"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          "\n")).as("page_text"))
    val cnt = pages
      .select(col("page"), explode(split(col("page_text"), "\n")).as("line"))
      .groupBy(col("page"), col("line")).agg(count(lit(1)).as("c"))
      .withColumn("len", length(col("line")).cast("long"))
    cnt.groupBy(col("page"))
      .agg(
        sum(col("c")).as("n_lines"),
        count(lit(1)).as("n_distinct"),
        sum((col("c") - 1L) * col("len")).as("dup_chars"),
        sum(col("c") * col("len")).as("tot_chars"))
      .select(col("page"), col("n_lines"),
        r4(lit(1.0d) - col("n_distinct") * lit(1.0d) / col("n_lines")).as("dup_line_frac"),
        r4(col("dup_chars") * lit(1.0d) / col("tot_chars")).as("dup_line_char_frac"))
      .orderBy(col("page"))
  }

  private val repetitionLinesSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, text, doc_id // 10 AS page FROM documents
       |), pg AS (
       |  SELECT page,
       |         arg_min(text, doc_id) || chr(10) ||
       |           string_agg(text, chr(10) ORDER BY doc_id) AS page_text
       |  FROM b GROUP BY page
       |), ln AS (
       |  SELECT page, unnest(string_split(page_text, chr(10))) AS line FROM pg
       |), cnt AS (
       |  SELECT page, line, count(*) AS c, length(line) AS len
       |  FROM ln GROUP BY 1, 2
       |)
       |SELECT page, CAST(sum(c) AS BIGINT) AS n_lines,
       |       ${r4Sql("1.0 - count(*) * 1.0 / sum(c)")} AS dup_line_frac,
       |       ${r4Sql("sum((c - 1) * len) * 1.0 / sum(c * len)")} AS dup_line_char_frac
       |FROM cnt GROUP BY page ORDER BY page""".stripMargin

  // ------------------------------------------ boilerplate line scrub
  /** Cross-corpus frequent-line removal ([[Dedup.scrubFrequentLines]];
    * CCNet/RefinedWeb-style boilerplate scrub). The single-line corpus
    * gets a line structure the way a crawler output would have one:
    * each doc's lines are its 6-word chunks ([[TextOps.tokenChunks]],
    * stride=win), plus two injected boilerplate lines — a global
    * footer and a per-`source` copyright line — standing in for the
    * nav/banner text every page of a site shares. With minDocs=10 the
    * global footer (df=all docs) and the per-source footers (df≈docs
    * per source) are scrubbed while genuine content chunks (df≈1)
    * survive — the oracle certifies clean_text, kept and dropped
    * counts per doc exactly.
    */
  private def lineScrub(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val withLines = docs.select(col("doc_id"),
      concat(
        transform(TextOps.tokenChunks(TextOps.words(col("text")), 6, 6),
          c => c.getField("txt")),
        array(lit("subscribe to our newsletter"),
          concat(lit("copyright "), col("source")))).as("lines"))
    Dedup.scrubFrequentLines(withLines, col("doc_id"), col("lines"), minDocs = 10L)
      .orderBy(col("doc_id"))
  }

  private val lineScrubSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, ${wordsSql("text")} AS w FROM documents
       |), l AS (
       |  SELECT doc_id,
       |         list_concat(
       |           list_transform(range(0, CAST(ceil(len(w) / 6.0) AS INT)),
       |             i -> array_to_string(w[i*6+1 : i*6+6], ' ')),
       |           ['subscribe to our newsletter', 'copyright ' || source]) AS lines
       |  FROM d
       |), ex AS (
       |  SELECT doc_id, unnest(lines) AS line,
       |         unnest(range(1, len(lines) + 1)) AS pos FROM l
       |), f AS (
       |  SELECT line, count(DISTINCT doc_id) AS df FROM ex GROUP BY 1
       |)
       |SELECT e.doc_id,
       |       coalesce(string_agg(CASE WHEN f.df < 10 THEN e.line END,
       |                           chr(10) ORDER BY e.pos), '') AS clean_text,
       |       CAST(count(CASE WHEN f.df < 10 THEN 1 END) AS BIGINT) AS n_kept,
       |       CAST(count(CASE WHEN f.df >= 10 THEN 1 END) AS BIGINT) AS n_dropped
       |FROM ex e JOIN f USING (line)
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  // ------------------------------------------------ corpus profiling
  /** Corpus profiling summary — the data-audit pass before any
    * training run: per language, document count and exact
    * length-distribution quantiles (PERCENTILE_CONT interpolation in
    * both engines, so the compare is exact after r4). All map-side
    * until ONE lang-keyed aggregation; at 100 TB exact per-group
    * percentiles over billions of rows would switch to
    * `percentile_approx` (documented trade: ±ε error for mergeable
    * sketch state) — the group cardinality (languages) stays tiny
    * either way.
    */
  private def profile(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("lang"),
      size(TextOps.words(col("text"))).cast("long").as("n_words"),
      col("n_chars"))
    docs.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        r4(avg(col("n_words"))).as("avg_words"),
        r4(percentile(col("n_words"), lit(0.25))).as("p25_words"),
        r4(percentile(col("n_words"), lit(0.5))).as("p50_words"),
        r4(percentile(col("n_words"), lit(0.75))).as("p75_words"),
        r4(percentile(col("n_chars"), lit(0.5))).as("p50_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))
  }

  private val profileSql: String =
    s"""WITH d AS (
       |  SELECT lang, len(${wordsSql("text")}) AS n_words, n_chars FROM documents
       |)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       ${r4Sql("avg(n_words)")} AS avg_words,
       |       ${r4Sql("quantile_cont(n_words, 0.25)")} AS p25_words,
       |       ${r4Sql("quantile_cont(n_words, 0.5)")} AS p50_words,
       |       ${r4Sql("quantile_cont(n_words, 0.75)")} AS p75_words,
       |       ${r4Sql("quantile_cont(n_chars, 0.5)")} AS p50_chars,
       |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------ stratified hash-sample
  /** Per-domain quota cap ([[Sampling.capPerGroup]]) — the C4/
    * RefinedWeb "≤ k documents per domain" step, k=10 per `source`
    * with priority md5(doc_id): survivors are a reproducible uniform
    * draw per domain, not an ingestion-order artifact. Catalyst's
    * rank-limit pushdown gives the plan a map-side Partial
    * WindowGroupLimit below the exchange (PlanShapeSpec), so a
    * mega-domain's reducer receives k·partitions pre-trimmed rows,
    * never the domain's cardinality.
    */
  private def domainCap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    Sampling.capPerGroup(docs, col("source"),
        md5(col("doc_id").cast("string")), col("doc_id"), k = 10)
      .select(col("doc_id"), col("source"))
      .orderBy(col("source"), col("doc_id"))
  }

  private val domainCapSql: String =
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin

  /** Deterministic stratified sampling ([[Sampling.hashSample]]):
    * downsample en to 0.5 and de/es/fr to 0.75, keep zh whole — the
    * corpus-mixing move every training run makes. The output pins the
    * EXACT kept set per stratum (count + id-sum + min/max witness),
    * not just its size, so the oracle certifies that both engines
    * select identical rows — the property that makes hash-sampling
    * safe for reproducible pipelines, and the one `rand()` sampling
    * cannot give. Pure map-side filter + one keyed aggregation; at
    * 100 TB the filter folds into the scan.
    */
  private def hashSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val kept = Sampling.hashSample(docs, col("doc_id"), col("lang"),
        rates = Map("en" -> 0.5d, "de" -> 0.75d, "es" -> 0.75d, "fr" -> 0.75d))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        r4(coalesce(col("n_kept"), lit(0L)) * lit(1.0d) / col("n_total"))
          .as("kept_frac"),
        col("id_sum"), col("min_id"), col("max_id"))
      .orderBy(col("lang"))
  }

  private val hashSampleSql: String =
    s"""WITH th AS (
       |  SELECT doc_id, lang,
       |         CASE lang WHEN 'en' THEN '80000000'
       |                   WHEN 'de' THEN 'c0000000'
       |                   WHEN 'es' THEN 'c0000000'
       |                   WHEN 'fr' THEN 'c0000000'
       |                   ELSE 'g' END AS t
       |  FROM documents
       |), kept AS (
       |  SELECT lang, count(*) AS n_kept,
       |         CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |         min(doc_id) AS min_id, max(doc_id) AS max_id
       |  FROM th
       |  WHERE substr(md5('graft|' || lang || '|' || doc_id), 1, 8) < t
       |  GROUP BY 1
       |), tot AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1)
       |SELECT tot.lang, tot.n_total, coalesce(kept.n_kept, 0) AS n_kept,
       |       ${r4Sql("coalesce(kept.n_kept, 0) * 1.0 / tot.n_total")} AS kept_frac,
       |       kept.id_sum, kept.min_id, kept.max_id
       |FROM tot LEFT JOIN kept USING (lang)
       |ORDER BY tot.lang""".stripMargin

  // ------------------------------------------ verbatim span dedup
  /** Exact-substring dedup ([[Dedup.sharedSpanPairs]]): document
    * pairs sharing a VERBATIM 10-token span, joined on the span text
    * itself (no hashing — candidates are their own verification),
    * with document-frequency pruning [2, 32] so boilerplate spans
    * cannot go quadratic. The complement of the minhash family: that
    * estimates whole-document overlap, this finds exact copied
    * passages however different the rest of the documents are.
    */
  private def spanDedupQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d)).filter(col("text").isNotNull)
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(
        TextOps.wordNgrams(TextOps.words(col("text")), 10))).as("g"))
    // array_distinct above already makes (doc_id, g) unique
    Dedup.sharedSpanPairs(grams, col("doc_id"), col("g"), assumeDistinct = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val spanDedupSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |  WHERE text IS NOT NULL
       |), g AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(ws) >= 10
       |         THEN list_transform(range(1, len(ws)-8), i -> array_to_string(ws[i:i+9], ' '))
       |         ELSE CAST([] AS VARCHAR[]) END)) AS g
       |  FROM w
       |), df AS (
       |  SELECT g FROM g GROUP BY g HAVING count(*) BETWEEN 2 AND 32
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       count(*) AS n_shared, min(a.g) AS span
       |FROM g a JOIN df USING (g) JOIN g b USING (g)
       |WHERE a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** [[Dedup.containmentPairs]] — excerpt/quote detection by the
    * asymmetric containment coefficient, where symmetric Jaccard
    * structurally fails: every 10th document (≥ 15 words)
    * contributes an EXCERPT — its middle third by words, under
    * doc_id + 3,000,000 — whose 5-gram set is a strict subset of its
    * source's, so C(excerpt ⊆ source) = 1.0 exactly while their
    * Jaccard is only ≈ 1/3 (far under any dedup threshold). The 0.8
    * cut is an integer cross-multiplication; boilerplate (df > 32)
    * is excluded from numerator AND denominator while df-1 grams
    * stay in the denominator — unique content argues against
    * containment, so a source never scores as contained in its own
    * excerpt. The
    * oracle rebuilds the excerpts (word-slice → join → re-split is
    * exact) and replays the digest-keyed posting join verbatim.
    */
  private def containmentQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val exc = docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .filter(col("doc_id") % 10 === 0 && size(col("ws")) >= 15)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        expr("array_join(slice(ws, size(ws) div 3 + 1, size(ws) div 3), ' ')")
          .as("text"))
    val uni = docs.unionByName(exc)
    val grams = uni.select(col("doc_id"),
      explode(array_distinct(
        TextOps.wordNgrams(TextOps.words(col("text")), 5))).as("g"))
    Dedup.containmentPairs(grams, col("doc_id"), col("g"), assumeDistinct = true)
      .select(col("id_a"), col("id_b"), col("n_a"), col("shared"),
        r4(col("containment")).as("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val containmentSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |), exw AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM base
       |  WHERE doc_id % 10 = 0
       |), exc AS (
       |  SELECT doc_id + 3000000 AS doc_id,
       |         array_to_string(ws[(len(ws) // 3 + 1):(len(ws) // 3 + len(ws) // 3)], ' ') AS text
       |  FROM exw WHERE len(ws) >= 15
       |), uni AS (
       |  SELECT doc_id, text FROM base UNION ALL SELECT doc_id, text FROM exc
       |), w AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM uni
       |), g AS (
       |  SELECT DISTINCT doc_id, md5(unnest(
       |    CASE WHEN len(ws) >= 5
       |         THEN list_transform(range(1, len(ws) - 3), i -> array_to_string(ws[i:i+4], ' '))
       |         ELSE CAST([] AS VARCHAR[]) END)) AS dd
       |  FROM w
       |), dfs AS (
       |  SELECT dd, count(*) AS df FROM g GROUP BY dd
       |), informative AS (
       |  SELECT doc_id, dd, df FROM g JOIN dfs USING (dd) WHERE df <= 32
       |), na AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_a
       |  FROM informative GROUP BY 1
       |), pruned AS (
       |  SELECT doc_id, dd FROM informative WHERE df >= 2
       |), pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(count(*) AS BIGINT) AS shared
       |  FROM pruned a JOIN pruned b USING (dd)
       |  WHERE a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b, n_a, shared,
       |       ${r4Sql("CAST(shared AS DOUBLE) / CAST(n_a AS DOUBLE)")} AS containment
       |FROM pairs JOIN na ON na.doc_id = pairs.id_a
       |WHERE shared * 100 >= 80 * n_a
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------- quantile filtering
  /** Adaptive quality filtering ([[Sampling.dropBottomQuantile]]):
    * drop each language's worst quarter by quality score — the cutoff
    * is an exact per-group order statistic derived from the data, not
    * a fixed threshold. The Spark side runs the histogram + boundary-
    * tie construction (no giant per-group sort window); the oracle
    * states the same semantics as a plain `percent_rank` window —
    * identical kept sets certify the construction. All score
    * arithmetic is pinned to DOUBLE on both sides so ordering and
    * ties agree bit-for-bit; rounding only at output.
    */
  private def qualityFilterQ(s: SparkSession, d: String): DataFrame = {
    val w = TextOps.words(col("text"))
    val stop = TextOps.langStopwords.head._2
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        when(size(w) > 0,
          lit(1.0d) / (lit(1.0d) +
            TextOps.stopwordHits(w, stop).cast("double") / size(w).cast("double")))
          .otherwise(lit(0.0d)).as("q"))
    // Score ONCE: dropBottomQuantile references its input three times
    // (histogram, keep-outright, tie branch), which would re-run the
    // tokenize+stopword scoring pass per reference. The checkpointed
    // frame is the narrow (doc_id, lang, q) projection — at 100 TB
    // the same move is writing the scored projection to a table
    // before filtering (score-once/filter-many).
    Sampling.dropBottomQuantile(scored.localCheckpoint(false),
        "lang", "q", "doc_id", 1L, 4L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), r4(min(col("q"))).as("min_q"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))
  }

  private val qualityFilterSql: String = {
    val set = TextOps.langStopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, lang, ${wordsSql("text")} AS w FROM documents
       |), s AS (
       |  SELECT doc_id, lang,
       |         CASE WHEN len(w) > 0
       |              THEN CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
       |                   + CAST(len(list_filter(w, x -> x IN ($set))) AS DOUBLE)
       |                     / CAST(len(w) AS DOUBLE))
       |              ELSE CAST(0.0 AS DOUBLE) END AS q
       |  FROM w
       |), p AS (
       |  SELECT doc_id, lang, q,
       |         percent_rank() OVER (PARTITION BY lang ORDER BY q, doc_id) AS pr
       |  FROM s
       |)
       |SELECT lang, count(*) AS n_kept, ${r4Sql("min(q)")} AS min_q,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM p WHERE pr >= 0.25
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------- mixture sampling
  /** Token-budget mixture sampling ([[Sampling.mixToBudget]]): mix
    * the 20 sources toward target shares of an 8k-token budget —
    * src0/src1 at heavy shares (high keep-rates), src4/src5 light,
    * src8's share exceeds its weight (kept whole, the 'g' sentinel
    * branch), everything else at a small default. The output pins the
    * exact kept set per source (count + kept-token sum + id-sum
    * witness): the admission threshold is DERIVED FROM THE DATA (one
    * totals aggregation), so the hash compare certifies that both
    * engines compute identical per-group rates AND admit identical
    * rows — the reproducibility contract a training-run mixing pass
    * needs. One shuffle + broadcast-joined map filter.
    */
  private def mixSources(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        TextOps.alnumTokenCount(col("text")).cast("long").as("toks"))
    Sampling.mixToBudget(docs, col("doc_id"), col("source"), col("toks"),
        shares = Map("src0" -> 0.15d, "src1" -> 0.15d, "src4" -> 0.05d,
          "src5" -> 0.05d, "src8" -> 0.5d),
        budget = 8000.0d, defaultShare = 0.01d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("toks")).as("tok_kept"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"))
  }

  private val mixSourcesSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |         len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS toks
       |  FROM documents
       |), tot AS (
       |  SELECT source, CAST(SUM(toks) AS DOUBLE) AS gw FROM w GROUP BY 1
       |), sh AS (
       |  SELECT w.doc_id, w.source, w.toks,
       |         CAST(CASE w.source WHEN 'src0' THEN 0.15 WHEN 'src1' THEN 0.15
       |                            WHEN 'src4' THEN 0.05 WHEN 'src5' THEN 0.05
       |                            WHEN 'src8' THEN 0.5 ELSE 0.01 END AS DOUBLE)
       |           * 8000.0 / tot.gw AS r
       |  FROM w JOIN tot USING (source)
       |), th AS (
       |  SELECT doc_id, source, toks,
       |         CASE WHEN r >= 1.0 THEN 'g'
       |              ELSE printf('%08x', CAST(FLOOR(r * 4294967296.0) AS BIGINT)) END AS t
       |  FROM sh
       |)
       |SELECT source, count(*) AS n_kept,
       |       CAST(sum(toks) AS BIGINT) AS tok_kept,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM th
       |WHERE substr(md5('graft|' || source || '|' || doc_id), 1, 8) < t
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------ context-window chunking
  /** Token chunking ([[TextOps.tokenChunks]], 32-token windows every
    * 24 tokens = 8 overlap): one row per chunk with its token count
    * and an md5 content witness, so the oracle pins exact chunk
    * boundaries AND contents in both engines. The explode emits only
    * chunk rows (~n/stride per doc), not per-token rows.
    */
  private def chunk(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
    docs.select(col("doc_id"), explode(TextOps.tokenChunks(col("w"), 32, 24)).as("c"))
      .select(col("doc_id"), col("c.idx").cast("long").as("chunk_idx"),
        col("c.n_tok").cast("long").as("n_tok"), md5(col("c.txt")).as("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val chunkSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${wordsSql("text")} AS w FROM documents
       |), x AS (
       |  SELECT doc_id, w,
       |         unnest(range(0, CAST(ceil(len(w) * 1.0 / 24) AS BIGINT))) AS i
       |  FROM d WHERE len(w) > 0
       |)
       |SELECT doc_id, i AS chunk_idx,
       |       least(32, len(w) - i * 24) AS n_tok,
       |       md5(array_to_string(w[(i*24+1)::INT:(i*24+32)::INT], ' ')) AS fp
       |FROM x ORDER BY 1, 2""".stripMargin

  // -------------------------------------------- decontamination
  /** Benchmark decontamination (the overlap scrub every training run
    * does — Brown et al., "Language Models are Few-Shot Learners",
    * arXiv:2005.14165 Appendix C: flag training docs sharing any
    * long n-gram with an evaluation set). Benchmark slice =
    * `doc_id % 97 == 0`; the training corpus is everything else PLUS
    * constructed contaminated copies of the benchmark docs
    * (id + 200000, last 3 words dropped) so the detector has
    * guaranteed positives. A training doc is flagged with its count
    * of distinct shared word-8-grams.
    *
    * Scale shape: the benchmark gram set is eval-suite-sized —
    * broadcast it; the training side streams through one explode +
    * broadcast-hash semi-join + keyed count, so a 100 TB corpus
    * never shuffles its grams.
    */
  private def decontaminate(s: SparkSession, d: String): DataFrame =
    decontaminateOver(Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("w")))

  /** Spec entry: the decontamination pipeline over an arbitrary
    * (doc_id, w) frame.
    */
  private[graft] def testDecontaminate(docs: DataFrame): DataFrame =
    decontaminateOver(docs)

  private def decontaminateOver(docs: DataFrame): DataFrame = {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
      .unionByName(bench.select((col("doc_id") + 200000L).as("doc_id"),
        slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w")))
    val bg = bench
      .select(explode(array_distinct(TextOps.wordNgrams(col("w"), 8))).as("g"))
      .distinct()
    train
      .select(col("doc_id"), explode(array_distinct(TextOps.wordNgrams(col("w"), 8))).as("g"))
      .join(broadcast(bg), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  private val decontaminateSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${wordsSql("text")} AS w FROM documents
       |), bench AS (SELECT doc_id, w FROM d WHERE doc_id % 97 = 0),
       |train AS (
       |  SELECT doc_id, w FROM d WHERE doc_id % 97 <> 0
       |  UNION ALL
       |  SELECT doc_id + 200000, w[1:greatest(len(w)-3, 0)] FROM bench
       |), gr AS (
       |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 8
       |    THEN list_transform(range(1, len(w)-6), i -> array_to_string(w[i:i+7], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END)) AS g
       |  FROM train
       |), bg AS (
       |  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(w) >= 8
       |    THEN list_transform(range(1, len(w)-6), i -> array_to_string(w[i:i+7], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END)) AS g
       |  FROM bench
       |)
       |SELECT gr.doc_id, count(*) AS n_shared
       |FROM gr JOIN bg USING (g)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------- star-contraction components
  /** [[Dedup.componentsStar]] on its worst-case-for-propagation input:
    * a deterministic chain graph over `vec_id` (edge i→i+1 except at
    * 50-boundaries → 50-node paths). Min-label propagation
    * ([[Dedup.components]], `llm_dedup_clusters`) needs diameter ≈ 49
    * full-shuffle rounds here; large-star/small-star contraction
    * converges in O(log²) rounds — this query pins the long-chain
    * fallback's exactness against a transitive-closure oracle
    * (recursive CTE; labels only ever flow from smaller ids, so the
    * forward-edge closure reaches exactly the component minimum).
    */
  private def componentsChain(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.embeddings(s, d).select(col("vec_id"))
    val edges = ids.filter(col("vec_id") % 50 =!= 49)
      .select(col("vec_id").as("src"), (col("vec_id") + 1L).as("dst"))
      .join(ids.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
    Dedup.componentsStar(edges, col("src"), col("dst"))
      .orderBy(col("id"))
  }

  private val componentsChainSql: String =
    """WITH RECURSIVE fwd AS (
      |  SELECT e.vec_id AS s, e.vec_id + 1 AS d
      |  FROM embeddings e JOIN embeddings n ON n.vec_id = e.vec_id + 1
      |  WHERE e.vec_id % 50 <> 49
      |), reach(id, lbl) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT f.d, r.lbl FROM reach r JOIN fwd f ON f.s = r.id
      |), nodes AS (
      |  SELECT DISTINCT id FROM (SELECT s AS id FROM fwd UNION ALL SELECT d FROM fwd)
      |)
      |SELECT r.id, CAST(min(r.lbl) AS BIGINT) AS label
      |FROM reach r JOIN nodes n ON n.id = r.id
      |GROUP BY r.id ORDER BY r.id""".stripMargin

  // ------------------------------------------------------ PII scrub
  /** [[TextOps.scrubPii]] over documents with deterministic synthetic
    * PII appended (derived from doc_id in BOTH engines — the corpus
    * itself is synthetic prose, so the fixture guarantees every row
    * exercises all three redactions). Checked output: per-doc match
    * counts (pre-scrub), the scrubbed text's md5 and length. Counts
    * use the literally-same patterns via Spark `regexp_count` ↔
    * DuckDB `len(regexp_extract_all)`.
    */
  private def piiScrub(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.fanOut(Tables.documents(s, d)).select(col("doc_id"),
      concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com from 10."), (col("doc_id") % 250).cast("string"),
        lit(".0.7 or call +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" now.")).as("t"))
    aug
      // Generate barrier: scrubPii is 3 chained regexp_replace passes
      // and two consumers (md5, length) — CollapseProject would
      // re-inline it per consumer without the explode
      .select(col("doc_id"), col("t"),
        explode(array(TextOps.scrubPii(col("t")))).as("st"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(TextOps.emailRe)).cast("bigint").as("n_email"),
        regexp_count(col("t"), lit(TextOps.ipv4Re)).cast("bigint").as("n_ip"),
        regexp_count(col("t"), lit(TextOps.phoneRe)).cast("bigint").as("n_phone"),
        md5(col("st")).as("scrub_md5"),
        length(col("st")).cast("bigint").as("scrub_len"))
      .orderBy(col("doc_id"))
  }

  private val piiScrubSql: String = {
    // shared regexes dropped into single-quoted SQL literals verbatim
    // (DuckDB standard strings don't process backslash escapes, and
    // none of the patterns contain a quote)
    val em = TextOps.emailRe
    val ip = TextOps.ipv4Re
    val ph = TextOps.phoneRe
    s"""WITH aug AS (
       |  SELECT doc_id,
       |         text || ' Contact user' || CAST(doc_id AS VARCHAR)
       |              || '@mail.example.com from 10.' || CAST(doc_id % 250 AS VARCHAR)
       |              || '.0.7 or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |              || ' now.' AS t
       |  FROM documents
       |), scrubbed AS (
       |  SELECT doc_id, t,
       |         regexp_replace(regexp_replace(regexp_replace(t,
       |           '$em', '<EMAIL>', 'g'),
       |           '$ip', '<IP>', 'g'),
       |           '$ph', '<PHONE>', 'g') AS st
       |  FROM aug
       |)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_email,
       |       CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ip,
       |       CAST(len(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phone,
       |       md5(st) AS scrub_md5,
       |       CAST(length(st) AS BIGINT) AS scrub_len
       |FROM scrubbed ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- unicode normalization
  /** [[graft.functions.NfcNormalize]] (native expression, JDK
    * Normalizer) against DuckDB's utf8proc `nfc_normalize` — both
    * implement Unicode canonical composition, so lengths and digests
    * must agree byte-for-byte. Decomposed sequences (A+U+030A,
    * e+U+0301, A+U+0301) are appended deterministically in both
    * engines since the corpus itself is ASCII-clean.
    */
  private def unicodeNorm(s: SparkSession, d: String): DataFrame = {
    import graft.functions.NfcNormalize.nfc
    val aug = Tables.documents(s, d).select(col("doc_id"),
      // the literal is DECOMPOSED (A+U+030A, e+U+0301, A+U+0301) —
      // len_raw must count the combining marks; NFC composes them
      concat(col("text"),
        lit(" nfc Å café Á end")).as("t"))
    aug.select(col("doc_id"),
        length(col("t")).cast("bigint").as("len_raw"),
        length(nfc(col("t"))).cast("bigint").as("len_nfc"),
        md5(nfc(col("t"))).as("nfc_md5"))
      .orderBy(col("doc_id"))
  }

  private val unicodeNormSql: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |         text || ' nfc A' || chr(778) || ' cafe' || chr(769)
      |              || ' A' || chr(769) || ' end' AS t
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(length(t) AS BIGINT) AS len_raw,
      |       CAST(length(nfc_normalize(t)) AS BIGINT) AS len_nfc,
      |       md5(nfc_normalize(t)) AS nfc_md5
      |FROM aug ORDER BY doc_id""".stripMargin

  // ----------------------------------------- bigram LM quality score
  /** [[NgramLm]] char-bigram quality scoring trained and scored on the
    * corpus itself (CCNet-style perplexity filter). Hash-comparable
    * because the score is an integer sum of micro-nat-quantized
    * log-probs — float summation order can't leak in; `ln` on the
    * identical exact rational is bit-equal across engines (the same
    * contract ts_geomean already pins for LN/EXP).
    */
  private def lmScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("text"))
    // bg feeds the model pass and the scoring join but is NOT
    // checkpointed: A/B at sf0.1 showed materializing the exploded
    // frame (one row per character) costs more than re-running the
    // codegen'd explode (1.72 s plain vs 2.21 s checkpointed) — the
    // opposite trade from llm_tfidf, whose post-aggregation tf frame
    // is small. Checkpoint AFTER aggregation, not before.
    val bg = NgramLm.bigrams(docs, col("doc_id"), col("text"))
    // r17: EAGER checkpoint of the vocab-bounded model aggregate —
    // NgramLm.score broadcasts model, prefix AND vocab, and each
    // broadcast build is its own future job whose subtree re-ran the
    // bigram explode kernel (QProfile r17 on the ccnet twin: three
    // concurrent kernel-class broadcast builds, 8.3+5.5+3.3 s CPU for
    // one 8.3 s kernel). With m materialized the prefix/vocab builds
    // are tiny aggregates over ≤|charset|² rows; eager (not lazy)
    // because three concurrent broadcast futures racing a lazy
    // checkpoint is exactly the docsig race class.
    val m = NgramLm.model(bg).localCheckpoint(true)
    val p = NgramLm.prefixCounts(m)
    NgramLm.score(bg, m, p)
      .select(col("id").as("doc_id"), col("n_bigrams"), col("q_sum"),
        r4(col("q_sum").cast("double") / col("n_bigrams").cast("double") / 1e6)
          .as("avg_logp"))
      .orderBy(col("doc_id"))
  }

  private val lmScoreSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text AS t FROM documents WHERE length(text) >= 2
       |), bg AS (
       |  SELECT doc_id, substr(t, CAST(i AS INTEGER), 2) AS g
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS i
       |        FROM docs)
       |), model AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS cg FROM bg GROUP BY g
       |), prefix AS (
       |  SELECT substr(g, 1, 1) AS c1, CAST(SUM(cg) AS BIGINT) AS cp
       |  FROM model GROUP BY 1
       |), vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM prefix),
       |scored AS (
       |  SELECT b.doc_id,
       |         CAST(floor(ln(CAST(coalesce(m.cg, 0) + 1 AS DOUBLE)
       |                       / CAST(coalesce(p.cp, 0) + vocab.v AS DOUBLE)) * 1000000) AS BIGINT) AS q
       |  FROM bg b
       |  LEFT JOIN model m ON b.g = m.g
       |  LEFT JOIN prefix p ON substr(b.g, 1, 1) = p.c1
       |  CROSS JOIN vocab
       |)
       |SELECT doc_id, count(*) AS n_bigrams,
       |       CAST(SUM(q) AS BIGINT) AS q_sum,
       |       ${r4Sql("CAST(SUM(q) AS BIGINT) / CAST(count(*) AS DOUBLE) / 1000000")} AS avg_logp
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------- CCNet perplexity bucketing
  /** The CCNet head/middle/tail split (Wenzek et al., LREC 2020 §3.3):
    * each language partitioned into perplexity thirds by the bigram-LM
    * score — the labeling step that lets a pipeline train on "head",
    * hold out "middle", and drop "tail" per language instead of using
    * one global threshold. Composes `llm_lm_score`'s integer micro-nat
    * scoring into [[Sampling.quantileBuckets]] (histogram-cumulative
    * cutoffs — no corpus-sized sort window; integer cross-multiplied
    * boundaries). Bucket 1 = lowest avg log-prob = highest perplexity
    * = CCNet's "tail". `id_sum` pins exact per-bucket membership, not
    * just counts.
    */
  private def ccnetBuckets(s: SparkSession, d: String): DataFrame = {
    val docsFull = Tables.fanOut(Tables.documents(s, d))
    val docs = docsFull.select(col("doc_id"), col("text"))
    val bg = NgramLm.bigrams(docs, col("doc_id"), col("text"))
    // r17: eager model checkpoint — see lmScore. Interleaved A/B
    // (NgramAbProbe, 7 rounds): 4.22 -> 3.15 s here, 3.39 -> 3.23 on
    // llm_lm_score, and one bigram kernel execution instead of three.
    val m = NgramLm.model(bg).localCheckpoint(true)
    val p = NgramLm.prefixCounts(m)
    val scored = NgramLm.score(bg, m, p)
      .select(col("id").as("doc_id"),
        floor(col("q_sum").cast("double") / col("n_bigrams").cast("double"))
          .cast("long").as("score_micro"))
    // checkpoint the narrow (doc_id, lang, score_micro) frame:
    // quantileBuckets consumes its input twice (cutoff histogram +
    // bucket join) and each consumption otherwise re-runs the whole
    // bigram scoring kernel (RecomputeScan r16: twin 15-18 s-CPU
    // jobs; with the barrier the kernel is single-pass)
    val withLang = scored
      .join(docsFull.select(col("doc_id"), col("lang")), "doc_id")
      .localCheckpoint(false)
    Sampling.quantileBuckets(withLang, "lang", "score_micro", 3)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        r4(sum(col("score_micro")).cast("double")
          / count(lit(1)).cast("double") / 1e6).as("avg_logp"))
      .orderBy(col("lang"), col("bucket"))
  }

  private val ccnetBucketsSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang, text AS t FROM documents WHERE length(text) >= 2
       |), bg AS (
       |  SELECT doc_id, substr(t, CAST(i AS INTEGER), 2) AS g
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS i
       |        FROM docs)
       |), model AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS cg FROM bg GROUP BY g
       |), prefix AS (
       |  SELECT substr(g, 1, 1) AS c1, CAST(SUM(cg) AS BIGINT) AS cp
       |  FROM model GROUP BY 1
       |), vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM prefix),
       |qscored AS (
       |  SELECT b.doc_id,
       |         CAST(floor(ln(CAST(coalesce(m.cg, 0) + 1 AS DOUBLE)
       |                       / CAST(coalesce(p.cp, 0) + vocab.v AS DOUBLE)) * 1000000) AS BIGINT) AS q
       |  FROM bg b
       |  LEFT JOIN model m ON b.g = m.g
       |  LEFT JOIN prefix p ON substr(b.g, 1, 1) = p.c1
       |  CROSS JOIN vocab
       |), perdoc AS (
       |  SELECT doc_id,
       |         CAST(floor(CAST(SUM(q) AS DOUBLE) / count(*)) AS BIGINT) AS score_micro
       |  FROM qscored GROUP BY doc_id
       |), sl AS (
       |  SELECT p.doc_id, d.lang, p.score_micro
       |  FROM perdoc p JOIN docs d USING (doc_id)
       |), hist AS (
       |  SELECT lang, score_micro, count(*) AS c FROM sl GROUP BY 1, 2
       |), cum AS (
       |  SELECT lang, score_micro,
       |         sum(c) OVER (PARTITION BY lang ORDER BY score_micro) AS cum,
       |         sum(c) OVER (PARTITION BY lang) AS n
       |  FROM hist
       |), cuts AS (
       |  SELECT lang,
       |         min(CASE WHEN cum * 3 >= n * 1 THEN score_micro END) AS cut1,
       |         min(CASE WHEN cum * 3 >= n * 2 THEN score_micro END) AS cut2
       |  FROM cum GROUP BY 1
       |), bucketed AS (
       |  SELECT s.lang, s.doc_id, s.score_micro,
       |         1 + (CASE WHEN s.score_micro > c.cut1 THEN 1 ELSE 0 END)
       |           + (CASE WHEN s.score_micro > c.cut2 THEN 1 ELSE 0 END) AS bucket
       |  FROM sl s JOIN cuts c USING (lang)
       |)
       |SELECT lang, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       ${r4Sql("CAST(sum(score_micro) AS BIGINT) / CAST(count(*) AS DOUBLE) / 1000000")} AS avg_logp
       |FROM bucketed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- TF-IDF
  /** [[TfIdf]] top-3 terms per document. Integer tf · micro-nat-
    * quantized idf keeps scores and the rank order engine-exact
    * (ties break on the term string, which both engines collate
    * identically for ASCII).
    */
  private def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    // the (doc, term, tf) frame feeds THREE consumers (df, N, the
    // scoring join); a lazy localCheckpoint caches the corpus pass on
    // first use instead of re-exploding the corpus per consumer
    TfIdf.topTerms(
        TfIdf.termFreq(docs, col("doc_id"), col("ws")).localCheckpoint(false), 3)
      .select(col("id").as("doc_id"), col("w"), col("tf"),
        col("score"), col("rank").cast("bigint").as("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  private val tfidfSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |), tf AS (
       |  SELECT doc_id, unnest(ws) AS w FROM docs
       |), tfc AS (
       |  SELECT doc_id, w, count(*) AS tf FROM tf GROUP BY 1, 2
       |), dfc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1
       |), n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tfc),
       |scored AS (
       |  SELECT doc_id, w, tf,
       |         tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / CAST(dfc.df AS DOUBLE)) * 1000000) AS BIGINT) AS score
       |  FROM tfc JOIN dfc USING (w) CROSS JOIN n
       |), ranked AS (
       |  SELECT doc_id, w, tf, score,
       |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT doc_id, w, tf, score, rank FROM ranked
       |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------- end-to-end pipeline
  /** The composed C4-style cleaning pipeline in ONE dataflow:
    * (corpus ∪ synthesized exact dups) → language-ID gate (computed,
    * not the stored label) → length gate → exact-dedup keep-one →
    * per-doc fingerprint. Every stage is an operator the catalog
    * already proves in isolation; this entry pins their COMPOSITION —
    * stage order, survivor sets, and the digests of what a training
    * run would actually ingest. One scan feeds the per-row gates
    * (they fold into the scan at scale); the only shuffle is the
    * digest window for keep-one.
    */
  private def cleanCorpus(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val dups = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val base = Tables.fanOut(docs.unionByName(dups))
    // ONE exploded pass yields n_words AND all stopword hit counts —
    // the column-bound `TextOps.langId(ws)` form re-evaluates
    // words(text) per language (CollapseProject re-inlines the
    // projection): the r2 llm_langid lesson, re-measured here
    // (3.25 s column-bound → 1.14 s exploded at sf0.1)
    val stats = base
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("wrd"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        TextOps.langStopwords.map { case (l, sw) =>
          sum(when(col("wrd").isin(sw: _*), 1L).otherwise(0L)).as(s"n_$l")
        }: _*)
    val scored = TextOps.langStopwords.map { case (l, _) =>
      (l, coalesce(col(s"n_$l"), lit(0L)))
    }
    val kept = base.join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        TextOps.argMaxLabel(scored).as("pred_lang"))
      .filter(col("pred_lang") === "en" && col("n_words") >= 30L)
      .select(col("doc_id"), col("n_words"),
        TextOps.fingerprint(col("text")).as("digest"))
    kept
      .withColumn("canon", min(col("doc_id")).over(Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("canon"))
      .select(col("doc_id"), col("n_words"), col("digest"))
      .orderBy(col("doc_id"))
  }

  private val cleanCorpusSql: String = {
    val hits = TextOps.langStopwords.map { case (l, sw) =>
      val set = sw.map(w => s"'$w'").mkString(", ")
      s"coalesce(len(list_filter(ws, x -> x IN ($set))), 0) AS n_$l"
    }.mkString(",\n       |         ")
    val langs = TextOps.langStopwords.map(_._1)
    val mx = s"greatest(${langs.map("n_" + _).mkString(", ")})"
    val caseArms = langs.init
      .map(l => s"WHEN n_$l = $mx THEN '$l'").mkString(" ")
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
       |), w AS (
       |  SELECT doc_id, text, ${wordsSql("text")} AS ws FROM base
       |), h AS (
       |  SELECT doc_id, text, CAST(len(ws) AS BIGINT) AS n_words,
       |         $hits
       |  FROM w
       |), lang AS (
       |  SELECT doc_id, text, n_words,
       |         CASE WHEN $mx = 0 THEN 'und' $caseArms ELSE '${langs.last}' END AS pred_lang
       |  FROM h
       |), kept AS (
       |  SELECT doc_id, n_words, md5(${normSql("text")}) AS digest
       |  FROM lang WHERE pred_lang = 'en' AND n_words >= 30
       |), canon AS (
       |  SELECT doc_id, n_words, digest,
       |         min(doc_id) OVER (PARTITION BY digest) AS canon
       |  FROM kept
       |)
       |SELECT doc_id, n_words, digest FROM canon
       |WHERE doc_id = canon ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------- BM25
  /** [[TfIdf.bm25]] ranking the corpus for a data-derived query (the
    * 5 highest-df terms — deterministic in both engines by
    * (df desc, term)). Integer-quantized per-term scores summed as
    * integers keep the ranking hash-exact; every float literal in the
    * oracle is CAST(... AS DOUBLE) so DuckDB can't constant-fold them
    * as exact DECIMALs (e.g. folding `tf * (1.2+1)` decimal-exactly
    * while Spark compounds IEEE double ops) — both engines then run
    * the identical IEEE op sequence and the floor(s·10⁶) quantization
    * can never flip on a boundary score.
    */
  private def bm25Q(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    val tf = TfIdf.termFreq(docs, col("doc_id"), col("ws")).localCheckpoint(false)
    // q's df column IS this corpus's document frequency (the fixture
    // is a df ranking over the same tf frame), so bm25 may reuse it
    // and skip its internal document-frequency aggregation
    val q = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(5).select(col("w"), col("df"))
    TfIdf.bm25(tf, q, precomputedDf = true)
      .select(col("id").as("doc_id"), col("score"), col("n_terms"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  private val bm25Sql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |), tfc AS (
       |  SELECT doc_id AS id, w, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS w FROM docs) GROUP BY 1, 2
       |), dfc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1
       |), dl AS (
       |  SELECT id, CAST(SUM(tf) AS BIGINT) AS dl FROM tfc GROUP BY 1
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl
       |), q AS (SELECT w, df FROM dfc ORDER BY df DESC, w LIMIT 5),
       |scored AS (
       |  SELECT t.id,
       |         CAST(floor(
       |           ln(1 + (tot.n - q.df + CAST(0.5 AS DOUBLE)) / (q.df + CAST(0.5 AS DOUBLE)))
       |             * (t.tf * (CAST(1.2 AS DOUBLE) + 1))
       |             / (t.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
       |                  + CAST(0.75 AS DOUBLE) * d.dl
       |                  / (CAST(tot.sumdl AS DOUBLE) / CAST(tot.n AS DOUBLE))))
       |           * 1000000) AS BIGINT) AS qs
       |  FROM tfc t JOIN q ON t.w = q.w JOIN dl d ON d.id = t.id CROSS JOIN tot
       |)
       |SELECT id AS doc_id, CAST(SUM(qs) AS BIGINT) AS score, count(*) AS n_terms
       |FROM scored GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ------------------------------------------------- filtered top-k
  /** [[Similarity.filteredTopK]]: nearest neighbors of vec 0 among
    * documents WHERE lang = 'en' AND label < 5 (metadata joined from
    * `documents` on vec_id = doc_id). The predicate prunes before any
    * cosine is computed; the query vector is taken from the unfiltered
    * corpus.
    */
  private def filteredTopK(s: SparkSession, d: String): DataFrame = {
    val cand = Tables.embeddings(s, d)
      .join(broadcast(Tables.documents(s, d).select(col("doc_id"), col("lang"))),
        col("vec_id") === col("doc_id"))
    Similarity.filteredTopK(cand, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, col("lang") === "en" && col("label") < 5, 10)
      .select(col("id"), r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))
  }

  private val filteredTopKSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |c AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |  FROM embeddings JOIN documents ON vec_id = doc_id
       |  WHERE lang = 'en' AND label < 5 AND vec_id <> 0
       |), d AS (
       |  SELECT id,
       |         list_dot_product(v, qv)
       |           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM c, q
       |), topk AS (SELECT id, sim FROM d ORDER BY sim DESC, id LIMIT 10)
       |SELECT id, ${r4Sql("sim")} AS sim FROM topk
       |ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin

  // --------------------------------------- corpus statistics
  /** [[CorpusStats.pmiTopK]] — PMI-ranked adjacent word pairs
    * (Church & Hanks CL 1990) over the whole corpus: top 20 by
    * r4-rounded PMI among pairs occurring ≥ 5 times. Both engines
    * tokenize with the same `[a-z]+`-after-lower regex and compute
    * PMI with the same expression shape over the same exact integer
    * counts, so only ln's last-ulp can differ — absorbed by r4; ties
    * at the cut break on (w1, w2).
    */
  private def collocations(s: SparkSession, d: String): DataFrame =
    CorpusStats.pmiTopK(Tables.fanOut(Tables.documents(s, d)), col("text"), minCount = 5L, k = 20)
      .select(col("w1"), col("w2"), col("c12"), r4(col("pmi")).as("pmi"))
      .orderBy(r4(col("pmi")).desc, col("w1"), col("w2"))

  private val collocationsSql: String =
    s"""WITH tl AS (
       |  SELECT regexp_extract_all(lower(text), '[a-z]+') AS ts
       |  FROM documents WHERE text IS NOT NULL
       |), toks AS (SELECT ts FROM tl WHERE len(ts) > 0),
       |uni AS (
       |  SELECT w, count(*) AS c FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY 1
       |), totals AS (
       |  SELECT CAST(sum(len(ts)) AS BIGINT) AS n,
       |         CAST(sum(greatest(len(ts) - 1, 0)) AS BIGINT) AS btot
       |  FROM toks
       |), bg AS (
       |  SELECT ts[i] AS w1, ts[i + 1] AS w2
       |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks WHERE len(ts) >= 2)
       |), pairs AS (
       |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
       |), p AS (
       |  SELECT pr.w1, pr.w2, pr.c12,
       |         ln((CAST(pr.c12 AS DOUBLE) / CAST(t.btot AS DOUBLE)) /
       |            ((CAST(u1.c AS DOUBLE) / CAST(t.n AS DOUBLE)) *
       |             (CAST(u2.c AS DOUBLE) / CAST(t.n AS DOUBLE)))) AS pmi
       |  FROM pairs pr
       |  JOIN uni u1 ON pr.w1 = u1.w
       |  JOIN uni u2 ON pr.w2 = u2.w
       |  CROSS JOIN totals t
       |), topk AS (
       |  SELECT * FROM p ORDER BY pmi DESC, w1, w2 LIMIT 20
       |)
       |SELECT w1, w2, c12, ${r4Sql("pmi")} AS pmi
       |FROM topk ORDER BY ${r4Sql("pmi")} DESC, w1, w2""".stripMargin

  /** [[CorpusStats.sourceOverlap]] — the cross-source contamination
    * matrix over distinct word 5-grams: shared-gram count, Jaccard,
    * and containment per overlapping source pair. All three outputs
    * derive from exact integer set sizes (the divisions are the only
    * float steps, identical shape both sides), so the compare is
    * effectively exact; r4 by convention.
    */
  private def sourceOverlapQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.sourceOverlap(Tables.fanOut(Tables.documents(s, d)),
        col("source"), col("text"), n = 5)
      .select(col("source_a"), col("source_b"), col("n_shared"),
        r4(col("jaccard")).as("jaccard"), r4(col("containment")).as("containment"))
      .orderBy(col("source_a"), col("source_b"))

  private val sourceOverlapSql: String =
    s"""WITH d AS (
       |  SELECT source, ${wordsSql("text")} AS w FROM documents
       |  WHERE text IS NOT NULL
       |), sg AS (
       |  SELECT DISTINCT source, unnest(CASE WHEN len(w) >= 5
       |    THEN list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS g
       |  FROM d
       |), c AS (SELECT source, count(*) AS cnt FROM sg GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
       |  FROM sg a JOIN sg b USING (g) WHERE a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT i.source_a, i.source_b, i.n_shared,
       |       ${r4Sql("CAST(i.n_shared AS DOUBLE) / CAST(ca.cnt + cb.cnt - i.n_shared AS DOUBLE)")} AS jaccard,
       |       ${r4Sql("CAST(i.n_shared AS DOUBLE) / CAST(least(ca.cnt, cb.cnt) AS DOUBLE)")} AS containment
       |FROM inter i
       |JOIN c ca ON i.source_a = ca.source
       |JOIN c cb ON i.source_b = cb.source
       |ORDER BY 1, 2""".stripMargin

  /** [[CorpusStats.byteEntropy]] — per-document Shannon entropy of
    * the UTF-8 byte distribution, the gibberish/diversity quality
    * signal. Byte extraction uses the llm_resize oracle's hex-pair
    * form on both sides; entropy = ln(n) − Σ c·ln(c)/n folds ≤256
    * exact integer counts per doc, r4 absorbs fold-order ulps.
    */
  private def docEntropy(s: SparkSession, d: String): DataFrame =
    CorpusStats.byteEntropy(Tables.fanOut(Tables.documents(s, d)), col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_bytes"), r4(col("entropy")).as("entropy"))
      .orderBy(col("doc_id"))

  private val docEntropySql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx
       |  FROM documents
       |  WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
       |), by AS (
       |  SELECT doc_id, substr(hx, CAST(2 * p + 1 AS INTEGER), 2) AS b
       |  FROM (SELECT doc_id, hx, unnest(range(0, length(hx) // 2)) AS p FROM b)
       |), c AS (SELECT doc_id, b, count(*) AS c FROM by GROUP BY 1, 2),
       |e AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
       |         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
       |  FROM c GROUP BY 1
       |)
       |SELECT doc_id, n AS n_bytes,
       |       ${r4Sql("ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE)")} AS entropy
       |FROM e ORDER BY doc_id""".stripMargin

  /** [[CorpusStats.jsDivergence]] between the five language unigram
    * distributions — 10 pairs, each JS ∈ [0, ln 2]. Both engines sum
    * the same per-word double terms (fold order differs; r4 absorbs
    * the ~1e-13 relative ulps) over exact integer counts from the
    * shared `[a-z]+` tokenizer.
    */
  private def jsDivergenceQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.jsDivergence(Tables.fanOut(Tables.documents(s, d)), col("lang"), col("text"))
      .select(col("source_a").as("lang_a"), col("source_b").as("lang_b"),
        r4(col("js")).as("js"))
      .orderBy(col("lang_a"), col("lang_b"))

  private val jsDivergenceSql: String =
    s"""WITH cnt AS (
       |  SELECT src, w, count(*) AS c FROM (
       |    SELECT lang AS src, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  GROUP BY 1, 2
       |), tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1),
       |p AS (
       |  SELECT cnt.src, w, CAST(c AS DOUBLE) / CAST(ct AS DOUBLE) AS p
       |  FROM cnt JOIN tot USING (src)
       |), shared AS (
       |  SELECT a.src AS lang_a, b.src AS lang_b,
       |         sum(a.p) AS sa, sum(b.p) AS sb,
       |         sum(a.p * ln(2 * a.p / (a.p + b.p))
       |             + b.p * ln(2 * b.p / (a.p + b.p))) AS sh
       |  FROM p a JOIN p b USING (w) WHERE a.src < b.src
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a.src AS lang_a, b.src AS lang_b
       |  FROM tot a CROSS JOIN tot b WHERE a.src < b.src
       |)
       |SELECT pr.lang_a, pr.lang_b,
       |       ${r4Sql("0.5 * (ln(2) * (2 - coalesce(sa, 0) - coalesce(sb, 0)) + coalesce(sh, 0))")} AS js
       |FROM pairs pr LEFT JOIN shared sh
       |  ON pr.lang_a = sh.lang_a AND pr.lang_b = sh.lang_b
       |ORDER BY 1, 2""".stripMargin

  /** [[Dsir.logWeights]] — DSIR importance weights (Xia et al.
    * arXiv:2302.03169): target = `src0` documents, raw = the other 19
    * sources; every raw doc scored by Σ n_b·(ln p_t(b) − ln p_r(b))
    * over 256 md5-prefix hash buckets of its unigrams+bigrams, top 30
    * by weight. Counts and bucket ids are exact/identical both sides;
    * the two lns and the weighted sum are the only float steps (same
    * expression shape, r4 absorbs fold-order ulps).
    */
  private def dsirQ(s: SparkSession, d: String): DataFrame =
    Dsir.logWeights(Tables.fanOut(Tables.documents(s, d)), col("doc_id"),
        col("text"), col("source") === "src0")
      .orderBy(col("log_w").desc, col("doc_id")).limit(30)
      .select(col("doc_id"), col("n_grams"), r4(col("log_w")).as("log_w"))
      .orderBy(r4(col("log_w")).desc, col("doc_id"))

  private val dsirSql: String =
    s"""WITH d0 AS (
       |  SELECT doc_id, (source = 'src0') AS is_target, ${wordsSql("text")} AS ws
       |  FROM documents WHERE text IS NOT NULL
       |), grams AS (
       |  SELECT doc_id, is_target,
       |         unnest(ws || CASE WHEN len(ws) >= 2
       |           THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
       |           ELSE CAST([] AS VARCHAR[]) END) AS g
       |  FROM d0
       |), feats AS (
       |  SELECT doc_id, is_target, substr(md5('dsir|' || g), 1, 2) AS b,
       |         count(*) AS n
       |  FROM grams GROUP BY 1, 2, 3
       |), model AS (
       |  SELECT b,
       |         CAST(sum(CASE WHEN is_target THEN n ELSE 0 END) AS BIGINT) AS ct,
       |         CAST(sum(CASE WHEN NOT is_target THEN n ELSE 0 END) AS BIGINT) AS cr
       |  FROM feats GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr FROM model
       |), llr AS (
       |  SELECT b, ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE))
       |           - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 256 AS DOUBLE)) AS llr
       |  FROM model CROSS JOIN tot
       |), sc AS (
       |  SELECT f.doc_id, CAST(sum(f.n) AS BIGINT) AS n_grams,
       |         sum(CAST(f.n AS DOUBLE) * llr.llr) AS log_w
       |  FROM feats f JOIN llr USING (b) WHERE NOT f.is_target
       |  GROUP BY 1
       |), topk AS (SELECT * FROM sc ORDER BY log_w DESC, doc_id LIMIT 30)
       |SELECT doc_id, n_grams, ${r4Sql("log_w")} AS log_w
       |FROM topk ORDER BY ${r4Sql("log_w")} DESC, doc_id""".stripMargin

  /** [[Similarity.embedOutliers]] — per-cell distance z-scores over
    * the embeddings table (k=8, 5 Lloyd iterations, the same
    * deterministic fit as llm_kmeans_ivf; kmeansIvfSql's
    * fixture-stability caveat applies). Variance is the explicit
    * E[d²]−μ² form on BOTH sides so the expression trees match; all
    * 500 rows returned, ordered by id — no threshold filter, so row
    * membership cannot flip on a rounding boundary.
    */
  private def embedOutliersQ(s: SparkSession, d: String): DataFrame =
    Similarity.embedOutliers(Tables.embeddings(s, d), col("vec_id"),
        col("embedding"), k = 8, iters = 5)
      .select(col("id"), col("cell").cast("int").as("cell"),
        r4(col("dist")).as("dist"), r4(col("z")).as("z"))
      .orderBy(col("id"))

  private val embedOutliersSql: String = {
    val k = 8; val iters = 5; val dimPlus1 = 65
    def centsCte(i: Int, from: String): String =
      s"""ocomp$i AS (
         |  SELECT cell, i, avg(v[i]) AS c
         |  FROM $from CROSS JOIN (SELECT i FROM range(1, $dimPlus1) t(i))
         |  GROUP BY 1, 2
         |), ocents$i AS (SELECT cell, list(c ORDER BY i) AS centroid FROM ocomp$i GROUP BY 1)"""
        .stripMargin
    def d2Sql(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dimPlus1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assignCte(i: Int, cents: String): String =
      s"""oassign$i AS (
         |  SELECT id, v, cell FROM (
         |    SELECT p.id, p.v, c.cell,
         |           row_number() OVER (PARTITION BY p.id
         |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
         |    FROM pts p CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      assignCte(i, s"ocents${i - 1}") + ",\n" + centsCte(i, s"oassign$i")
    }.mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
       |),
       |ocents0 AS (
       |  SELECT (row_number() OVER (ORDER BY id)) - 1 AS cell, v AS centroid
       |  FROM pts QUALIFY row_number() OVER (ORDER BY id) <= $k
       |),
       |$iterCtes,
       |final_assign AS (
       |  SELECT id, v, cell FROM (
       |    SELECT p.id, p.v, c.cell,
       |           row_number() OVER (PARTITION BY p.id
       |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
       |    FROM pts p CROSS JOIN ocents$iters c)
       |  WHERE rn = 1
       |), dists AS (
       |  SELECT a.id, a.cell, sqrt(${d2Sql("a.v", "c.centroid")}) AS dist
       |  FROM final_assign a JOIN ocents$iters c USING (cell)
       |), stats AS (
       |  SELECT cell, sum(dist) / count(*) AS mu,
       |         sqrt(greatest(sum(dist * dist) / count(*)
       |           - (sum(dist) / count(*)) * (sum(dist) / count(*)), 0)) AS sigma
       |  FROM dists GROUP BY 1
       |)
       |SELECT d.id, CAST(d.cell AS INTEGER) AS cell, ${r4Sql("d.dist")} AS dist,
       |       ${r4Sql("CASE WHEN s.sigma > 0 THEN (d.dist - s.mu) / s.sigma ELSE 0.0 END")} AS z
       |FROM dists d JOIN stats s USING (cell)
       |ORDER BY d.id""".stripMargin
  }

  /** [[CorpusStats.heapsCurve]] — vocabulary growth at 10 doc-id
    * checkpoints plus the Heaps exponent β. Counts are exact longs
    * (first-occurrence aggregation — never a distinct-per-prefix
    * rescan, and the tokenized frame is materialized once inside the
    * op); β folds ≤10 doubles, r4 on both sides (the zipf-slope
    * precedent).
    */
  private def heapsQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.heapsCurve(Tables.fanOut(Tables.documents(s, d)),
        col("doc_id"), col("text"), buckets = 10)
      .select(col("b"), col("cum_toks"), col("cum_types"),
        r4(col("beta")).as("beta"))
      .orderBy(col("b"))

  private val heapsSql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         regexp_extract_all(lower(text), '[a-z]+') AS w
       |  FROM documents WHERE text IS NOT NULL
       |), mx AS (SELECT max(doc_id) // 10 + 1 AS bw FROM base),
       |bt AS (
       |  SELECT doc_id // bw AS b, CAST(sum(len(w)) AS BIGINT) AS toks
       |  FROM base, mx GROUP BY 1
       |), fo AS (
       |  SELECT t, min(doc_id) AS fd
       |  FROM (SELECT doc_id, unnest(w) AS t FROM base) GROUP BY 1
       |), ty AS (
       |  SELECT fd // bw AS b, CAST(count(*) AS BIGINT) AS types
       |  FROM fo, mx GROUP BY 1
       |), cum AS (
       |  SELECT bt.b,
       |         CAST(sum(bt.toks) OVER w AS BIGINT) AS cum_toks,
       |         CAST(sum(coalesce(ty.types, 0)) OVER w AS BIGINT) AS cum_types
       |  FROM bt LEFT JOIN ty USING (b)
       |  WINDOW w AS (ORDER BY bt.b
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), pts AS (
       |  SELECT ln(CAST(cum_toks AS DOUBLE)) AS x,
       |         ln(CAST(cum_types AS DOUBLE)) AS y
       |  FROM cum WHERE cum_toks > 0 AND cum_types > 0
       |), m AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
       |         sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM pts
       |)
       |SELECT cum.b, cum.cum_toks, cum.cum_types,
       |       ${r4Sql("(m.n * m.sxy - m.sx * m.sy) / (m.n * m.sxx - m.sx * m.sx)")} AS beta
       |FROM cum, m ORDER BY cum.b""".stripMargin

  /** [[CorpusStats.zipfFit]] — per-source Zipf slope/intercept over
    * the top-200 word types. Ranks are exact (integer counts, word
    * tiebreak); the OLS moments are the explicit `(nΣxy−ΣxΣy)/…`
    * form on BOTH sides so the expression trees match; r4 absorbs
    * fold-order ulps in the ln/product sums.
    */
  private def zipfQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.zipfFit(Tables.fanOut(Tables.documents(s, d)), col("source"),
        col("text"), topN = 200)
      .select(col("src").as("source"), col("n_types"),
        r4(col("slope")).as("slope"), r4(col("intercept")).as("intercept"))
      .orderBy(col("source"))

  private val zipfSql: String =
    s"""WITH cnt AS (
       |  SELECT src, w, count(*) AS c FROM (
       |    SELECT source AS src, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT src, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM (
       |    SELECT src, c, w,
       |           row_number() OVER (PARTITION BY src ORDER BY c DESC, w) AS rank
       |    FROM cnt) WHERE rank <= 200
       |), m AS (
       |  SELECT src, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
       |         sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM ranked GROUP BY 1
       |)
       |SELECT src AS source, CAST(n AS BIGINT) AS n_types,
       |       ${r4Sql("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS slope,
       |       ${r4Sql("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n")} AS intercept
       |FROM m ORDER BY source""".stripMargin

  /** [[Similarity.centroidMatrix]] — pairwise cosine between the ten
    * label-group centroids of the embeddings table. Centroids are
    * plain per-dim averages; the cosine is the explicit
    * `Σab/(√Σa²·√Σb²)` form on both sides.
    */
  private def centroidSimQ(s: SparkSession, d: String): DataFrame =
    Similarity.centroidMatrix(Tables.embeddings(s, d), col("label"), col("embedding"))
      .select(col("group_a").cast("int").as("group_a"),
        col("group_b").cast("int").as("group_b"), r4(col("cosine")).as("cosine"))
      .orderBy(col("group_a"), col("group_b"))

  private val centroidSimSql: String =
    s"""WITH pts AS (
       |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
       |), comp AS (
       |  SELECT label, i, avg(v[i]) AS c
       |  FROM pts CROSS JOIN (SELECT i FROM range(1, 65) t(i))
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a.label AS la, b.label AS lb,
       |         sum(a.c * b.c) AS sab, sum(a.c * a.c) AS saa, sum(b.c * b.c) AS sbb
       |  FROM comp a JOIN comp b USING (i) WHERE a.label < b.label
       |  GROUP BY 1, 2
       |)
       |SELECT CAST(la AS INTEGER) AS group_a, CAST(lb AS INTEGER) AS group_b,
       |       ${r4Sql("sab / (sqrt(saa) * sqrt(sbb))")} AS cosine
       |FROM pairs ORDER BY 1, 2""".stripMargin

  /** [[Sampling.uniMaxAlloc]] — UniMax epoch-capped budget split
    * (budget 280k chars, maxEpochs 2 → at sf0.01 four sources hit
    * their 2-epoch cap and sixteen share the remainder evenly). The
    * capped/uncapped decision is exact long arithmetic on both
    * sides; the only float is the final uncapped-share division.
    */
  private def uniMaxQ(s: SparkSession, d: String): DataFrame =
    Sampling.uniMaxAlloc(Tables.documents(s, d), col("source"), col("n_chars"),
        budget = 280000L, maxEpochs = 2)
      .select(col("grp").as("source"), col("n_tok"), col("cap"),
        r4(col("alloc")).as("alloc"))
      .orderBy(col("source"))

  private val uniMaxSql: String =
    s"""WITH tot AS (
       |  SELECT source AS grp, CAST(sum(n_chars) AS BIGINT) AS n_tok,
       |         CAST(sum(n_chars) AS BIGINT) * 2 AS cap
       |  FROM documents GROUP BY 1
       |), ranked AS (
       |  SELECT grp, n_tok, cap,
       |         row_number() OVER (ORDER BY cap, grp) AS i,
       |         coalesce(sum(cap) OVER (ORDER BY cap, grp
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_prev,
       |         count(*) OVER () AS l
       |  FROM tot
       |), flagged AS (
       |  SELECT *, (s_prev + cap * (l - i + 1)) <= 280000 AS capped FROM ranked
       |), sums AS (
       |  SELECT CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k,
       |         CAST(sum(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT) AS sk,
       |         count(*) AS ltot
       |  FROM flagged
       |)
       |SELECT grp AS source, n_tok, cap,
       |       ${r4Sql("CASE WHEN capped THEN CAST(cap AS DOUBLE) ELSE CAST(280000 - sk AS DOUBLE) / CAST(ltot - k AS DOUBLE) END")} AS alloc
       |FROM flagged CROSS JOIN sums ORDER BY source""".stripMargin

  /** [[NbClassifier]] — multinomial Naive Bayes trained on the
    * doc_id%5≠0 slice (label = lang), scoring the held-out %5=0
    * slice. Scores are integer micro-nats (the [[NgramLm]] scheme) so
    * the per-document argmax is an integer compare on both engines;
    * tie-break smallest label.
    */
  private def nbClassify(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test  = docs.filter(col("doc_id") % 5 === 0)
    val model = NbClassifier.fit(train, col("lang"), TextOps.words(col("text")))
    // true_lang rides through predict as a carry column — ONE corpus
    // scan, no re-join (the second scan is the 100 TB cost)
    NbClassifier.predict(model, test, col("doc_id"),
        TextOps.words(col("text")), carry = Seq("true_lang" -> col("lang")))
      .select(col("id").as("doc_id"), col("true_lang"),
        col("pred_label").as("pred_lang"), col("q_score"))
      .orderBy(col("doc_id"))
  }

  private val nbClassifySql: String =
    s"""WITH trd AS (
       |  SELECT lang, ${wordsSql("text")} AS w FROM documents WHERE doc_id % 5 <> 0
       |), trtok AS (
       |  SELECT lang, unnest(w) AS tok FROM trd
       |), cnts AS (
       |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM trtok GROUP BY 1, 2
       |), tots AS (
       |  SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cnts GROUP BY 1
       |), vocab AS (
       |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cnts
       |), priors AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS nd FROM documents
       |  WHERE doc_id % 5 <> 0 GROUP BY 1
       |), ntot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE doc_id % 5 <> 0
       |), classes AS (
       |  SELECT p.lang, coalesce(t.tot, 0) AS tot,
       |         CAST(floor(ln(CAST(p.nd AS DOUBLE) / n.n) * 1000000) AS BIGINT) AS q_prior
       |  FROM priors p LEFT JOIN tots t USING (lang) CROSS JOIN ntot n
       |), te AS (
       |  SELECT doc_id, lang AS true_lang, ${wordsSql("text")} AS w
       |  FROM documents WHERE doc_id % 5 = 0
       |), prof AS (
       |  SELECT doc_id, true_lang, tok,
       |         CAST(count(CASE WHEN tok IS NOT NULL THEN 1 END) AS BIGINT) AS m
       |  FROM (SELECT doc_id, true_lang,
       |          unnest(CASE WHEN len(w) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE w END) AS tok
       |        FROM te)
       |  GROUP BY 1, 2, 3
       |), scored AS (
       |  SELECT p.doc_id, p.true_lang, cl.lang AS cand,
       |         CAST(cl.q_prior + sum(p.m * CAST(floor(ln(
       |             (coalesce(c.c, 0) + 1) / CAST(cl.tot + v.v AS DOUBLE))
       |           * 1000000) AS BIGINT)) AS BIGINT) AS q
       |  FROM prof p CROSS JOIN classes cl
       |  LEFT JOIN cnts c ON c.lang = cl.lang AND c.tok = p.tok
       |  CROSS JOIN vocab v
       |  GROUP BY 1, 2, 3, cl.q_prior
       |)
       |SELECT doc_id, true_lang, cand AS pred_lang, q AS q_score
       |FROM scored
       |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY q DESC, cand) = 1
       |ORDER BY doc_id""".stripMargin

  /** [[Dedup.keepFirstUnits]] — corpus-wide first-occurrence paragraph
    * dedup (keep one copy, drop later ones; Lee et al.
    * arXiv:2107.06499), on the same injected-boilerplate corpus shape
    * as `llm_line_scrub` but with 8-word pseudo-paragraphs: the global
    * footer survives only in the corpus-earliest document, each
    * per-source copyright line only in its source's earliest — unlike
    * the df-threshold scrub, which removes them everywhere.
    */
  private def paragraphDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val withParas = docs.select(col("doc_id"),
      concat(
        transform(TextOps.tokenChunks(TextOps.words(col("text")), 8, 8),
          c => c.getField("txt")),
        array(lit("subscribe to our newsletter"),
          concat(lit("copyright "), col("source")))).as("paras"))
    Dedup.keepFirstUnits(withParas, col("doc_id"), col("paras"))
      .orderBy(col("doc_id"))
  }

  private val paragraphDedupSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, ${wordsSql("text")} AS w FROM documents
       |), l AS (
       |  SELECT doc_id,
       |         list_concat(
       |           list_transform(range(0, CAST(ceil(len(w) / 8.0) AS INT)),
       |             i -> array_to_string(w[i*8+1 : i*8+8], ' ')),
       |           ['subscribe to our newsletter', 'copyright ' || source]) AS paras
       |  FROM d
       |), e AS (
       |  SELECT doc_id, unnest(paras) AS para,
       |         unnest(range(1, len(paras) + 1)) AS pos FROM l
       |), r AS (
       |  SELECT doc_id, pos, para,
       |         row_number() OVER (PARTITION BY md5(para)
       |                            ORDER BY doc_id, pos) AS rn
       |  FROM e
       |)
       |SELECT doc_id,
       |       coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
       |                           chr(10) ORDER BY pos), '') AS clean_text,
       |       CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
       |       CAST(count(CASE WHEN rn > 1 THEN 1 END) AS BIGINT) AS n_dropped
       |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** [[Sampling.temperatureWeights]] — τ=0.5 temperature mixture
    * shares per source. Group totals are exact longs; the pow and the
    * two normalizations are the only float steps, r4 on both sides.
    */
  private def temperatureMix(s: SparkSession, d: String): DataFrame =
    Sampling.temperatureWeights(Tables.documents(s, d), col("source"),
        col("n_chars"), tau = 0.5)
      .select(col("grp").as("source"), col("n_tok"),
        r4(col("p_raw")).as("p_raw"), r4(col("weight")).as("weight"))
      .orderBy(col("source"))

  private val temperatureMixSql: String =
    s"""WITH tot AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_tok
       |  FROM documents GROUP BY 1
       |), shares AS (
       |  SELECT source, n_tok,
       |         CAST(n_tok AS DOUBLE) / CAST(sum(n_tok) OVER () AS DOUBLE) AS p_raw
       |  FROM tot
       |), p AS (
       |  SELECT source, n_tok, p_raw, pow(p_raw, 0.5) AS pt FROM shares
       |)
       |SELECT source, n_tok, ${r4Sql("p_raw")} AS p_raw,
       |       ${r4Sql("pt / sum(pt) OVER ()")} AS weight
       |FROM p ORDER BY source""".stripMargin

  /** [[Similarity.knnJoin]] — batch exact k-NN retrieval: every 50th
    * vector is a query, top-5 cosine neighbors each. The per-query
    * top-k runs under the same rank-limit pushdown as `llm_domain_cap`
    * (map-side pre-trim below the exchange).
    */
  private def knnJoinQ(s: SparkSession, d: String): DataFrame =
    Similarity.knnJoin(Tables.embeddings(s, d), col("vec_id"),
        col("embedding"), col("vec_id") % 50 === 0, k = 5)
      .select(col("qid"), col("id"), r4(col("sim")).as("sim"))
      .orderBy(col("qid"), col("sim").desc, col("id"))

  private val knnJoinSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id % 50 = 0
       |), d AS (
       |  SELECT q.qid, e.vec_id AS id,
       |         list_dot_product(e.embedding::DOUBLE[], q.qv)
       |           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
       |              * sqrt(list_dot_product(q.qv, q.qv))) AS sim
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id % 50 <> 0
       |), r AS (
       |  SELECT qid, id, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rn
       |  FROM d
       |)
       |SELECT qid, id, ${r4Sql("sim")} AS sim FROM r WHERE rn <= 5
       |ORDER BY qid, ${r4Sql("sim")} DESC, id""".stripMargin

  /** [[Similarity.annRecall]] — recall@10 of the IVF route (nearest
    * label-cell centroid, cell-local scan) against the exact batch
    * k-NN ground truth, per query: the self-evaluation an ANN
    * deployment runs on a probe set before trusting the index.
    */
  private def annRecallQ(s: SparkSession, d: String): DataFrame =
    Similarity.annRecall(Tables.embeddings(s, d), col("vec_id"),
        col("label"), col("embedding"), col("vec_id") % 50 === 0, k = 10)
      .select(col("qid"), col("n_hit"), r4(col("recall")).as("recall"))
      .orderBy(col("qid"))

  private val annRecallSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id % 50 = 0
       |), pts AS (
       |  SELECT vec_id AS id, label, embedding::DOUBLE[] AS v
       |  FROM embeddings WHERE vec_id % 50 <> 0
       |), truth AS (
       |  SELECT qid, id FROM (
       |    SELECT q.qid, p.id,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY
       |             list_dot_product(p.v, q.qv)
       |               / (sqrt(list_dot_product(p.v, p.v))
       |                  * sqrt(list_dot_product(q.qv, q.qv))) DESC, p.id) AS rn
       |    FROM pts p CROSS JOIN q)
       |  WHERE rn <= 10
       |), comp AS (
       |  SELECT label, i, avg(v[i]) AS c
       |  FROM pts CROSS JOIN (SELECT i FROM range(1, 65) t(i)) GROUP BY 1, 2
       |), cents AS (
       |  SELECT label, list(c ORDER BY i) AS centroid FROM comp GROUP BY 1
       |), routed AS (
       |  SELECT qid, qv, label FROM (
       |    SELECT q.qid, q.qv, c.label,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY
       |             list_dot_product(c.centroid, q.qv)
       |               / (sqrt(list_dot_product(c.centroid, c.centroid))
       |                  * sqrt(list_dot_product(q.qv, q.qv))) DESC, c.label) AS rn
       |    FROM q CROSS JOIN cents c)
       |  WHERE rn = 1
       |), approx AS (
       |  SELECT qid, id FROM (
       |    SELECT r.qid, p.id,
       |           row_number() OVER (PARTITION BY r.qid ORDER BY
       |             list_dot_product(p.v, r.qv)
       |               / (sqrt(list_dot_product(p.v, p.v))
       |                  * sqrt(list_dot_product(r.qv, r.qv))) DESC, p.id) AS rn
       |    FROM pts p JOIN routed r ON p.label = r.label)
       |  WHERE rn <= 10
       |)
       |SELECT t.qid,
       |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |       ${r4Sql("sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0")} AS recall
       |FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.id = t.id
       |GROUP BY t.qid ORDER BY t.qid""".stripMargin

  /** [[CorpusStats.gramNovelty]] — per-doc 8-gram novelty /
    * memorization-risk score: the corpus-internal counterpart of
    * `llm_decontaminate`. Integer counts, one float division at the
    * end (r4 both sides).
    */
  private def gramNovelty(s: SparkSession, d: String): DataFrame =
    CorpusStats.gramNovelty(Tables.fanOut(Tables.documents(s, d)),
        col("doc_id"), TextOps.words(col("text")), n = 8)
      .select(col("id").as("doc_id"), col("n_grams"), col("n_shared"),
        r4(col("shared_frac")).as("shared_frac"))
      .orderBy(col("doc_id"))

  private val gramNoveltySql: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${wordsSql("text")} AS w FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(w) >= 8
       |      THEN list_transform(range(0, len(w) - 7),
       |             i -> array_to_string(w[i+1 : i+8], ' '))
       |      ELSE [] END)) AS g
       |  FROM d
       |), f AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1
       |)
       |SELECT e.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |       ${r4Sql("sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)")} AS shared_frac
       |FROM g e JOIN f USING (g)
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  /** [[Dedup.minHashEstimates]] — sketch calibration on the same
    * perturbed-dup corpus as `llm_minhash_lsh`: estimated-vs-exact
    * Jaccard per LSH candidate, no threshold. n_match is an exact
    * integer on both engines (md5 min-hash family); the two ratios
    * and their gap are r4.
    */
  private def minhashErrorQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
    val pert = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w"))
    val base = docs.unionByName(pert)
      .withColumn("sh", TextOps.wordNgrams(col("w"), 3))
    Dedup.minHashEstimates(base, col("doc_id"), col("sh"), 8, 2)
      .select(col("id_a"), col("id_b"), col("n_match"),
        r4(col("est")).as("est"), r4(col("jaccard")).as("jaccard"),
        r4(abs(col("est") - col("jaccard"))).as("abs_err"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val minhashErrorSql: String =
    s"""WITH $mhPairsCtes, matches AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       |  FROM cand c
       |  JOIN mh a ON a.id = c.id_a
       |  JOIN mh b ON b.id = c.id_b AND b.seed = a.seed
       |  GROUP BY 1, 2
       |)
       |SELECT m.id_a, m.id_b, m.n_match,
       |       ${r4Sql("m.n_match / 8.0")} AS est,
       |       ${r4Sql("i.ninter * 1.0 / (sa.n + sb.n - i.ninter)")} AS jaccard,
       |       ${r4Sql("abs(m.n_match / 8.0 - i.ninter * 1.0 / (sa.n + sb.n - i.ninter))")} AS abs_err
       |FROM matches m
       |JOIN inter i ON i.id_a = m.id_a AND i.id_b = m.id_b
       |JOIN sizes sa ON sa.id = m.id_a
       |JOIN sizes sb ON sb.id = m.id_b
       |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------- Kneser-Ney bigram LM
  /** [[NgramLm.knModel]]/[[NgramLm.knScore]] — interpolated
    * Kneser-Ney word-bigram scoring, trained and scored on the
    * corpus itself (every bigram in-model ⇒ P > 0). Integer counts
    * everywhere, per-bigram micro-nat quantization, integer sums.
    */
  private def knLmQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val bg = NgramLm.wordBigrams(docs, col("doc_id"),
      TextOps.words(col("text"))).localCheckpoint(false)
    NgramLm.knScore(bg, NgramLm.knModel(bg))
      .select(col("id").as("doc_id"), col("n_bigrams"), col("q_sum"))
      .orderBy(col("doc_id"))
  }

  private val knLmSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |), bg AS (
       |  SELECT doc_id, ws[i+1] AS w1, ws[i+2] AS w2
       |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - 1)) AS i
       |        FROM docs WHERE len(ws) >= 2)
       |), c AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
       |), b1 AS (
       |  SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1, CAST(count(*) AS BIGINT) AS n1f
       |  FROM c GROUP BY 1
       |), b2 AS (
       |  SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM c GROUP BY 1
       |), tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c),
       |scored AS (
       |  SELECT bg.doc_id,
       |         CAST(floor(ln(
       |           greatest(c.c - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
       |             / CAST(b1.cw1 AS DOUBLE)
       |           + (CAST(0.75 AS DOUBLE) * CAST(b1.n1f AS DOUBLE)
       |              / CAST(b1.cw1 AS DOUBLE))
       |             * (CAST(b2.n1b AS DOUBLE) / CAST(tt.t AS DOUBLE))
       |         ) * 1000000) AS BIGINT) AS q
       |  FROM bg JOIN c USING (w1, w2) JOIN b1 USING (w1) JOIN b2 USING (w2)
       |  CROSS JOIN tt
       |)
       |SELECT doc_id, count(*) AS n_bigrams, CAST(SUM(q) AS BIGINT) AS q_sum
       |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------- Dirichlet query likelihood
  /** [[TfIdf.dirichletQl]] on the same top-5-by-df query-term fixture
    * as `llm_bm25` (μ = 100). Every doc scores on every query term
    * (zero-tf terms contribute the smoothed background mass) — the
    * defining difference from BM25's match-only sum.
    */
  private def dirichletQlQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    val tf = TfIdf.termFreq(docs, col("doc_id"), col("ws")).localCheckpoint(false)
    val q = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(5).select(col("w"))
    TfIdf.dirichletQl(tf, q, mu = 100.0d)
      .select(col("id").as("doc_id"), col("score"), col("n_hit"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  private val dirichletQlSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |), tfc AS (
       |  SELECT doc_id AS id, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS w FROM docs) GROUP BY 1, 2
       |), dfc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1
       |), cfc AS (
       |  SELECT w, CAST(SUM(tf) AS BIGINT) AS cf FROM tfc GROUP BY 1
       |), dl AS (
       |  SELECT id, CAST(SUM(tf) AS BIGINT) AS dl FROM tfc GROUP BY 1
       |), tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS ctot FROM tfc),
       |q AS (SELECT w FROM dfc ORDER BY df DESC, w LIMIT 5),
       |qcf AS (SELECT cfc.w, cf FROM cfc JOIN q USING (w)),
       |scored AS (
       |  SELECT dl.id,
       |         CAST(floor(ln(
       |           (CAST(coalesce(t.tf, 0) AS DOUBLE)
       |            + CAST(100.0 AS DOUBLE) * CAST(qcf.cf AS DOUBLE)
       |              / CAST(tot.ctot AS DOUBLE))
       |           / (CAST(dl.dl AS DOUBLE) + CAST(100.0 AS DOUBLE))
       |         ) * 1000000) AS BIGINT) AS q,
       |         CASE WHEN t.tf IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM dl CROSS JOIN qcf
       |  LEFT JOIN tfc t ON t.id = dl.id AND t.w = qcf.w
       |  CROSS JOIN tot
       |)
       |SELECT id AS doc_id, CAST(SUM(q) AS BIGINT) AS score,
       |       CAST(SUM(hit) AS BIGINT) AS n_hit
       |FROM scored GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // --------------------------------------------- log-odds domain terms
  /** [[CorpusStats.logOdds]] — top-5 distinctive words per source,
    * Monroe et al. informative-Dirichlet log-odds z-scores, words
    * with ≥ 5 in-source occurrences. Selection ranks on the
    * unrounded z (both engines compute the identical expression);
    * output z is r4.
    */
  private def logOddsQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.logOdds(Tables.fanOut(Tables.documents(s, d)),
        col("source"), col("text"), minCount = 5L, k = 5)
      .select(col("g").as("source"), col("w"), col("ysw").as("y_sw"),
        r4(col("z")).as("z"))
      .orderBy(col("source"), col("z").desc, col("w"))

  private val logOddsSql: String =
    s"""WITH toks AS (
       |  SELECT source AS g, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents
       |), ysw AS (
       |  SELECT g, w, CAST(count(*) AS BIGINT) AS ysw FROM toks GROUP BY 1, 2
       |), yw AS (SELECT w, CAST(SUM(ysw) AS BIGINT) AS yw FROM ysw GROUP BY 1),
       |ns AS (SELECT g, CAST(SUM(ysw) AS BIGINT) AS ns FROM ysw GROUP BY 1),
       |nt AS (SELECT CAST(SUM(ysw) AS BIGINT) AS n FROM ysw),
       |zs AS (
       |  SELECT g, w, ysw,
       |         (ln(CAST(ysw + yw AS DOUBLE)
       |             / CAST(ns + n - ysw - yw AS DOUBLE))
       |          - ln((CAST(yw - ysw AS DOUBLE) + yw)
       |               / (CAST(n - ns AS DOUBLE) + n
       |                  - CAST(yw - ysw AS DOUBLE) - yw)))
       |         / sqrt(CAST(1.0 AS DOUBLE) / CAST(ysw + yw AS DOUBLE)
       |                + CAST(1.0 AS DOUBLE) / (CAST(yw - ysw AS DOUBLE) + yw)) AS z
       |  FROM ysw JOIN yw USING (w) JOIN ns USING (g) CROSS JOIN nt
       |  WHERE ysw >= 5
       |), rk AS (
       |  SELECT g, w, ysw, z,
       |         row_number() OVER (PARTITION BY g ORDER BY z DESC, w) AS r
       |  FROM zs
       |)
       |SELECT g AS source, w, ysw AS y_sw, ${r4Sql("z")} AS z
       |FROM rk WHERE r <= 5 ORDER BY source, z DESC, w""".stripMargin

  // ------------------------------------------------ SQ8 quantized ANN
  /** [[Similarity.sq8TopK]] — int8 scalar-quantized candidates
    * (floor(x/scale + 0.5), scale = max|x|/127), exact-cosine rerank
    * of the top-50, top-10 out. The integer code dot is exact in both
    * engines; approximate ties break by id at the cut.
    */
  private def sq8TopKQ(s: SparkSession, d: String): DataFrame =
    Similarity.sq8TopK(Tables.embeddings(s, d), col("vec_id"),
        col("embedding"), col("vec_id") === 0L, k = 10, rerank = 50)
      .select(col("id"), r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))

  private val sq8TopKSql: String =
    s"""WITH pts AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), sc AS (
       |  SELECT vec_id, v,
       |         list_max(list_transform(v, x -> abs(x))) / CAST(127.0 AS DOUBLE) AS s
       |  FROM pts
       |), cd AS (
       |  SELECT vec_id, v, s,
       |         CASE WHEN s = 0 THEN list_transform(v, x -> CAST(0 AS DOUBLE))
       |              ELSE list_transform(v, x -> floor(x / s + 0.5)) END AS c
       |  FROM sc
       |), q AS (SELECT v AS qv, s AS qs, c AS qc FROM cd WHERE vec_id = 0),
       |cand AS (
       |  SELECT vec_id, v, qv, list_dot_product(c, qc) * s * qs AS approx
       |  FROM cd, q WHERE vec_id <> 0 AND s > 0
       |  ORDER BY approx DESC, vec_id LIMIT 50
       |), rer AS (
       |  SELECT vec_id AS id,
       |         list_dot_product(v, qv)
       |           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM cand ORDER BY sim DESC, id LIMIT 10
       |)
       |SELECT id, ${r4Sql("sim")} AS sim FROM rer
       |ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin

  // ------------------------------------------------ RRF hybrid fusion
  /** [[Retrieval.rrf]] — reciprocal rank fusion of the BM25 top-30
    * (same query fixture as `llm_bm25`) with the dense cosine top-30
    * against vec 0 (`llm_cosine_topk`'s retriever); doc_id ↔ vec_id
    * is the corpus's 1:1 key. Integer ranks ⇒ engine-exact
    * contributions; two-operand FP addition is order-free.
    */
  private def rrfFusionQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    val tf = TfIdf.termFreq(docs, col("doc_id"), col("ws")).localCheckpoint(false)
    // q's df column IS this corpus's document frequency (the fixture
    // is a df ranking over the same tf frame), so bm25 may reuse it
    // and skip its internal document-frequency aggregation
    val q = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(5).select(col("w"), col("df"))
    val textList = TfIdf.bm25(tf, q, precomputedDf = true)
      .orderBy(col("score").desc, col("id")).limit(30)
    val vecList = Similarity.bruteForceTopK(Tables.embeddings(s, d),
      col("vec_id"), col("embedding"), col("vec_id") === 0L, 30)
    Retrieval.rrf(Seq(
        Retrieval.ranked(textList, col("id"), col("score")),
        Retrieval.ranked(vecList, col("id"), col("sim"))), topK = 10)
      .select(col("id").as("doc_id"), col("n_lists"), r4(col("rrf")).as("rrf"))
      .orderBy(r4(col("rrf")).desc, col("doc_id"))
  }

  private val rrfFusionSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${wordsSql("text")} AS ws FROM documents
       |), tfc AS (
       |  SELECT doc_id AS id, w, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS w FROM docs) GROUP BY 1, 2
       |), dfc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1
       |), dl AS (
       |  SELECT id, CAST(SUM(tf) AS BIGINT) AS dl FROM tfc GROUP BY 1
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl
       |), q AS (SELECT w, df FROM dfc ORDER BY df DESC, w LIMIT 5),
       |bscored AS (
       |  SELECT t.id,
       |         CAST(floor(
       |           ln(1 + (tot.n - q.df + CAST(0.5 AS DOUBLE)) / (q.df + CAST(0.5 AS DOUBLE)))
       |             * (t.tf * (CAST(1.2 AS DOUBLE) + 1))
       |             / (t.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
       |                  + CAST(0.75 AS DOUBLE) * d.dl
       |                  / (CAST(tot.sumdl AS DOUBLE) / CAST(tot.n AS DOUBLE))))
       |           * 1000000) AS BIGINT) AS qs
       |  FROM tfc t JOIN q ON t.w = q.w JOIN dl d ON d.id = t.id CROSS JOIN tot
       |), bm AS (
       |  SELECT id, CAST(SUM(qs) AS BIGINT) AS score FROM bscored GROUP BY 1
       |  ORDER BY score DESC, id LIMIT 30
       |), bmr AS (
       |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM bm
       |), qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |cos AS (
       |  SELECT vec_id AS id,
       |         list_dot_product(embedding::DOUBLE[], qv)
       |           / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
       |              * sqrt(list_dot_product(qv, qv))) AS sim
       |  FROM embeddings, qv WHERE vec_id <> 0
       |  ORDER BY sim DESC, id LIMIT 30
       |), cosr AS (
       |  SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS rank FROM cos
       |), u AS (
       |  SELECT id, CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(rank AS DOUBLE)) AS contrib FROM bmr
       |  UNION ALL
       |  SELECT id, CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(rank AS DOUBLE)) AS contrib FROM cosr
       |), f AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS n_lists, SUM(contrib) AS rrf
       |  FROM u GROUP BY 1 ORDER BY rrf DESC, id LIMIT 10
       |)
       |SELECT id AS doc_id, n_lists, ${r4Sql("rrf")} AS rrf FROM f
       |ORDER BY ${r4Sql("rrf")} DESC, doc_id""".stripMargin

  // --------------------------------------------------- PageRank hubs
  /** [[GraphOps.pageRank]] over the same thresholded MinHash near-dup
    * graph as `llm_dedup_clusters` — duplication-hub centrality, 3
    * iterations. Edge contributions quantize to integer pico-units
    * before summing, so both engines iterate identical rank vectors;
    * the oracle unrolls the SAME 3 rounds.
    */
  private def pageRankQ(s: SparkSession, d: String): DataFrame =
    GraphOps.pageRank(minhashPairs(s, d), col("id_a"), col("id_b"), iters = 3)
      .select(col("id").as("doc_id"), col("deg"), r4(col("rank")).as("rank"))
      .orderBy(col("doc_id"))

  private val pageRankSql: String = {
    val iter = (1 to 3).map { k =>
      s"""pc$k AS (
         |  SELECT e.dst,
         |         CAST(SUM(CAST(floor(r.rank / CAST(d.deg AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS sq
         |  FROM psym e JOIN pdeg d ON d.src = e.src
         |  JOIN pr${k - 1} r ON r.id = e.src GROUP BY 1
         |), pr$k AS (
         |  SELECT d.src AS id,
         |         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(pn.n AS DOUBLE)
         |           + CAST(0.85 AS DOUBLE)
         |             * (CAST(coalesce(c.sq, 0) AS DOUBLE) / 1e12) AS rank
         |  FROM pdeg d LEFT JOIN pc$k c ON c.dst = d.src CROSS JOIN pn
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $mhPairsCtes, ppairs AS (
       |  SELECT i.id_a, i.id_b
       |  FROM inter i
       |  JOIN sizes sa ON sa.id = i.id_a
       |  JOIN sizes sb ON sb.id = i.id_b
       |  WHERE i.ninter * 1.0 / (sa.n + sb.n - i.ninter) >= 0.5
       |), psym AS (
       |  SELECT id_a AS src, id_b AS dst FROM ppairs
       |  UNION
       |  SELECT id_b, id_a FROM ppairs
       |), pdeg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM psym GROUP BY 1
       |), pn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pdeg),
       |pr0 AS (
       |  SELECT src AS id, CAST(1.0 AS DOUBLE) / CAST(pn.n AS DOUBLE) AS rank
       |  FROM pdeg CROSS JOIN pn
       |), $iter
       |SELECT d.src AS doc_id, d.deg, ${r4Sql("r.rank")} AS rank
       |FROM pdeg d JOIN pr3 r ON r.id = d.src
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- content-defined chunks
  /** [[TextOps.cdcChunks]] + [[CorpusStats.unitNovelty]] — chunk-level
    * dedup audit with LBFS content-defined boundaries (w=16,
    * boundary odds 4/256 ⇒ mean chunk ≈ 64 chars). The constructed
    * positives are PREFIX-INSERTED copies (doc_id+100000, text with
    * 16 chars prepended): fixed-width chunking would shift every
    * boundary and share nothing; CDC re-chunks only the prefix span,
    * so the copies score high shared_frac — the property under test.
    */
  private def cdcDedupQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val pert = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("INSERTED PREFIX "), col("text")).as("text"))
    CorpusStats.unitNovelty(docs.unionByName(pert), col("doc_id"),
        TextOps.cdcChunks(col("text"), 16, "03"))
      .select(col("id").as("doc_id"), col("n_units").as("n_chunks"),
        col("n_shared"), r4(col("shared_frac")).as("shared_frac"))
      .orderBy(col("doc_id"))
  }

  private val cdcDedupSql: String =
    s"""WITH cbase AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |  UNION ALL
       |  SELECT doc_id + 100000, 'INSERTED PREFIX ' || text FROM documents
       |  WHERE text IS NOT NULL AND doc_id % 7 = 0
       |), cu AS (
       |  SELECT doc_id, text AS t,
       |         [CAST(0 AS BIGINT)]
       |           || list_filter(range(16, length(text) + 1),
       |                i -> substr(md5(substr(t, i - 15, 16)), 1, 2) <= '03')
       |           || [CAST(length(text) AS BIGINT)] AS cuts
       |  FROM cbase
       |), ch AS (
       |  SELECT doc_id, unnest(list_distinct(list_filter(
       |    list_transform(range(1, len(cuts)),
       |      j -> substr(t, CAST(cuts[j] + 1 AS INTEGER),
       |                  CAST(cuts[j + 1] - cuts[j] AS INTEGER))),
       |    c -> length(c) > 0))) AS g
       |  FROM cu
       |), cf AS (
       |  SELECT md5(g) AS dg, CAST(count(*) AS BIGINT) AS df,
       |         min(doc_id) AS owner
       |  FROM ch GROUP BY 1
       |), cpd AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM ch GROUP BY 1
       |), cuq AS (
       |  SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS n_unique
       |  FROM cf WHERE df = 1 GROUP BY 1
       |)
       |SELECT cpd.doc_id, cpd.n_chunks,
       |       cpd.n_chunks - COALESCE(cuq.n_unique, 0) AS n_shared,
       |       ${r4Sql("(cpd.n_chunks - COALESCE(cuq.n_unique, 0)) * 1.0 / cpd.n_chunks")} AS shared_frac
       |FROM cpd LEFT JOIN cuq USING (doc_id) ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- BPE training
  /** [[Bpe.train]] — 8 BPE merges learned from the corpus word-
    * frequency table (Sennrich ACL'16). Deterministic: integer pair
    * counts, (count desc, pair lexicographic) tie-break, and merge
    * application via literal `replace` whose left-to-right
    * non-overlapping scan is BPE's greedy order in both engines. The
    * oracle unrolls the SAME 8 iterations.
    */
  private def bpeTrainQ(s: SparkSession, d: String): DataFrame =
    Bpe.train(
      Bpe.wordFreq(Tables.fanOut(Tables.documents(s, d)), col("text"))
        .localCheckpoint(false),
      merges = 8)

  /** Shared BPE training CTE chain (bw0…bwN word frames, btK = step-K
    * winning pair) — consumed by `llm_bpe_train` and `llm_bpe_encode`.
    */
  private def bpeTrainCtes(merges: Int): String = {
    def iter(k: Int): String =
      s"""bp$k AS (
         |  SELECT a, b, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
         |    SELECT wc, sym[i] AS a, sym[i + 1] AS b FROM (
         |      SELECT wc, sym, unnest(range(1, len(sym))) AS i FROM (
         |        SELECT wc, list_filter(string_split(s, '|'), x -> x <> '') AS sym
         |        FROM bw${k - 1})
         |      WHERE len(sym) >= 2)
         |  ) GROUP BY 1, 2
         |), bt$k AS (
         |  SELECT a, b, cnt FROM bp$k ORDER BY cnt DESC, a, b LIMIT 1
         |), bw$k AS (
         |  SELECT wc, replace(s, t.a || '|' || t.b || '|', t.a || t.b || '|') AS s
         |  FROM bw${k - 1} CROSS JOIN bt$k t
         |)""".stripMargin
    s"""bw0 AS (
       |  SELECT wc, regexp_replace(w, '(.)', '\\1|', 'g') AS s FROM (
       |    SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
       |      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |      FROM documents) GROUP BY 1)
       |), ${(1 to merges).map(iter).mkString(", ")}""".stripMargin
  }

  private val bpeTrainSql: String = {
    val finals = (1 to 8)
      .map(k => s"SELECT $k AS step, a, b, a || b AS merged, cnt FROM bt$k")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH ${bpeTrainCtes(8)}
       |SELECT * FROM (
       |  $finals
       |) ORDER BY step""".stripMargin
  }

  // ----------------------------------------------------- BPE encoding
  /** [[Bpe.encodeWords]] — the corpus ENCODED with the 8 merges
    * `llm_bpe_train` learns: per-source word/token/char totals and
    * tokens-per-word fertility. The scale move this query pins:
    * tokenization happens on the VOCABULARY frame (distinct words),
    * and the corpus only joins usage counts against (w, n_tokens) —
    * the oracle replays the same vocabulary fold (ew0…ew8 carrying
    * the word key through the identical replace chain).
    */
  private def bpeEncodeQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val wf = Bpe.wordFreq(docs, col("text")).localCheckpoint(false)
    val mergeTable = Bpe.train(wf, merges = 8)
    val tok = Bpe.encodeWords(wf.select(col("w")), mergeTable)
    val usage = docs
      .select(col("source"), explode(CorpusStats.alphaTokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
    usage.join(tok, "w")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_tokens")).as("n_tokens"),
        sum(col("n") * length(col("w"))).as("n_chars"),
        r4(sum(col("n") * col("n_tokens")).cast("double")
          / sum(col("n")).cast("double")).as("fertility"))
      .orderBy(col("source"))
  }

  private val bpeEncodeSql: String = {
    def eiter(k: Int): String =
      s"""ew$k AS (
         |  SELECT w, replace(s, t.a || '|' || t.b || '|', t.a || t.b || '|') AS s
         |  FROM ew${k - 1} CROSS JOIN bt$k t
         |)""".stripMargin
    s"""WITH ${bpeTrainCtes(8)}, ew0 AS (
       |  SELECT DISTINCT w, regexp_replace(w, '(.)', '\\1|', 'g') AS s FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents)
       |), ${(1 to 8).map(eiter).mkString(", ")},
       |tokv AS (
       |  SELECT w, CAST(length(regexp_replace(s, '[^|]', '', 'g')) AS BIGINT) AS n_tokens
       |  FROM ew8
       |), su AS (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents) GROUP BY 1, 2
       |)
       |SELECT source, CAST(sum(n) AS BIGINT) AS n_words,
       |       CAST(sum(n * t.n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(sum(n * length(w)) AS BIGINT) AS n_chars,
       |       ${r4Sql("CAST(sum(n * t.n_tokens) AS DOUBLE) / CAST(sum(n) AS DOUBLE)")} AS fertility
       |FROM su JOIN tokv t USING (w)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --------------------------------------- unigram-LM tokenizer (Kudo '18)
  /** [[graft.llm.Unigram.train]] — SentencePiece-style unigram
    * vocabulary learned by 2 hard-EM rounds (seed = chars + top-120
    * substrings ≤ 4 chars; Viterbi E-step; add-one M-step). The
    * oracle unrolls the SAME 2 iterations, running the identical
    * integer-encoded Viterbi DP as a `list_reduce` fold (enc =
    * ((score + 2⁴⁰) << 4) | len — all-integer comparisons, so the
    * segmentations are engine-exact; ln only enters through the
    * micro-nat quantization both engines share).
    */
  private def unigramTrainQ(s: SparkSession, d: String): DataFrame =
    graft.llm.Unigram.train(
        Bpe.wordFreq(Tables.fanOut(Tables.documents(s, d)), col("text"))
          .localCheckpoint(false),
        maxLen = 4, seedSize = 120, iters = 2)
      .filter(col("cnt") > 0 || length(col("piece")) === 1)
      .select(col("piece"), col("cnt"), col("lp").as("q_lp"))
      .orderBy(col("piece"))

  /** The Viterbi-DP CTE block for one segmentation pass under vocab
    * CTE `vocabCte`: edges (spans ∩ vocab) → per-word sorted edge
    * list → forward DP fold → backtrack fold → (w, piece) path rows.
    * Both folds are CAPTURE-FREE (the backtrack's accumulator carries
    * the dp array inside itself: [pos] || dp || lens) and the fold
    * CTEs are MATERIALIZED — DuckDB 1.0's lambda executor misbinds
    * rows when one lambda's list output feeds another lambda through
    * an inlined CTE (measured: whole dp rows swapped between words).
    */
  private def unigramDpCtes(tag: String, vocabCte: String): String =
    s"""ue$tag AS (
       |  SELECT s.w, CAST(s.j AS BIGINT) AS j, CAST(s.l AS BIGINT) AS len, v.lp
       |  FROM usp s JOIN $vocabCte v USING (piece)
       |), uel$tag AS (
       |  SELECT w, list_prepend([CAST(1099511627776 AS BIGINT) << 4],
       |           list([j, len, lp] ORDER BY j, len, lp)) AS es
       |  FROM ue$tag GROUP BY w
       |), udp$tag AS MATERIALIZED (
       |  SELECT w, list_reduce(es, (acc, x) -> CASE
       |    WHEN CAST(len(acc) AS BIGINT) = x[1]
       |      THEN list_append(acc, (((acc[CAST(x[1] - x[2] + 1 AS INTEGER)] >> 4) + x[3]) << 4) | x[2])
       |    ELSE list_concat(acc[1 : CAST(x[1] AS INTEGER)],
       |           [greatest(acc[CAST(x[1] + 1 AS INTEGER)],
       |                     (((acc[CAST(x[1] - x[2] + 1 AS INTEGER)] >> 4) + x[3]) << 4) | x[2])])
       |    END) AS dp
       |  FROM uel$tag
       |), uwk$tag AS MATERIALIZED (
       |  SELECT w, st[CAST(length(w) + 3 AS INTEGER):] AS ls FROM (
       |    SELECT w, list_reduce(
       |      list_prepend(list_prepend(CAST(length(w) AS BIGINT), dp),
       |        list_transform(range(1, length(w) + 1), i -> [CAST(0 AS BIGINT)])),
       |      (acc, x) -> CASE WHEN acc[1] <= 0 THEN acc
       |        ELSE list_append(
       |          list_concat([acc[1] - (acc[CAST(acc[1] + 2 AS INTEGER)] & 15)], acc[2:]),
       |          acc[CAST(acc[1] + 2 AS INTEGER)] & 15) END) AS st
       |    FROM udp$tag)
       |), upp$tag AS (
       |  SELECT w, substr(w, CAST(length(w) - s + 1 AS INTEGER), CAST(l AS INTEGER)) AS piece
       |  FROM (
       |    SELECT w, l, SUM(l) OVER (PARTITION BY w ORDER BY i) AS s
       |    FROM (SELECT w, unnest(ls) AS l, unnest(range(1, len(ls) + 1)) AS i FROM uwk$tag))
       |)""".stripMargin

  /** One unrolled EM iteration t: segment under uv{t−1}, count pieces
    * with word-frequency weight, add-one smooth over the seed vocab.
    */
  private def unigramEmCtes(t: Int): String =
    unigramDpCtes(t.toString, s"uv${t - 1}") +
    s""", upc$t AS (
       |  SELECT piece, CAST(SUM(wc) AS BIGINT) AS cnt
       |  FROM upp$t JOIN uwf USING (w) GROUP BY 1
       |), uvc$t AS (
       |  SELECT v.piece, COALESCE(c.cnt, CAST(0 AS BIGINT)) AS cnt
       |  FROM uv${t - 1} v LEFT JOIN upc$t c USING (piece)
       |), uv$t AS (
       |  SELECT piece, cnt,
       |         CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) /
       |           (SELECT CAST(SUM(cnt + 1) AS DOUBLE) FROM uvc$t)) * 1000000) AS BIGINT) AS lp
       |  FROM uvc$t
       |)""".stripMargin

  /** Word-frequency table, span lattice, seed vocabulary, and the two
    * unrolled EM iterations — shared by `llm_unigram_train` and
    * `llm_unigram_encode`.
    */
  private val unigramBaseCtes: String =
    s"""uwf AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents) GROUP BY 1
       |), usp AS (
       |  SELECT w, j, l, substr(w, CAST(j - l + 1 AS INTEGER), CAST(l AS INTEGER)) AS piece
       |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS j FROM uwf),
       |       (SELECT unnest(range(1, 4 + 1)) AS l)
       |  WHERE l <= j
       |), useed AS (
       |  SELECT piece, CAST(SUM(wc) AS BIGINT) AS cnt
       |  FROM usp JOIN uwf USING (w) GROUP BY 1
       |), uv0a AS (
       |  SELECT piece, cnt FROM useed WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM useed WHERE length(piece) >= 2
       |    ORDER BY cnt DESC, piece LIMIT 120)
       |), uv0 AS (
       |  SELECT piece, cnt,
       |         CAST(floor(ln(CAST(cnt AS DOUBLE) /
       |           (SELECT CAST(SUM(cnt) AS DOUBLE) FROM uv0a)) * 1000000) AS BIGINT) AS lp
       |  FROM uv0a
       |), ${unigramEmCtes(1)}, ${unigramEmCtes(2)}""".stripMargin

  private val unigramTrainSql: String =
    s"""WITH $unigramBaseCtes
       |SELECT piece, cnt, lp AS q_lp FROM uv2
       |WHERE cnt > 0 OR length(piece) = 1 ORDER BY piece""".stripMargin

  /** [[graft.llm.Unigram.viterbiSegments]] with the trained model —
    * the corpus encoded: per-source word/piece/char totals and
    * fertility. Tokenization happens on the VOCABULARY frame and the
    * corpus joins usage counts against (w, |pieces|) — the
    * `llm_bpe_encode` scale move.
    */
  private def unigramEncodeQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val wf = Bpe.wordFreq(docs, col("text")).localCheckpoint(false)
    val vocab = graft.llm.Unigram.train(wf, maxLen = 4, seedSize = 120, iters = 2)
    val segn = graft.llm.Unigram.viterbiSegments(wf.select(col("w")), vocab, maxLen = 4)
      .select(col("w"), size(col("ps")).cast("long").as("np"))
    val usage = docs
      .select(col("source"), explode(CorpusStats.alphaTokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
    usage.join(segn, "w")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np")).as("n_pieces"),
        sum(col("n") * length(col("w"))).as("n_chars"),
        r4(sum(col("n") * col("np")).cast("double")
          / sum(col("n")).cast("double")).as("fertility"))
      .orderBy(col("source"))
  }

  /** Train-once / encode-many fixture cache for the unigram
    * tokenizer (the `llm_ivf_pq_probe` / dmlFixtures lifecycle): the
    * first call per testdata dir runs the 2-round hard-EM fit and
    * keeps the MODEL frame (vocab driver rows — piece/cnt/lp, the
    * Bpe merge-table discipline); every later call — including every
    * bench round — pays only the deployed encode (word-frequency scan
    * + broadcast-vocab Viterbi + usage join). `llm_unigram_encode`
    * deliberately keeps fitting in-query (the oracle pins the EM);
    * this row prices tokenizing a corpus under an already-trained
    * model, which is what runs at 100 TB.
    */
  private val unigramVocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long, Long)]]()

  /** Value-identical to [[unigramEncodeQ]] (same train parameters,
    * same corpus, shared oracle SQL verbatim; UnigramSpec pins the
    * frame equivalence) — but the measured plan is the deployed one:
    * the vocabulary is a pretrained LocalRelation, so the query is
    * one word-frequency aggregation, one broadcast-joined Viterbi
    * projection, and the per-source usage rollup.
    */
  private def unigramApplyQ(s: SparkSession, d: String): DataFrame = {
    val rows = unigramVocabCache.computeIfAbsent(d, { dd =>
      val wfFit = Bpe.wordFreq(Tables.fanOut(Tables.documents(s, dd)), col("text"))
        .localCheckpoint(false)
      graft.llm.Unigram.train(wfFit, maxLen = 4, seedSize = 120, iters = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    })
    import s.implicits._
    val vocab = rows.toDF("piece", "cnt", "lp")
    val docs = Tables.fanOut(Tables.documents(s, d))
    val wf = Bpe.wordFreq(docs, col("text")).localCheckpoint(false)
    val segn = graft.llm.Unigram.viterbiSegments(wf.select(col("w")), vocab, maxLen = 4)
      .select(col("w"), size(col("ps")).cast("long").as("np"))
    val usage = docs
      .select(col("source"), explode(CorpusStats.alphaTokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
    usage.join(segn, "w")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np")).as("n_pieces"),
        sum(col("n") * length(col("w"))).as("n_chars"),
        r4(sum(col("n") * col("np")).cast("double")
          / sum(col("n")).cast("double")).as("fertility"))
      .orderBy(col("source"))
  }

  private val unigramEncodeSql: String =
    s"""WITH $unigramBaseCtes, ${unigramDpCtes("E", "uv2")}, su AS (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents) GROUP BY 1, 2
       |), segn AS (SELECT w, CAST(len(ls) AS BIGINT) AS np FROM uwkE)
       |SELECT source, CAST(SUM(n) AS BIGINT) AS n_words,
       |       CAST(SUM(n * np) AS BIGINT) AS n_pieces,
       |       CAST(SUM(n * length(w)) AS BIGINT) AS n_chars,
       |       ${r4Sql("CAST(SUM(n * np) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)")} AS fertility
       |FROM su JOIN segn USING (w)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------- PCA top component
  /** [[Pca.topComponent]] — 3 quantized power iterations over the
    * 64×64 covariance of the embedding corpus (ABTT's component-1).
    * Every cross-row sum is an integer sum of floor-quantized terms,
    * so the oracle's unrolled iterations land on identical doubles.
    */
  private def pcaTopQ(s: SparkSession, d: String): DataFrame =
    Pca.topComponent(Tables.embeddings(s, d), col("embedding"), iters = 3)
      .select(col("dim").cast("int").as("dim"), r4(col("loading")).as("loading"))
      .orderBy(col("dim"))

  /** Shared CTE chain computing the quantized PCA pipeline through
    * `px3` (the unit top component after 3 power iterations), plus
    * `pmq`/`pn` for the quantized means — consumed by `llm_pca_top`
    * and `llm_abtt_topk`.
    */
  private val pcaCtes: String = {
    def iter(i: Int): String =
      s"""yq$i AS (
         |  SELECT c.j, CAST(SUM(CAST(floor(c.c * x.xv * 1e12) AS BIGINT)) AS BIGINT) AS yq
         |  FROM pcov c JOIN px${i - 1} x ON x.k = c.j2 GROUP BY 1
         |), ya$i AS (
         |  SELECT list(CAST(yq AS DOUBLE) / 1e12 ORDER BY j) AS ya FROM yq$i
         |), px$i AS (
         |  SELECT unnest(range(0, 64)) AS k,
         |         unnest(list_transform(ya,
         |           y -> y / sqrt(list_dot_product(ya, ya)))) AS xv
         |  FROM ya$i
         |)""".stripMargin
    s"""ppts AS (
       |  SELECT embedding::DOUBLE[] AS v FROM embeddings
       |), pn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ppts),
       |pel AS (
       |  SELECT unnest(range(0, 64)) AS j, unnest(v) AS x, v FROM ppts
       |), pmq AS (
       |  SELECT j, CAST(SUM(CAST(floor(x * 1e6) AS BIGINT)) AS BIGINT) AS sq
       |  FROM pel GROUP BY 1
       |), pel2 AS (
       |  SELECT j, x AS xj, unnest(range(0, 64)) AS k, unnest(v) AS xk FROM pel
       |), pgq AS (
       |  SELECT j, k, CAST(SUM(CAST(floor(xj * xk * 1e9) AS BIGINT)) AS BIGINT) AS gq
       |  FROM pel2 GROUP BY 1, 2
       |), pcov AS (
       |  SELECT g.j, g.k AS j2,
       |         CAST(g.gq AS DOUBLE) / 1e9 / CAST(pn.n AS DOUBLE)
       |         - (CAST(a.sq AS DOUBLE) / 1e6 / CAST(pn.n AS DOUBLE))
       |           * (CAST(b.sq AS DOUBLE) / 1e6 / CAST(pn.n AS DOUBLE)) AS c
       |  FROM pgq g JOIN pmq a ON a.j = g.j JOIN pmq b ON b.j = g.k CROSS JOIN pn
       |), px0 AS (SELECT j AS k, CAST(1.0 AS DOUBLE) AS xv FROM pmq),
       |${(1 to 3).map(iter).mkString(", ")}""".stripMargin
  }

  private val pcaTopSql: String =
    s"""WITH $pcaCtes
       |SELECT CAST(k AS INTEGER) AS dim, ${r4Sql("xv")} AS loading
       |FROM px3 ORDER BY dim""".stripMargin

  // ------------------------------------------------- ABTT retrieval
  /** [[Pca.abtt]] composed into retrieval: top-10 cosine neighbors of
    * vec 0 AFTER removing the corpus mean and the top principal
    * direction — the post-processing that makes raw-embedding cosine
    * discriminative. Exercises pca_top's component as an input to a
    * second operator; the oracle recomputes the identical pipeline.
    */
  private def abttTopKQ(s: SparkSession, d: String): DataFrame = {
    // fanOut: the Gram-matrix map pass over the single-row-group
    // embeddings scan ran in ONE task (GenFilterScan round 14c, 925 ms)
    val proc = Pca.abtt(Tables.fanOut(Tables.embeddings(s, d)), col("vec_id"),
        col("embedding"), iters = 3)
      .localCheckpoint(false) // query row + candidate scan share it
    val q = proc.filter(col("id") === 0L).select(col("w").as("qw")).limit(1)
    proc.filter(col("id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(col("id"), Similarity.cosine(col("w"), col("qw")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc).limit(10)
      .select(col("id"), r4(col("sim")).as("sim"))
      .orderBy(r4(col("sim")).desc, col("id"))
  }

  private val abttTopKSql: String =
    s"""WITH $pcaCtes, mus AS (
       |  SELECT list(CAST(sq AS DOUBLE) / 1e6 / CAST(pn.n AS DOUBLE) ORDER BY j) AS mu
       |  FROM pmq CROSS JOIN pn
       |), uarr AS (SELECT list(xv ORDER BY k) AS u FROM px3),
       |pts2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cc AS (
       |  SELECT vec_id, list_transform(range(1, 65), j -> v[j] - mu[j]) AS c, u
       |  FROM pts2 CROSS JOIN mus CROSS JOIN uarr
       |), ww AS (
       |  SELECT vec_id,
       |         list_transform(range(1, 65),
       |           j -> c[j] - list_dot_product(c, u) * u[j]) AS w
       |  FROM cc
       |), qq AS (SELECT w AS qw FROM ww WHERE vec_id = 0),
       |dd AS (
       |  SELECT vec_id AS id,
       |         list_dot_product(w, qw)
       |           / (sqrt(list_dot_product(w, w)) * sqrt(list_dot_product(qw, qw))) AS sim
       |  FROM ww, qq WHERE vec_id <> 0
       |), topk AS (SELECT id, sim FROM dd ORDER BY sim DESC, id LIMIT 10)
       |SELECT id, ${r4Sql("sim")} AS sim FROM topk
       |ORDER BY ${r4Sql("sim")} DESC, id""".stripMargin

  // ---------------------------------------------- hard negatives
  /** [[Similarity.hardNegatives]] — per probe query, top-5 most
    * similar candidates OUTSIDE the query's near-dup cluster. The
    * fixture plants an exact copy of every probe vector (id+1000001)
    * clustered with its source: unfiltered k-NN would return it at
    * sim 1.0 as a mislabeled positive; the exclusion must remove
    * exactly those and nothing else.
    */
  private def hardNegativesQ(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val copies = probes
      .select((col("vec_id") + 1000001L).as("vec_id"), col("embedding"))
    val clusters = probes.select(col("vec_id").as("id"), col("vec_id").as("label"))
      .unionByName(probes.select((col("vec_id") + 1000001L).as("id"),
        col("vec_id").as("label")))
    Similarity.hardNegatives(emb.unionByName(copies), col("vec_id"),
        col("embedding"), col("vec_id") % 50 === 0, clusters, k = 5)
      .select(col("qid"), col("id"), r4(col("sim")).as("sim"))
      .orderBy(col("qid"), r4(col("sim")).desc, col("id"))
  }

  private val hardNegativesSql: String =
    s"""WITH hbase AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), hcand AS (
       |  SELECT vec_id, v FROM hbase
       |  UNION ALL
       |  SELECT vec_id + 1000001, v FROM hbase WHERE vec_id % 50 = 0
       |), hclus AS (
       |  SELECT vec_id AS id, vec_id AS label FROM hbase WHERE vec_id % 50 = 0
       |  UNION ALL
       |  SELECT vec_id + 1000001, vec_id FROM hbase WHERE vec_id % 50 = 0
       |), hq AS (SELECT vec_id AS qid, v AS qv FROM hcand WHERE vec_id % 50 = 0),
       |hd AS (
       |  SELECT hq.qid, c.vec_id AS id,
       |         list_dot_product(c.v, hq.qv)
       |           / (sqrt(list_dot_product(c.v, c.v))
       |              * sqrt(list_dot_product(hq.qv, hq.qv))) AS sim
       |  FROM hcand c CROSS JOIN hq WHERE c.vec_id % 50 <> 0
       |), hf AS (
       |  SELECT hd.qid, hd.id, hd.sim FROM hd
       |  LEFT JOIN hclus ql ON ql.id = hd.qid
       |  LEFT JOIN hclus cl ON cl.id = hd.id
       |  WHERE COALESCE(ql.label, hd.qid) <> COALESCE(cl.label, hd.id)
       |), hr AS (
       |  SELECT qid, id, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rn
       |  FROM hf
       |)
       |SELECT qid, id, ${r4Sql("sim")} AS sim FROM hr WHERE rn <= 5
       |ORDER BY qid, ${r4Sql("sim")} DESC, id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_kmeans_ivf"   -> kmeansIvf,
    "llm_kcenter"      -> kcenterQ,
    "llm_jsonl_roundtrip" -> jsonlRoundtrip,
    "llm_semantic_dedup" -> semanticDedupQ,
    "llm_embed_neardup" -> embedNearDup,
    "llm_exact_dedup"  -> exactDedup,
    "llm_minhash_lsh"  -> minhashLsh,
    "llm_edit_neardup" -> editNearDup,
    "llm_wordlist_filter" -> wordlistFilter,
    "llm_weighted_sample" -> weightedSampleQ,
    "llm_ccnet_buckets" -> ccnetBuckets,
    "llm_dedup_clusters" -> dedupClusters,
    "llm_graph_stats"  -> graphStatsQ,
    "llm_keep_best"    -> keepBestQ,
    "llm_corpus_diff"  -> corpusDiffQ,
    "llm_components_chain" -> componentsChain,
    "llm_pii_scrub"    -> piiScrub,
    "llm_unicode_norm" -> unicodeNorm,
    "llm_lm_score"     -> lmScore,
    "llm_tfidf"        -> tfidf,
    "llm_bm25"         -> bm25Q,
    "llm_clean_corpus" -> cleanCorpus,
    "llm_filtered_topk" -> filteredTopK,
    "llm_simhash"      -> simhash,
    "llm_simhash_pairs" -> simhashPairs,
    "llm_char_jaccard" -> charJaccard,
    "llm_cosine_topk"  -> cosineTopK,
    "llm_binary_quant" -> binaryQuantQ,
    "llm_ivf_topk"     -> ivfTopK,
    "llm_ivf_multiprobe" -> ivfMultiProbe,
    "llm_ivf_pq"       -> ivfPq,
    "llm_ivf_pq_probe" -> ivfPqProbe,
    "llm_image_neardup" -> imageNearDup,
    "llm_audio_neardup" -> audioNearDup,
    "llm_frame_sample" -> frameSampleQ,
    "llm_resize"       -> resizeQ,
    "llm_video_neardup" -> videoNearDupQ,
    "llm_langid"       -> langId,
    "llm_quality"      -> quality,
    "llm_tokens"       -> tokens,
    "llm_fingerprint"  -> fingerprintQ,
    "llm_winnow"       -> winnowQ,
    "llm_multimodal"   -> multimodal,
    "llm_repetition"   -> repetition,
    "llm_repetition_lines" -> repetitionLines,
    "llm_line_scrub"   -> lineScrub,
    "llm_profile"      -> profile,
    "llm_hash_sample"  -> hashSample,
    "llm_shard_assign" -> shardAssignQ,
    "llm_neyman_alloc" -> neymanAllocQ,
    "llm_ks_drift"     -> ksDriftQ,
    "llm_langid_confusion" -> langidConfusionQ,
    "llm_mmr_rerank"   -> mmrRerankQ,
    "llm_mix_sources"  -> mixSources,
    "llm_quality_filter" -> qualityFilterQ,
    "llm_span_dedup"   -> spanDedupQ,
    "llm_containment"  -> containmentQ,
    "llm_domain_cap"   -> domainCap,
    "llm_split_assign" -> splitAssign,
    "llm_pack_sequences" -> packSeqs,
    "llm_semantic_pack" -> semanticPackQ,
    "llm_incremental_dedup" -> incrementalDedupQ,
    "llm_chunk"        -> chunk,
    "llm_decontaminate" -> decontaminate,
    "llm_collocations" -> collocations,
    "llm_doc_entropy"  -> docEntropy,
    "llm_source_overlap" -> sourceOverlapQ,
    "llm_js_divergence" -> jsDivergenceQ,
    "llm_dsir"         -> dsirQ,
    "llm_embed_outliers" -> embedOutliersQ,
    "llm_zipf"         -> zipfQ,
    "llm_heaps_law"    -> heapsQ,
    "llm_centroid_sim" -> centroidSimQ,
    "llm_unimax"       -> uniMaxQ,
    "llm_nb_classify"  -> nbClassify,
    "llm_paragraph_dedup" -> paragraphDedup,
    "llm_temperature_mix" -> temperatureMix,
    "llm_knn_join"     -> knnJoinQ,
    "llm_ann_recall"   -> annRecallQ,
    "llm_gram_novelty" -> gramNovelty,
    "llm_minhash_error" -> minhashErrorQ,
    "llm_kn_lm"        -> knLmQ,
    "llm_dirichlet_ql" -> dirichletQlQ,
    "llm_log_odds"     -> logOddsQ,
    "llm_sq8_topk"     -> sq8TopKQ,
    "llm_rrf_fusion"   -> rrfFusionQ,
    "llm_pagerank"     -> pageRankQ,
    "llm_cdc_dedup"    -> cdcDedupQ,
    "llm_bpe_train"    -> bpeTrainQ,
    "llm_bpe_encode"   -> bpeEncodeQ,
    "llm_unigram_train"  -> unigramTrainQ,
    "llm_unigram_encode" -> unigramEncodeQ,
    "llm_unigram_apply"  -> unigramApplyQ,
    "llm_pca_top"      -> pcaTopQ,
    "llm_abtt_topk"    -> abttTopKQ,
    "llm_hard_negatives" -> hardNegativesQ,
  )

  def oracleSql: Map[String, String] = Map(
    "llm_kmeans_ivf"   -> kmeansIvfSql,
    "llm_kcenter"      -> kcenterSql,
    "llm_jsonl_roundtrip" -> jsonlRoundtripSql,
    "llm_semantic_dedup" -> semanticDedupSql,
    "llm_embed_neardup" -> embedNearDupSql,
    "llm_exact_dedup"  -> exactDedupSql,
    "llm_minhash_lsh"  -> minhashLshSql,
    "llm_edit_neardup" -> editNearDupSql,
    "llm_wordlist_filter" -> wordlistFilterSql,
    "llm_weighted_sample" -> weightedSampleSql,
    "llm_ccnet_buckets" -> ccnetBucketsSql,
    "llm_dedup_clusters" -> dedupClustersSql,
    "llm_graph_stats"  -> graphStatsSql,
    "llm_keep_best"    -> keepBestSql,
    "llm_corpus_diff"  -> corpusDiffSql,
    "llm_components_chain" -> componentsChainSql,
    "llm_pii_scrub"    -> piiScrubSql,
    "llm_unicode_norm" -> unicodeNormSql,
    "llm_lm_score"     -> lmScoreSql,
    "llm_tfidf"        -> tfidfSql,
    "llm_bm25"         -> bm25Sql,
    "llm_clean_corpus" -> cleanCorpusSql,
    "llm_filtered_topk" -> filteredTopKSql,
    "llm_simhash"      -> simhashSql,
    "llm_simhash_pairs" -> simhashPairsSql,
    "llm_char_jaccard" -> charJaccardSql,
    "llm_cosine_topk"  -> cosineTopKSql,
    "llm_binary_quant" -> binaryQuantSql,
    "llm_ivf_topk"     -> ivfTopKSql,
    "llm_ivf_multiprobe" -> ivfMultiProbeSql,
    "llm_ivf_pq"       -> ivfPqSql,
    // shared verbatim: the probe path must land on the one-shot
    // form's exact rows (PqIndexSpec pins the frame equivalence)
    "llm_ivf_pq_probe" -> ivfPqSql,
    "llm_image_neardup" -> imageNearDupSql,
    "llm_audio_neardup" -> audioNearDupSql,
    "llm_frame_sample" -> frameSampleSql,
    "llm_resize"       -> resizeSql,
    "llm_video_neardup" -> videoNearDupSql,
    "llm_langid"       -> langIdSql,
    "llm_quality"      -> qualitySql,
    "llm_tokens"       -> tokensSql,
    "llm_fingerprint"  -> fingerprintSql,
    "llm_winnow"       -> winnowSql,
    "llm_multimodal"   -> multimodalSql,
    "llm_repetition"   -> repetitionSql,
    "llm_repetition_lines" -> repetitionLinesSql,
    "llm_line_scrub"   -> lineScrubSql,
    "llm_profile"      -> profileSql,
    "llm_hash_sample"  -> hashSampleSql,
    "llm_shard_assign" -> shardAssignSql,
    "llm_neyman_alloc" -> neymanAllocSql,
    "llm_ks_drift"     -> ksDriftSql,
    "llm_langid_confusion" -> langidConfusionSql,
    "llm_mmr_rerank"   -> mmrRerankSql,
    "llm_mix_sources"  -> mixSourcesSql,
    "llm_quality_filter" -> qualityFilterSql,
    "llm_span_dedup"   -> spanDedupSql,
    "llm_containment"  -> containmentSql,
    "llm_domain_cap"   -> domainCapSql,
    "llm_split_assign" -> splitAssignSql,
    "llm_pack_sequences" -> packSeqsSql,
    "llm_semantic_pack" -> semanticPackSql,
    "llm_incremental_dedup" -> incrementalDedupSql,
    "llm_chunk"        -> chunkSql,
    "llm_decontaminate" -> decontaminateSql,
    "llm_collocations" -> collocationsSql,
    "llm_doc_entropy"  -> docEntropySql,
    "llm_source_overlap" -> sourceOverlapSql,
    "llm_js_divergence" -> jsDivergenceSql,
    "llm_dsir"         -> dsirSql,
    "llm_embed_outliers" -> embedOutliersSql,
    "llm_zipf"         -> zipfSql,
    "llm_heaps_law"    -> heapsSql,
    "llm_centroid_sim" -> centroidSimSql,
    "llm_unimax"       -> uniMaxSql,
    "llm_nb_classify"  -> nbClassifySql,
    "llm_paragraph_dedup" -> paragraphDedupSql,
    "llm_temperature_mix" -> temperatureMixSql,
    "llm_knn_join"     -> knnJoinSql,
    "llm_ann_recall"   -> annRecallSql,
    "llm_gram_novelty" -> gramNoveltySql,
    "llm_minhash_error" -> minhashErrorSql,
    "llm_kn_lm"        -> knLmSql,
    "llm_dirichlet_ql" -> dirichletQlSql,
    "llm_log_odds"     -> logOddsSql,
    "llm_sq8_topk"     -> sq8TopKSql,
    "llm_rrf_fusion"   -> rrfFusionSql,
    "llm_pagerank"     -> pageRankSql,
    "llm_cdc_dedup"    -> cdcDedupSql,
    "llm_bpe_train"    -> bpeTrainSql,
    "llm_bpe_encode"   -> bpeEncodeSql,
    "llm_unigram_train"  -> unigramTrainSql,
    "llm_unigram_encode" -> unigramEncodeSql,
    "llm_unigram_apply"  -> unigramEncodeSql,
    "llm_pca_top"      -> pcaTopSql,
    "llm_abtt_topk"    -> abttTopKSql,
    "llm_hard_negatives" -> hardNegativesSql,
  )
}
