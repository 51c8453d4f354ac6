package graft.catalog

import graft.core.Tables
import graft.llm.{QualityRules, Similarity, Sketches, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Oracle._

/** Corpus-curation queries added in round 10: the Gopher rule filter
  * and margin-based pair mining. Same conventions as the other catalog
  * objects (column-name parity with the oracle, integer-exact cuts,
  * total ORDER BY).
  */
object CurationQueries {

  private def wordsSql(e: String): String =
    s"list_filter(string_split(trim($e), ' '), x -> x <> '')"

  // ------------------------------------------------ Gopher rule filter
  /** Per-document Gopher/MassiveText rule flags (Rae et al.,
    * arXiv:2112.11446 Table A1) over the full corpus, plus the
    * conjunction verdict. Rules in [[QualityRules]]; every threshold is
    * an integer cross-multiplication so the flags are engine-exact.
    */
  private def gopherRulesQ(s: SparkSession, d: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val ls = QualityRules.lines(col("text"))
    // fanOut: the rule pass is a CPU-bound regex kernel and a small
    // parquet is ONE split — without this it runs single-threaded
    // (measured: 2.5 s on one core at sf0.1 vs 1.0 s on 32 at 10x)
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("text"), ws.as("ws"), ls.as("ls"))
      .select(col("doc_id"), col("text"), col("ws"), col("ls"),
        size(col("ws")).cast("long").as("n_words"),
        QualityRules.sumWordLen(col("ws")).as("sum_len"))
      .select(col("doc_id"), col("n_words"),
        QualityRules.okWordCount(col("n_words")).as("ok_words"),
        QualityRules.okMeanWordLen(col("n_words"), col("sum_len")).as("ok_wordlen"),
        QualityRules.okSymbolRatio(col("text"), col("n_words")).as("ok_symbol"),
        QualityRules.okBulletLines(col("ls")).as("ok_bullet"),
        QualityRules.okEllipsisLines(col("ls")).as("ok_ellipsis"),
        QualityRules.okAlphaWords(col("ws"), col("n_words")).as("ok_alpha"),
        QualityRules.okStopwords(col("ws")).as("ok_stop"))
      .withColumn("keep",
        col("ok_words") && col("ok_wordlen") && col("ok_symbol") &&
          col("ok_bullet") && col("ok_ellipsis") && col("ok_alpha") && col("ok_stop"))
      .orderBy(col("doc_id"))
  }

  private val gopherRulesSql: String = {
    val stop = QualityRules.requiredStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |         ${wordsSql("text")} AS ws,
       |         list_filter(string_split(text, chr(10)), l -> length(l) > 0) AS ls
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, text, ws, ls,
       |         len(ws) AS n_words,
       |         CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS sum_len,
       |         len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS n_sym,
       |         len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]'))) AS n_bul,
       |         len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*${"$"}'))) AS n_ell,
       |         len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
       |         len(list_distinct(list_filter(ws, w -> lower(w) IN ($stop)))) AS n_stop,
       |         greatest(len(ls), 1) AS n_lines
       |  FROM base
       |)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |       n_words >= 50 AND n_words <= 100000 AS ok_words,
       |       n_words > 0 AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words AS ok_wordlen,
       |       n_words > 0 AND 10 * n_sym < n_words AS ok_symbol,
       |       10 * n_bul < 9 * n_lines AS ok_bullet,
       |       10 * n_ell < 3 * n_lines AS ok_ellipsis,
       |       n_words > 0 AND 5 * n_alpha >= 4 * n_words AS ok_alpha,
       |       n_stop >= 2 AS ok_stop,
       |       (n_words >= 50 AND n_words <= 100000)
       |         AND (n_words > 0 AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
       |         AND (n_words > 0 AND 10 * n_sym < n_words)
       |         AND (10 * n_bul < 9 * n_lines)
       |         AND (10 * n_ell < 3 * n_lines)
       |         AND (n_words > 0 AND 5 * n_alpha >= 4 * n_words)
       |         AND (n_stop >= 2) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------- margin-based mining
  /** [[Similarity.marginMine]] between the even- and odd-label halves
    * of the embeddings table: best cross-set match per even-side
    * vector, ratio-margin scored (Artetxe & Schwenk ACL 2019), top 40
    * pairs.
    */
  private def marginMineQ(s: SparkSession, d: String): DataFrame =
    Similarity.marginMine(Tables.embeddings(s, d), col("vec_id"),
        col("embedding"), col("label") % 2 === 0, k = 4, topN = 40)
      .select(col("x"), col("y"), r4(col("cos_sim")).as("cos_sim"),
        r4(col("margin")).as("margin"))
      .orderBy(col("margin").desc, col("x"), col("y"))

  private val marginMineSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), a AS (SELECT vec_id AS x, v AS va FROM e WHERE label % 2 = 0),
       |b AS (SELECT vec_id AS y, v AS vb FROM e WHERE label % 2 <> 0),
       |p AS (
       |  SELECT x, y,
       |         CAST(floor(list_dot_product(va, vb)
       |             / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
       |             * 1000000.0 + 0.5) AS BIGINT) AS c
       |  FROM a, b
       |), rx AS (
       |  SELECT x, y, c,
       |         row_number() OVER (PARTITION BY x ORDER BY c DESC, y) AS rx
       |  FROM p
       |), ry AS (
       |  SELECT x, y, c,
       |         row_number() OVER (PARTITION BY y ORDER BY c DESC, x) AS ry
       |  FROM p
       |), axf AS (
       |  SELECT x, CAST(sum(c) AS BIGINT) AS ax, count(*) AS nx
       |  FROM rx WHERE rx <= 4 GROUP BY 1
       |), byf AS (
       |  SELECT y, CAST(sum(c) AS BIGINT) AS bsum, count(*) AS ny
       |  FROM ry WHERE ry <= 4 GROUP BY 1
       |), best AS (SELECT x, y, c FROM rx WHERE rx = 1),
       |scored AS (
       |  SELECT best.x, best.y, c / 1000000.0 AS cos_sim,
       |         (2.0 * c * nx * ny) / CAST(ax * ny + bsum * nx AS DOUBLE) AS margin
       |  FROM best JOIN axf USING (x) JOIN byf USING (y)
       |  WHERE ax * ny + bsum * nx <> 0
       |  ORDER BY margin DESC, x, y LIMIT 40
       |)
       |SELECT x, y, ${r4Sql("cos_sim")} AS cos_sim, ${r4Sql("margin")} AS margin
       |FROM scored ORDER BY ${r4Sql("margin")} DESC, x, y""".stripMargin

  /** [[Similarity.cellMarginMine]] — the 100 TB margin-mining path at
    * a REAL cell count (kCells=4, 3 Lloyd iterations — not the
    * kCells=1 ≡ brute degenerate the spec pins): k-means fit on side
    * A, both sides assigned, only same-cell pairs scored. The oracle
    * unrolls the SAME Lloyd fit in SQL (the llm_semantic_dedup
    * pattern; kmeansIvfSql's fixture-stability caveat applies) and
    * reproduces the cell-bounded candidate join + margin arithmetic
    * verbatim, so the driver hash-checks the scale form itself, not a
    * degenerate of it.
    */
  private def marginMineCellsQ(s: SparkSession, d: String): DataFrame =
    // fanOut: kMeans fit/assign map passes over the single-row-group
    // embeddings scan ran single-task (GenFilterScan round 14c)
    Similarity.cellMarginMine(Tables.fanOut(Tables.embeddings(s, d)), col("vec_id"),
        col("embedding"), col("label") % 2 === 0,
        kCells = 4, iters = 3, k = 4, topN = 40)
      .select(col("x"), col("y"), r4(col("cos_sim")).as("cos_sim"),
        r4(col("margin")).as("margin"))
      .orderBy(col("margin").desc, col("x"), col("y"))

  private val marginMineCellsSql: String = {
    val kCells = 4; val iters = 3; val dimPlus1 = 65
    def centsCte(i: Int, from: String): String =
      s"""mcomp$i AS (
         |  SELECT cell, i, avg(v[i]) AS c
         |  FROM $from CROSS JOIN (SELECT i FROM range(1, $dimPlus1) t(i))
         |  GROUP BY 1, 2
         |), mcents$i AS (SELECT cell, list(c ORDER BY i) AS centroid FROM mcomp$i GROUP BY 1)"""
        .stripMargin
    def d2Sql(v: String, c: String): String =
      s"list_sum(list_transform(range(1, $dimPlus1), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assignCte(name: String, src: String, cents: String): String =
      s"""$name AS (
         |  SELECT id, v, cell FROM (
         |    SELECT p.id, p.v, c.cell,
         |           row_number() OVER (PARTITION BY p.id
         |             ORDER BY ${d2Sql("p.v", "c.centroid")}, c.cell) AS rn
         |    FROM $src p CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      assignCte(s"massign$i", "pa", s"mcents${i - 1}") + ",\n" +
        centsCte(i, s"massign$i")
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), pa AS (SELECT vec_id AS id, v FROM e WHERE label % 2 = 0),
       |pb AS (SELECT vec_id AS id, v FROM e WHERE label % 2 <> 0),
       |mcents0 AS (
       |  SELECT (row_number() OVER (ORDER BY id)) - 1 AS cell, v AS centroid
       |  FROM pa QUALIFY row_number() OVER (ORDER BY id) <= $kCells
       |),
       |$iterCtes,
       |${assignCte("acell", "pa", s"mcents$iters")},
       |${assignCte("bcell", "pb", s"mcents$iters")},
       |p AS (
       |  SELECT a.id AS x, b.id AS y,
       |         CAST(floor(list_dot_product(a.v, b.v)
       |             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |             * 1000000.0 + 0.5) AS BIGINT) AS c
       |  FROM acell a JOIN bcell b USING (cell)
       |), rx AS (
       |  SELECT x, y, c,
       |         row_number() OVER (PARTITION BY x ORDER BY c DESC, y) AS rx
       |  FROM p
       |), ry AS (
       |  SELECT x, y, c,
       |         row_number() OVER (PARTITION BY y ORDER BY c DESC, x) AS ry
       |  FROM p
       |), axf AS (
       |  SELECT x, CAST(sum(c) AS BIGINT) AS ax, count(*) AS nx
       |  FROM rx WHERE rx <= 4 GROUP BY 1
       |), byf AS (
       |  SELECT y, CAST(sum(c) AS BIGINT) AS bsum, count(*) AS ny
       |  FROM ry WHERE ry <= 4 GROUP BY 1
       |), best AS (SELECT x, y, c FROM rx WHERE rx = 1),
       |scored AS (
       |  SELECT best.x, best.y, c / 1000000.0 AS cos_sim,
       |         (2.0 * c * nx * ny) / CAST(ax * ny + bsum * nx AS DOUBLE) AS margin
       |  FROM best JOIN axf USING (x) JOIN byf USING (y)
       |  WHERE ax * ny + bsum * nx <> 0
       |  ORDER BY margin DESC, x, y LIMIT 40
       |)
       |SELECT x, y, ${r4Sql("cos_sim")} AS cos_sim, ${r4Sql("margin")} AS margin
       |FROM scored ORDER BY ${r4Sql("margin")} DESC, x, y""".stripMargin
  }

  // ------------------------------------- distinct-count sketches
  /** Word-5-gram shingles per source — deliberately NOT deduped:
    * both sketches absorb duplicates by construction, which is what
    * makes them one-pass at 100 TB.
    */
  private def sourceGrams(s: SparkSession, d: String): DataFrame =
    // explode_outer + null filter: the plain generator's inferred
    // size>0 filter pushes below the fanOut exchange and re-shingles
    // the corpus in the scan task (the round-14c pushed-filter class;
    // PlanShapeSpec pins the behavior)
    Tables.fanOut(Tables.documents(s, d))
      .select(col("source"),
        explode_outer(TextOps.wordNgrams(TextOps.words(col("text")), 5)).as("g"))
      .filter(col("g").isNotNull)

  private val sourceGramsSql: String =
    s"""WITH dd AS (
       |  SELECT source, ${wordsSql("text")} AS w FROM documents
       |), g AS (
       |  SELECT source, unnest(CASE WHEN len(w) >= 5
       |    THEN list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS g
       |  FROM dd
       |)""".stripMargin

  // --------------------------------------------------- Bloom filter
  /** [[Sketches.bloomBuild]] + [[Sketches.bloomMightContain]] — the
    * membership prefilter over the reference source's 5-gram set
    * (the lexicographically-first source is the "blocklist"): every
    * other source's distinct grams probe the sketch, and the output
    * pins the two properties a deployment sizes by, per source:
    * NO false negatives (n_maybe ≥ n_true row by row — every truly
    * shared gram is maybe-present) and the measured false-positive
    * rate among genuinely-absent grams. All integer counts; the only
    * float is the final r4'd rate. At 100 TB the sketch (≤ 2^18 bits
    * here) broadcasts and the probe is map-side — the exact join
    * runs only on the maybe sliver.
    */
  private def bloomFilterQ(s: SparkSession, d: String): DataFrame = {
    // one shingle kernel pass: the distinct (source, gram) posting
    // frame is checkpointed and feeds all four consumers (ref-source
    // scalar, sketch build, probes, truth set) — each previously
    // re-ran the tokenize+5-gram kernel (RecomputeScan r15: four
    // kernel-class jobs). Distinct-first is bit-identical for the
    // sketch (duplicate grams set the same bits) and was already the
    // probe/truth semantics.
    val grams = sourceGrams(s, d).select(col("source"), col("g")).distinct()
      .localCheckpoint(false)
    val refS = grams.groupBy().agg(min(col("source")).as("source"))
    val refGrams = grams.join(broadcast(refS), "source").select(col("g"))
    val bloom = Sketches.bloomBuild(refGrams, lit(0L), col("g"))
    val probes = grams.join(broadcast(refS), Seq("source"), "left_anti")
      .select(col("source"), col("g"))
    val maybe = Sketches.bloomMightContain(bloom, probes, lit(0L), col("g"),
      carry = Seq(col("source")))
    val refSet = refGrams.select(col("g"), lit(1L).as("in_ref"))
    maybe.select(col("source"), col("key").as("g"), col("maybe"))
      .join(refSet, Seq("g"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("in_ref").isNotNull, 1L).otherwise(0L)).as("n_true"))
      .select(col("source"), col("n_probes"), col("n_maybe"), col("n_true"),
        (col("n_maybe") - col("n_true")).as("n_fp"),
        r4(when(col("n_probes") > col("n_true"),
          (col("n_maybe") - col("n_true")).cast("double") /
            (col("n_probes") - col("n_true")).cast("double"))
          .otherwise(lit(0.0d))).as("fp_rate"))
      .orderBy(col("source"))
  }

  private val bloomFilterSql: String =
    s"""$sourceGramsSql, refs AS (
       |  SELECT min(source) AS rs FROM g
       |), ref AS (
       |  SELECT DISTINCT g.g FROM g, refs WHERE g.source = rs
       |), pos AS (
       |  SELECT g, CAST(('0x' || substring(md5(g), 1 + 6 * CAST(i AS INTEGER), 6)) AS BIGINT)
       |            % 262144 AS p
       |  FROM ref CROSS JOIN (SELECT unnest(range(4)) AS i)
       |), bloom AS (
       |  SELECT p // 32 AS w,
       |         bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits
       |  FROM pos GROUP BY 1
       |), probes AS (
       |  SELECT DISTINCT source, g.g FROM g, refs WHERE g.source <> rs
       |), pp AS (
       |  SELECT source, g,
       |         CAST(('0x' || substring(md5(g), 1 + 6 * CAST(i AS INTEGER), 6)) AS BIGINT)
       |         % 262144 AS p
       |  FROM probes CROSS JOIN (SELECT unnest(range(4)) AS i)
       |), hit AS (
       |  SELECT source, g,
       |         min(CASE WHEN (coalesce(bits, 0) & (1::BIGINT << CAST(p % 32 AS INTEGER))) <> 0
       |                  THEN 1 ELSE 0 END) AS all_hit
       |  FROM pp LEFT JOIN bloom ON bloom.w = pp.p // 32
       |  GROUP BY 1, 2
       |), tagged AS (
       |  SELECT h.source, h.g, h.all_hit,
       |         CASE WHEN r.g IS NOT NULL THEN 1 ELSE 0 END AS in_ref
       |  FROM hit h LEFT JOIN ref r ON r.g = h.g
       |), agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_probes,
       |         CAST(sum(all_hit) AS BIGINT) AS n_maybe,
       |         CAST(sum(in_ref) AS BIGINT) AS n_true
       |  FROM tagged GROUP BY 1
       |)
       |SELECT source, n_probes, n_maybe, n_true,
       |       CAST(n_maybe - n_true AS BIGINT) AS n_fp,
       |       ${r4Sql("CASE WHEN n_probes > n_true THEN " +
                       "CAST(n_maybe - n_true AS DOUBLE) / CAST(n_probes - n_true AS DOUBLE) " +
                       "ELSE 0.0 END")} AS fp_rate
       |FROM agg ORDER BY source""".stripMargin

  /** [[Sketches.hllEstimate]] vs the exact distinct count, per
    * source — the estimate, the exact, and the relative error the
    * deployment would size registers against.
    */
  private def hllDistinctQ(s: SparkSession, d: String): DataFrame = {
    // shared kernel (RecomputeScan r15: twin 7.0 + 6.4 s CPU jobs —
    // the sketch and the exact audit each re-hashed the gram stream):
    // hash once into a distinct (source, md5) frame; HLL registers
    // are duplicate-insensitive so they read identically off it, and
    // the exact distinct count is its per-source row count (the
    // kmv_setops digest-equality convention: set identity survives
    // md5 at 2^-128)
    val dh = sourceGrams(s, d)
      .select(col("source"), md5(col("g")).as("h")).distinct()
      .localCheckpoint(false)
    val exact = dh.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    Sketches.hllFromRegisters(
        Sketches.hllRegistersOfHash(dh, col("source"), col("h")))
      .withColumnRenamed("g", "source")
      .join(exact, "source")
      .select(col("source"), col("n_exact"), r4(col("est")).as("est"),
        r4(abs(col("est") - col("n_exact")) / col("n_exact").cast("double")).as("rel_err"))
      .orderBy(col("source"))
  }

  private val hllDistinctSql: String = {
    val lzCase =
      """CASE WHEN substr(lt, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
        |      WHEN substr(lt, 1, 1) IN ('4','5','6','7') THEN 1
        |      WHEN substr(lt, 1, 1) IN ('2','3') THEN 2
        |      WHEN substr(lt, 1, 1) = '1' THEN 3
        |      ELSE 4 END""".stripMargin
    s"""$sourceGramsSql, hx AS (
       |  SELECT source, md5(g) AS h,
       |         ltrim(substr(md5(g), 3, 10), '0') AS lt
       |  FROM g
       |), r AS (
       |  SELECT source, substr(h, 1, 2) AS bucket,
       |         CASE WHEN length(lt) = 0 THEN 41
       |              ELSE 4 * (10 - length(lt)) + $lzCase + 1 END AS rank
       |  FROM hx
       |), regs AS (
       |  SELECT source, bucket, max(rank) AS m FROM r GROUP BY 1, 2
       |), agg AS (
       |  SELECT source,
       |         CAST(sum(CAST(1 AS BIGINT) << (41 - m)) AS BIGINT) AS sp,
       |         count(*) AS present
       |  FROM regs GROUP BY 1
       |), est AS (
       |  SELECT source, present,
       |         (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
       |           * CAST(CAST(1 AS BIGINT) << 41 AS DOUBLE)
       |           / CAST(sp + (256 - present) * (CAST(1 AS BIGINT) << 41) AS DOUBLE) AS raw
       |  FROM agg
       |), corrected AS (
       |  SELECT source,
       |         CASE WHEN raw <= 640.0 AND 256 - present > 0
       |              THEN 256.0 * ln(256.0 / CAST(256 - present AS DOUBLE))
       |              ELSE raw END AS est
       |  FROM est
       |), exact AS (
       |  SELECT source, count(DISTINCT g) AS n_exact FROM g GROUP BY 1
       |)
       |SELECT source, n_exact, ${r4Sql("est")} AS est,
       |       ${r4Sql("abs(est - n_exact) / CAST(n_exact AS DOUBLE)")} AS rel_err
       |FROM corrected JOIN exact USING (source)
       |ORDER BY source""".stripMargin
  }

  /** [[Sketches.kmvKthMin]] (k = 256) vs the exact distinct count. */
  private def kmvDistinctQ(s: SparkSession, d: String): DataFrame = {
    // same shared-kernel move as hllDistinctQ: the KMV uniform is a
    // pure function of the md5 hex, and KmvAgg keeps DISTINCT
    // uniforms anyway, so both paths read one hashed-distinct frame
    val dh = sourceGrams(s, d)
      .select(col("source"), md5(col("g")).as("h")).distinct()
      .localCheckpoint(false)
    val exact = dh.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    Sketches.kmvKthMinOfHash(dh, col("source"), col("h"), 256)
      .withColumnRenamed("g", "source")
      .join(exact, "source")
      .select(col("source"), col("n_exact"), r4(col("est")).as("est"),
        r4(abs(col("est") - col("n_exact")) / col("n_exact").cast("double")).as("rel_err"))
      .orderBy(col("source"))
  }

  private val kmvDistinctSql: String =
    s"""$sourceGramsSql, u AS (
       |  SELECT source,
       |         (CAST(('0x' || substring(md5(g), 1, 13)) AS UBIGINT) + 0.5)
       |           / 4503599627370496.0 AS u
       |  FROM g
       |), ranked AS (
       |  SELECT source, u,
       |         dense_rank() OVER (PARTITION BY source ORDER BY u) AS dr
       |  FROM u
       |), kth AS (
       |  SELECT source, min(u) AS u_k FROM ranked WHERE dr = 256 GROUP BY 1
       |), exact AS (
       |  SELECT source, count(DISTINCT g) AS n_exact FROM g GROUP BY 1
       |)
       |SELECT source, n_exact, ${r4Sql("255.0 / u_k")} AS est,
       |       ${r4Sql("abs(255.0 / u_k - n_exact) / CAST(n_exact AS DOUBLE)")} AS rel_err
       |FROM kth JOIN exact USING (source)
       |ORDER BY source""".stripMargin

  /** [[Sketches.countMin]] + [[Sketches.countMinLookup]]: the exact
    * top-20 words vs their count-min estimates, with the overcount
    * each collision adds. Everything is integer counts — no floats
    * anywhere — and the CM upper-bound property (`n_est ≥ n_exact`)
    * is visible row by row in the checked output.
    */
  private def countMinQ(s: SparkSession, d: String): DataFrame = {
    // shared kernel (RecomputeScan r15: twin 5.2 + 4.8 s CPU jobs):
    // one word-keyed count frame feeds BOTH the sketch (as weighted
    // increments — cell sums of per-word counts are identical to
    // per-occurrence increments) and the exact top-20. The sketch's
    // probe explode then runs over the vocabulary, not the corpus.
    val counts = Tables.fanOut(Tables.documents(s, d))
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
      .localCheckpoint(false)
    val cm = Sketches.countMin(counts, lit(0L), col("w"),
      weight = col("n_exact"))
    val top = counts
      .orderBy(col("n_exact").desc, col("w")).limit(20)
    val est = Sketches.countMinLookup(cm, top.select(col("w")), lit(0L), col("w"))
    top.join(est.select(col("key").as("w"), col("est")), Seq("w"))
      .select(col("w"), col("n_exact"), col("est").as("n_est"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("w"))
  }

  private val countMinSql: String =
    s"""WITH wd AS (
       |  SELECT unnest(${wordsSql("text")}) AS w FROM documents
       |), probes AS (
       |  SELECT w, r, substring(md5(w), 1 + 3 * CAST(r AS INTEGER), 3) AS b
       |  FROM wd CROSS JOIN (SELECT unnest(range(4)) AS r)
       |), cm AS (
       |  SELECT r, b, count(*) AS c FROM probes GROUP BY 1, 2
       |), ex AS (
       |  SELECT w, count(*) AS n_exact FROM wd GROUP BY 1
       |), top AS (
       |  SELECT w, n_exact FROM ex ORDER BY n_exact DESC, w LIMIT 20
       |), keyprobes AS (
       |  SELECT t.w, r, substring(md5(t.w), 1 + 3 * CAST(r AS INTEGER), 3) AS b
       |  FROM top t CROSS JOIN (SELECT unnest(range(4)) AS r)
       |), est AS (
       |  SELECT k.w, min(c.c) AS n_est
       |  FROM keyprobes k JOIN cm c ON c.r = k.r AND c.b = k.b GROUP BY 1
       |)
       |SELECT t.w, t.n_exact, CAST(e.n_est AS BIGINT) AS n_est,
       |       CAST(e.n_est - t.n_exact AS BIGINT) AS overcount
       |FROM top t JOIN est e ON e.w = t.w
       |ORDER BY t.n_exact DESC, t.w""".stripMargin

  /** [[Sketches.kmvSetOps]] — corpus-overlap set algebra on sketches
    * alone: per source pair, the KMV union / intersection / Jaccard
    * estimates (k = 256) next to the exact gram Jaccard they
    * approximate. At 100 TB only the ≤ k-row sketches ever meet; the
    * exact columns exist to pin the estimator and measure its error.
    */
  private def kmvSetOpsQ(s: SparkSession, d: String): DataFrame = {
    val grams = sourceGrams(s, d)
    // exact calibration joins on the 16-byte md5 of the gram, not the
    // gram text: set equality survives hashing (collisions 2^-128),
    // and the distinct + self-join shuffles shrink to digest width —
    // the llm_span_dedup lesson; the oracle hashes identically
    // dg feeds three consumers (sizes + both self-join legs) — the
    // checkpoint runs the shingle+md5+distinct kernel once; the
    // NUMBERED repartition keeps the distinct's byte-small, CPU-dense
    // final stage out of AQE's single-task coalescing (GenFilterScan
    // r15: 396-423 ms/1t). Join-leg repartitions were A/B'd and
    // REVERTED — the two extra exchanges cost what the freed stage
    // saved (interleaved pairs, r15; the r14c fanOut lesson again).
    val dg = grams.select(col("source"), md5(col("g")).as("h"))
      .repartition(s.sparkContext.defaultParallelism, col("source"), col("h"))
      .distinct()
      .localCheckpoint(false)
    // the SKETCH side reads the same hashed-distinct frame (r15
    // shared-kernel move, see hllDistinctQ): the KMV uniform is a
    // pure function of the md5 hex, so the sketch path no longer
    // re-shingles the corpus
    val ops = Sketches.kmvSetOps(
      Sketches.kmvMinsOfHash(dg, col("source"), col("h"), 256), 256)
    val sizes = dg.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = dg.select(col("source").as("sa"), col("h"))
      .join(dg.select(col("source").as("sb"), col("h")), Seq("h"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("ni"))
    ops.join(inter, Seq("sa", "sb"), "left")
      .join(sizes.select(col("source").as("sa"), col("n").as("na")), Seq("sa"))
      .join(sizes.select(col("source").as("sb"), col("n").as("nb")), Seq("sb"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        r4(col("jac_est")).as("jac_est"),
        r4(col("est_union")).as("est_union"),
        r4(col("est_inter")).as("est_inter"),
        r4(coalesce(col("ni"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("ni"), lit(0L))).cast("double"))
          .as("jac_exact"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private val kmvSetOpsSql: String =
    s"""$sourceGramsSql, du AS (
       |  SELECT DISTINCT source,
       |         (CAST(('0x' || substring(md5(g), 1, 13)) AS UBIGINT) + 0.5)
       |           / 4503599627370496.0 AS u
       |  FROM g
       |), rk AS (
       |  SELECT source, u,
       |         dense_rank() OVER (PARTITION BY source ORDER BY u) AS dr
       |  FROM du
       |), mins AS (SELECT source, u FROM rk WHERE dr <= 256
       |), srcs AS (SELECT DISTINCT source FROM mins
       |), pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source
       |), cu AS (
       |  SELECT p.sa, p.sb, m.u,
       |         max(CASE WHEN m.source = p.sa THEN 1 ELSE 0 END) AS ina,
       |         max(CASE WHEN m.source = p.sb THEN 1 ELSE 0 END) AS inb
       |  FROM pairs p JOIN mins m ON m.source = p.sa OR m.source = p.sb
       |  GROUP BY 1, 2, 3
       |), agg AS (
       |  SELECT sa, sb,
       |         min(CASE WHEN dr = 256 THEN u END) AS u_k,
       |         CAST(sum(CASE WHEN dr <= 256 AND ina = 1 AND inb = 1
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS cnt
       |  FROM (SELECT sa, sb, u, ina, inb,
       |               dense_rank() OVER (PARTITION BY sa, sb ORDER BY u) AS dr
       |        FROM cu)
       |  GROUP BY 1, 2
       |), dg AS (SELECT DISTINCT source, md5(g) AS h FROM g
       |), sizes AS (SELECT source, count(*) AS n FROM dg GROUP BY 1
       |), inter AS (
       |  SELECT a.source AS sa, b.source AS sb, count(*) AS ni
       |  FROM dg a JOIN dg b ON a.h = b.h AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT t.sa AS source_a, t.sb AS source_b,
       |       ${r4Sql("CAST(cnt AS DOUBLE) / 256")} AS jac_est,
       |       ${r4Sql("255.0 / u_k")} AS est_union,
       |       ${r4Sql("(CAST(cnt AS DOUBLE) / 256) * (255.0 / u_k)")} AS est_inter,
       |       ${r4Sql("CAST(COALESCE(ni, 0) AS DOUBLE) / " +
                       "CAST(an.n + bn.n - COALESCE(ni, 0) AS DOUBLE)")} AS jac_exact
       |FROM agg t
       |LEFT JOIN inter i ON i.sa = t.sa AND i.sb = t.sb
       |JOIN sizes an ON an.source = t.sa
       |JOIN sizes bn ON bn.source = t.sb
       |WHERE u_k IS NOT NULL
       |ORDER BY 1, 2""".stripMargin

  /** The sketch path of `llm_kmv_setops` ALONE — no exact-Jaccard
    * audit columns: per source-pair union/intersection/Jaccard
    * estimates off the merged k-minimum-values sketches, O(sources·k)
    * after the one corpus pass. This is the query a 100 TB deployment
    * actually runs (the exact audit twin exists to calibrate it);
    * splitting it gives the sketch algebra its own bench price —
    * `llm_kmv_setops`' measured cost/exponent belongs to its exact
    * audit columns (SCALING.json note, VERDICT r14 item 4).
    */
  private def kmvSketchQ(s: SparkSession, d: String): DataFrame =
    Sketches.kmvSetOps(
        Sketches.kmvMins(sourceGrams(s, d), col("source"), col("g"), 256), 256)
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        r4(col("jac_est")).as("jac_est"),
        r4(col("est_union")).as("est_union"),
        r4(col("est_inter")).as("est_inter"))
      .orderBy(col("source_a"), col("source_b"))

  private val kmvSketchSql: String =
    s"""$sourceGramsSql, du AS (
       |  SELECT DISTINCT source,
       |         (CAST(('0x' || substring(md5(g), 1, 13)) AS UBIGINT) + 0.5)
       |           / 4503599627370496.0 AS u
       |  FROM g
       |), rk AS (
       |  SELECT source, u,
       |         dense_rank() OVER (PARTITION BY source ORDER BY u) AS dr
       |  FROM du
       |), mins AS (SELECT source, u FROM rk WHERE dr <= 256
       |), srcs AS (SELECT DISTINCT source FROM mins
       |), pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source
       |), cu AS (
       |  SELECT p.sa, p.sb, m.u,
       |         max(CASE WHEN m.source = p.sa THEN 1 ELSE 0 END) AS ina,
       |         max(CASE WHEN m.source = p.sb THEN 1 ELSE 0 END) AS inb
       |  FROM pairs p JOIN mins m ON m.source = p.sa OR m.source = p.sb
       |  GROUP BY 1, 2, 3
       |), agg AS (
       |  SELECT sa, sb,
       |         min(CASE WHEN dr = 256 THEN u END) AS u_k,
       |         CAST(sum(CASE WHEN dr <= 256 AND ina = 1 AND inb = 1
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS cnt
       |  FROM (SELECT sa, sb, u, ina, inb,
       |               dense_rank() OVER (PARTITION BY sa, sb ORDER BY u) AS dr
       |        FROM cu)
       |  GROUP BY 1, 2
       |)
       |SELECT sa AS source_a, sb AS source_b,
       |       ${r4Sql("CAST(cnt AS DOUBLE) / 256")} AS jac_est,
       |       ${r4Sql("255.0 / u_k")} AS est_union,
       |       ${r4Sql("(CAST(cnt AS DOUBLE) / 256) * (255.0 / u_k)")} AS est_inter
       |FROM agg WHERE u_k IS NOT NULL
       |ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_kmv_setops"   -> kmvSetOpsQ,
    "llm_kmv_sketch"   -> kmvSketchQ,
    "llm_gopher_rules" -> gopherRulesQ,
    "llm_margin_mine"  -> marginMineQ,
    "llm_margin_mine_cells" -> marginMineCellsQ,
    "llm_hll_distinct" -> hllDistinctQ,
    "llm_kmv_distinct" -> kmvDistinctQ,
    "llm_count_min"    -> countMinQ,
    "llm_bloom_filter" -> bloomFilterQ,
  )

  def oracleSql: Map[String, String] = Map(
    "llm_kmv_setops"   -> kmvSetOpsSql,
    "llm_kmv_sketch"   -> kmvSketchSql,
    "llm_gopher_rules" -> gopherRulesSql,
    "llm_margin_mine"  -> marginMineSql,
    "llm_margin_mine_cells" -> marginMineCellsSql,
    "llm_hll_distinct" -> hllDistinctSql,
    "llm_kmv_distinct" -> kmvDistinctSql,
    "llm_count_min"    -> countMinSql,
    "llm_bloom_filter" -> bloomFilterSql,
  )
}
