package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistical profiling for training-data curation:
  * PMI collocation mining and per-document byte-entropy scoring.
  *
  * Scale design: both ops are pure aggregation pipelines — every
  * explode is pipeline-local (WholeStageCodegen consumes it before
  * any exchange) and every shuffle carries partially-aggregated
  * counts, so shuffle volume is bounded by DISTINCT keys (vocabulary
  * / bigram types / ≤256 byte values per doc), not corpus tokens.
  */
object CorpusStats {

  /** Lowercase ASCII-alpha word tokens — the deterministic tokenizer
    * shared by both engines (`regexp_extract_all` over `[a-z]+`).
    */
  def alphaTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** PMI-ranked adjacent word pairs (Church & Hanks, "Word
    * Association Norms, Mutual Information, and Lexicography", CL
    * 1990): pmi = ln((c12/B) / ((c1/N)·(c2/N))) with N = total
    * tokens, B = total adjacent pairs, over all documents. Pairs
    * below `minCount` occurrences are pruned BEFORE the unigram
    * joins, so the join probe side is only the surviving pair types.
    *
    * Shape: two explode→count aggregations (map-side combined) + two
    * joins on the pruned pair table + one 1-row totals crossJoin —
    * at 100 TB the heavy stages shuffle distinct grams only, and AQE
    * broadcasts the pruned pair side of the joins when it is small.
    */
  def pmiTopK(docs: DataFrame, text: Column, minCount: Long, k: Int): DataFrame = {
    // lazy-checkpointed: ts feeds FOUR planned subtrees (unigram agg,
    // both join legs of it, totals, pairs), and the size(ts)>0 filter
    // substitution doubles the extract within each — DupExprAudit
    // counted the tokenize regex 11x in the optimized plan. One
    // materialization caps it. Measured 1.68 -> 1.54 s at sf0.1 —
    // modest locally (exchange reuse already deduped the join legs at
    // execution), but the per-char regex now runs once per document
    // instead of up to 11x, which is the term that scales with data.
    val toks = docs.filter(text.isNotNull)
      .select(alphaTokens(text).as("ts"))
      .filter(size(col("ts")) > 0)
      .localCheckpoint(false)
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // totals: one row (N tokens, B adjacent pairs) — B counts every
    // adjacent pair, including those later pruned by minCount
    val totals = toks.agg(
      sum(size(col("ts"))).as("n"),
      sum(greatest(size(col("ts")) - 1, lit(0))).as("btot"))
    val pairs = toks.filter(size(col("ts")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ts")) - 2),
        i => struct(element_at(col("ts"), i + 1).as("w1"),
          element_at(col("ts"), i + 2).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"),
        log((col("c12").cast("double") / col("btot").cast("double")) /
          ((col("c1").cast("double") / col("n").cast("double")) *
            (col("c2").cast("double") / col("n").cast("double")))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Cross-source verbatim overlap matrix — the corpus-composition
    * audit run before mixing sources into a training set (how much of
    * source B is already in source A, and how contaminated is the mix
    * overall). For every pair of `group` values sharing at least one
    * distinct word n-gram: the shared-gram count, Jaccard similarity
    * of the gram sets, and containment (shared / smaller set).
    * Non-overlapping pairs are omitted — their row would be all-zero.
    *
    * Scale: ONE gram-keyed shuffle — `groupBy(gram).collect_set(src)`
    * (sets dedup map-side in the partial aggregation, and |set| ≤
    * |S|, which is small: a corpus has tens of sources, not
    * millions) — then both the per-source distinct-gram counts and
    * the pair intersections derive from the per-gram source sets
    * with pipeline-local explodes and map-side-combined counts. The
    * first version self-joined the distinct (src, gram) frame on the
    * gram — same semantics, but three full-width shuffles of raw
    * gram strings (distinct + two join sides); measured at a 10x
    * corpus the set form cut the query 13.0 s → 4.0 s and the scale
    * exponent 0.81 → 0.32 (see SCALE.md).
    */
  /** Two-sample Kolmogorov–Smirnov distance between every pair of
    * groups over an integer-valued column — the distribution-drift
    * screen ("did source B's length profile shift away from A's?") a
    * curation run reads before mixing. D is computed EXACTLY: with
    * cumulative counts (i, j) after each distinct value of the merged
    * sample, D·n_a·n_b = max |i·n_b − j·n_a| is an integer — the
    * returned `d_num`/`n_a`/`n_b` carry the exact rational and `d` is
    * its one r4'd division.
    *
    * Scale shape: the group-size frame is |groups|-bounded and
    * broadcast; each pair's merged sample is materialized by two
    * broadcast joins, so the union holds (|groups|−1)·|rows| rows —
    * the pairwise-family bound, BY CONSTRUCTION (document it like
    * margin mining: restrict `df` or the pair set before calling at
    * planet scale). Cumulative counts come from one (pair)-keyed
    * window pass under the default RANGE frame, whose peer-inclusive
    * sums make every row carry the full ≤x counts — intra-tie
    * ordering cannot matter.
    */
  def ksPairs(df: DataFrame, group: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select(group.cast("string").as("g"), value.cast("long").as("x"))
    val sizes = d.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val pairs = sizes.as("a").join(sizes.as("b"),
        col("a.g") < col("b.g"))
      .select(col("a.g").as("sa"), col("a.n").as("na"),
        col("b.g").as("sb"), col("b.n").as("nb"))
    def side(key: String, ia: Int, ib: Int) =
      d.join(broadcast(pairs), col("g") === col(key))
        .select(col("sa"), col("sb"), col("na"), col("nb"), col("x"),
          lit(ia.toLong).as("ia"), lit(ib.toLong).as("ib"))
    val u = side("sa", 1, 0).unionByName(side("sb", 0, 1))
    // default RANGE frame: the running sums include every PEER of the
    // current x (both sides' ties), so ca/cb at ANY row are the full
    // ≤x counts — F·n exactly, with no last-of-run bookkeeping and no
    // dependence on intra-tie order
    val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("x"))
    u.withColumn("ca", sum(col("ia")).over(w))
      .withColumn("cb", sum(col("ib")).over(w))
      .select(col("sa"), col("sb"), col("na"), col("nb"),
        abs(col("ca") * col("nb") - col("cb") * col("na")).as("dn"))
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
      .agg(max(col("dn")).as("d_num"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("na").as("n_a"), col("nb").as("n_b"), col("d_num"),
        (col("d_num").cast("double") /
          (col("na") * col("nb")).cast("double")).as("d"))
  }

  def sourceOverlap(docs: DataFrame, group: Column, text: Column, n: Int): DataFrame = {
    // the (gram → source-set) aggregation feeds TWO consumers (the
    // per-source counts and the pair matrix); without the barrier
    // ReuseExchange shares only the exchange and the collect_set
    // final aggregation ran once per consumer (RecomputeScan r16:
    // twin 0.96 s jobs). Lazy checkpoint = one pass; gram text is
    // already dropped, so the materialized rows are just the
    // source-set arrays.
    val sets = docs.filter(text.isNotNull)
      .select(group.as("src"),
        explode(array_distinct(TextOps.wordNgrams(TextOps.words(text), n))).as("g"))
      .groupBy("g").agg(sort_array(collect_set(col("src"))).as("ss"))
      .select(col("ss"))
      .localCheckpoint(false)
    val counts = sets.select(explode(col("ss")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("cnt"))
    val inter = sets.filter(size(col("ss")) >= 2)
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))),
          b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
      .select(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    inter
      .join(counts.select(col("src").as("source_a"), col("cnt").as("na")), "source_a")
      .join(counts.select(col("src").as("source_b"), col("cnt").as("nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")).cast("double")).as("jaccard"),
        (col("n_shared").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("containment"))
  }

  /** Jensen–Shannon divergence between the unigram word distributions
    * of every pair of `group` values — the DISTRIBUTIONAL drift/
    * composition audit (Lin, IEEE IT 1991), complementing
    * [[sourceOverlap]]'s verbatim n-gram overlap: two sources can
    * share zero 5-grams yet have near-identical topic/vocabulary
    * profiles (JS ≈ 0), or quote each other verbatim while writing
    * about different things. JS is symmetric and bounded in
    * [0, ln 2]; disjoint vocabularies score exactly ln 2.
    *
    * Decomposition used (avoids a per-pair full-outer join): with
    * Pa, Pb the unigram distributions and S the shared vocabulary,
    *   JS = ½[ln2·(1−Σ_S Pa) + ln2·(1−Σ_S Pb)
    *          + Σ_S (pa·ln(2pa/(pa+pb)) + pb·ln(2pb/(pa+pb)))]
    * — words on one side only contribute their whole mass · ln 2, so
    * a single INNER self-join on the word covers everything and
    * non-overlapping pairs fall out of the closed form as ln 2.
    *
    * Scale: one vocab-keyed count per group, then a self-join on the
    * word — fan-out ≤ |groups|² per word, partially aggregated before
    * the (a,b)-keyed shuffle; the |groups|² pair frame is tiny.
    */
  def jsDivergence(docs: DataFrame, group: Column, text: Column): DataFrame = {
    // lazy-checkpointed like pmiTopK's token frame: cnt feeds tot and
    // both self-join legs of p, each re-planning the per-char tokenize
    // (DupExprAudit: 6 copies); one materialization of the compact
    // (src, w, c) frame caps the corpus scan at one.
    val cnt = docs.filter(text.isNotNull)
      .select(group.as("src"), explode(alphaTokens(text)).as("w"))
      .groupBy("src", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val tot = cnt.groupBy("src").agg(sum("c").as("ct"))
    val p = cnt.join(tot, "src").select(col("src"), col("w"),
      (col("c").cast("double") / col("ct").cast("double")).as("p"))
    val shared = p.select(col("src").as("source_a"), col("w"), col("p").as("pa"))
      .join(p.select(col("src").as("source_b"), col("w"), col("p").as("pb")), "w")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(col("pa")).as("sa"), sum(col("pb")).as("sb"),
        sum(col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb"))) +
            col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb")))).as("sh"))
    val srcs = tot.select(col("src"))
    srcs.select(col("src").as("source_a"))
      .crossJoin(srcs.select(col("src").as("source_b")))
      .filter(col("source_a") < col("source_b"))
      .join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        (lit(0.5) * (log(lit(2.0)) *
            (lit(2.0) - coalesce(col("sa"), lit(0.0)) - coalesce(col("sb"), lit(0.0))) +
          coalesce(col("sh"), lit(0.0)))).as("js"))
  }

  /** Zipf-law fit per `group`: OLS slope/intercept of ln(freq) on
    * ln(rank) over each group's `topN` most frequent word types —
    * the classic sanity check that a text source is natural language
    * (Zipf 1949; natural corpora fit slope ≈ −1). Generated or
    * template-heavy sources flatten (slope → 0, a few types dominate
    * then plateau) and boilerplate-duplicated ones steepen; a drifted
    * slope is a cheap red flag on an incoming 100 TB crawl slice
    * before any per-document scoring runs.
    *
    * Ranks are deterministic: (count DESC, word ASC). The OLS slope
    * is computed in the explicit moment form
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` — not a `regr_slope`
    * aggregate — so an oracle engine reproduces the identical
    * expression tree over the same exact integer counts (ln and the
    * products are the only float steps).
    *
    * Scale: one (group, word)-keyed count (map-side combined, shuffle
    * bounded by vocabulary), a per-group window rank over the count
    * frame — rank-limit pushdown plans a partial WindowGroupLimit
    * below the exchange, so each partition forwards ≤ topN rows per
    * group — then a |groups|-row moment aggregation.
    */
  def zipfFit(docs: DataFrame, group: Column, text: Column, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs.filter(text.isNotNull)
      .select(group.as("src"), explode(alphaTokens(text)).as("w"))
      .groupBy("src", "w").agg(count(lit(1)).as("c"))
    val ranked = cnt
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("c").desc, col("w"))))
      .filter(col("rank") <= topN)
      .select(col("src"), log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    ranked.groupBy("src").agg(
        count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("src"), col("n").cast("long").as("n_types"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        ((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n")).as("intercept"))
  }

  /** Heaps'-law vocabulary-growth curve (Heaps 1978; Herdan): distinct
    * alphabetic types vs cumulative tokens, sampled at `buckets`
    * doc-id checkpoints, plus the log-log least-squares exponent β
    * (V ≈ K·nᵝ, typically 0.4–0.6 for natural text) — the statistic
    * tokenizer-vocabulary sizing and dedup-health monitoring read
    * (a corpus whose β collapses toward 0 has stopped contributing
    * new vocabulary; near 1 it is likely noise/garbage).
    *
    * Scale shape: cumulative TYPES need each type counted once at its
    * FIRST occurrence — computed as min(doc_id) per type (one
    * map-side-combined aggregate over the exploded tokens, shuffle
    * keyed by type), bucketed, then prefix-summed over ≤`buckets`
    * rows. No distinct-per-prefix rescans: the scan count is a small
    * constant however many checkpoints are asked for (the checkpoint
    * on the ≤`buckets`-row curve keeps the β fit from re-deriving
    * it). Buckets are fixed-width
    * doc-id ranges (width = max_id div buckets + 1, one broadcast
    * scalar), so both engines derive identical checkpoint boundaries
    * from the data. The fit folds ≤`buckets` doubles (the zipfFit
    * discipline; r4 at the caller).
    *
    * Returns (bucket, cum_toks, cum_types, beta) — integers plus one
    * corpus-constant slope; buckets with docs but zero alphabetic
    * tokens carry their token count with zero new types.
    */
  def heapsCurve(docs: DataFrame, id: Column, text: Column,
                 buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, s"heapsCurve needs >= 2 checkpoints, got $buckets")
    val base = docs.filter(text.isNotNull)
      .select(id.cast("long").as("doc_id"), alphaTokens(text).as("w"))
    val mx = base.agg(max(col("doc_id")).as("__m"))
    // Tokenize ONCE: the token-count and first-occurrence aggregates
    // sit under DIFFERENT exchanges (ReuseExchange can't share them),
    // so without this the per-document regexp runs twice per action —
    // the pmiTopK checkpoint discipline (the term that scales with
    // data is the tokenization, not the ≤buckets-row curve).
    val withB = base.crossJoin(broadcast(mx))
      .withColumn("b", expr(s"doc_id div (__m div $buckets + 1)"))
      .select(col("doc_id"), col("b"), col("w"))
      .localCheckpoint(false)
    val bukToks = withB.groupBy(col("b"))
      .agg(sum(size(col("w")).cast("long")).as("toks"))
    val firstOcc = withB
      .select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(mx))
      .groupBy(expr(s"fd div (__m div $buckets + 1)").as("b"))
      .agg(count(lit(1)).as("types"))
    val cum = bukToks.join(firstOcc, Seq("b"), "left")
      .na.fill(0L, Seq("types"))
      .select(col("b"),
        sum(col("toks")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum_toks"),
        sum(col("types")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum_types"))
      .localCheckpoint(false)
    val pts = cum.filter(col("cum_toks") > 0L && col("cum_types") > 0L)
      .select(log(col("cum_toks").cast("double")).as("x"),
        log(col("cum_types").cast("double")).as("y"))
    val beta = pts.agg(
        count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))).as("beta"))
    cum.crossJoin(broadcast(beta)).orderBy(col("b"))
  }

  /** Per-document Shannon entropy of the UTF-8 byte distribution —
    * the gibberish/low-diversity quality signal (binary junk and
    * single-char spam score near 0, natural text ~4.2 bits·ln2).
    * Computed as ln(n) − Σ c·ln(c) / n over byte counts c, so both
    * engines fold the same ≤256 terms. Bytes are keyed as hex pairs
    * (the llm_resize oracle's proven byte-extraction form). Empty
    * and NULL texts are excluded — their entropy is undefined.
    *
    * Returns (doc_id, n_bytes, entropy), entropy in nats.
    */
  def byteEntropy(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val hx = lower(hex(encode(text, "UTF-8")))
    val counts = docs.filter(text.isNotNull)
      .select(id.as("doc_id"), hx.as("hx"))
      .filter(length(col("hx")) > 0)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), (length(col("hx")) / 2).cast("int") - 1),
          i => col("hx").substr(i * 2 + 1, lit(2)))).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    counts.groupBy("doc_id").agg(
        sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("slc"))
      .select(col("doc_id"), col("n").as("n_bytes"),
        (log(col("n").cast("double")) - col("slc") / col("n").cast("double"))
          .as("entropy"))
  }

  /** Per-document n-gram novelty — the memorization-risk audit of a
    * training corpus (the corpus-internal counterpart of benchmark
    * decontamination; cf. Carlini et al. arXiv:2202.07646's finding
    * that text repeated across documents is what models memorize):
    * for each document, how many of its DISTINCT word `n`-grams occur
    * in ≥2 documents, and the shared fraction. High shared_frac =
    * templated/duplicated text a dedup pass missed; 0 = fully novel.
    *
    * Scale shape: per-doc grams are deduped map-side
    * (`array_distinct` before the explode), so the document-frequency
    * aggregation receives one (gram, doc) row per distinct pair —
    * already the pair-distinct form [[Dedup.scrubFrequentLines]]
    * needs an explicit distinct() for — and map-side-combines to one
    * row per (gram, partition). The full gram table is shuffled
    * exactly ONCE (by gram digest): a gram with df==1 has a unique
    * owning document, so `min(id)` inside the same aggregation
    * recovers that owner and `n_shared = n_grams − n_unique` — no
    * verdict join of the gram table back against the frequency table
    * (the previous form re-shuffled every gram row a second time;
    * measured 1.62→7.34 s at 10x, exponent 0.66, the catalog's
    * worst). The per-doc gram totals come straight off the document
    * array (`size(array_distinct(...))`) — a no-shuffle map pass.
    * Documents with < n words emit no grams and no row.
    */
  def gramNovelty(docs: DataFrame, id: Column, words: Column,
                  n: Int): DataFrame =
    unitNovelty(docs, id, TextOps.wordNgrams(words, n))
      .withColumnRenamed("n_units", "n_grams")

  /** The sharing engine under [[gramNovelty]] (word n-grams) and the
    * chunk-level CDC dedup audit ([[TextOps.cdcChunks]] units): per
    * document, how many of its DISTINCT units occur in ≥ 2 documents.
    * Returns (id, n_units, n_shared, shared_frac); docs whose `units`
    * array is empty emit no row.
    *
    * Unit text never leaves the map side: the df aggregation is keyed
    * on the md5 digest (16 raw bytes via unhex), the same
    * narrow-shuffle move as [[Dedup.keepFirstUnits]]. Collisions would
    * need 2⁶⁴ distinct units; no corpus gets close.
    *
    * SINGLE-CONSUMER shape (round 16): df attaches to every (id, dg)
    * row as `count(*) over (partition by dg)` and ONE per-doc
    * aggregation reads both n_units and n_unique off those rows — a
    * unit with df==1 appears on exactly one row, whose id IS the
    * owner. The unit kernel therefore has exactly one consumer: no
    * checkpoint, nothing to race, nothing to materialize. The two
    * prior forms both lost: two aggregations over a checkpointed
    * frame either RACED lazily (AQE ran both consumer map stages
    * before materialization — RecomputeScan r15 on llm_cdc_dedup:
    * 14.0 + 5.6 s CPU twin jobs for one kernel) or paid the eager
    * materialization of the corpus-sized unit frame at 10x (cdc tN
    * 3.91→5.51 s, SCALING r15); and the verdict join of the unit
    * table back against a frequency table measured 1.62→7.34 s at
    * 10x, exponent 0.66, the catalog's then-worst. The df-as-window
    * move is the same one that fixed llm_span_dedup (r15, 10x tN
    * 6.33→2.85). explode_outer + a generated-attribute guard keeps
    * the synthesized size()>0 filter from being pushed below the
    * Generate to the scan (the InferFiltersFromGenerate trap,
    * PlanShapeSpec).
    */
  def unitNovelty(docs: DataFrame, id: Column, units: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dus = docs.select(id.as("id"),
        explode_outer(array_distinct(units)).as("g"))
      .filter(col("g").isNotNull)
      .select(col("id"), unhex(md5(col("g"))).as("dg"))
    val byUnit = Window.partitionBy(col("dg"))
    dus.withColumn("df", count(lit(1)).over(byUnit))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_units"),
        sum(when(col("df") === 1L, 0L).otherwise(1L)).as("n_shared"))
      .withColumn("shared_frac",
        col("n_shared").cast("double") / col("n_units").cast("double"))
  }

  /** Domain-distinctive vocabulary via weighted log-odds-ratio with an
    * informative Dirichlet prior (Monroe, Colaresi & Quinn, "Fightin'
    * Words", Political Analysis 2008, eq. 16-22) — the curation view
    * "which words characterize THIS source vs the rest of the corpus",
    * robust where raw tf-idf/PMI over-rank rare words. The corpus
    * itself is the prior (a_w = y_w, a0 = n_total):
    *
    *   δ_w = ln((y_sw + y_w)/(n_s + n − y_sw − y_w))
    *       − ln((y_rw + y_w)/(n_r + n − y_rw − y_w))       (rest r = corpus − s)
    *   σ²_w ≈ 1/(y_sw + y_w) + 1/(y_rw + y_w),   z_w = δ_w/√σ²_w
    *
    * Returns the top `k` words per group by z (desc, word asc
    * tie-break), `(group, w, y_sw, z)`, words below `minCount`
    * in-group occurrences pruned. All counts are exact integers off
    * ONE (group, word) aggregation — y_w/n_s/n derive from that
    * frame (localCheckpointed once: it feeds the group totals, the
    * y_w aggregate AND the scored output), never a corpus rescan.
    * The per-group totals are a MODEL (|groups| rows — the same
    * bound that made them broadcastable) and resolve on the driver
    * into literals, which removes two broadcast subtrees and a
    * crossJoin from the plan (LogOddsAbProbe: 1.06 → 0.74 s median
    * at sf0.1, values identical); the y_w join keys on the word. The
    * final per-group top-k ranks under WindowGroupLimit (map-side
    * partial trim).
    */
  def logOdds(docs: DataFrame, group: Column, text: Column,
              minCount: Long, k: Int): DataFrame = {
    val ysw = docs.select(group.as("g"), explode(alphaTokens(text)).as("w"))
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("ysw"))
      .localCheckpoint(false)
    // group keys stringified only for the literal lookup — grouping,
    // join and window stay on the native column
    val nsMap = ysw.groupBy(col("g")).agg(sum(col("ysw")).as("ns")).collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val nTot = nsMap.values.sum
    val yw = ysw.groupBy(col("w")).agg(sum(col("ysw")).as("yw"))
    val ns = element_at(typedLit(nsMap), col("g").cast("string"))
    val n = lit(nTot)
    val yrw = (col("yw") - col("ysw")).cast("double")
    val nr = (n - ns).cast("double")
    val delta =
      log((col("ysw") + col("yw")).cast("double") /
          (ns + n - col("ysw") - col("yw")).cast("double")) -
      log((yrw + col("yw")) / (nr + n - yrw - col("yw")))
    val variance = lit(1.0d) / (col("ysw") + col("yw")).cast("double") +
      lit(1.0d) / (yrw + col("yw"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("z").desc, col("w").asc)
    ysw.filter(col("ysw") >= minCount)
      .join(yw, Seq("w"))
      .select(col("g"), col("w"), col("ysw"), (delta / sqrt(variance)).as("z"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k).drop("rank")
  }
}
