package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * A 100 TB corpus is sampled with a hash predicate, never with
  * `rand()` or `ORDER BY random() LIMIT n`: the hash form is a pure
  * map-side filter (no shuffle, no global sort), reproducible across
  * runs/retries/engines (task retries with `rand()` silently change
  * the sample), and composable — the same (salt, id) always lands on
  * the same side of the threshold, so reruns and incremental loads
  * agree on membership.
  */
object Sampling {

  /** Hex threshold for a keep-rate: the first 8 md5 hex chars are a
    * uniform draw from [0, 2³²); keeping rows whose draw sorts below
    * `floor(rate·2³²)` keeps `rate` of them (granularity 2⁻³² ≈
    * 2.3e-10). Rates ≥ 1 return a sentinel above every hex digit, so
    * the predicate keeps everything. Comparison is lexicographic on
    * the fixed-width hex string — identical to unsigned numeric
    * order, and identical across engines.
    */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0, s"negative sample rate $rate")
    if (rate >= 1.0d) "g" // sorts above 'f': keep-all sentinel
    else f"${math.floor(rate * 4294967296.0d).toLong}%08x"
  }

  /** Stratified deterministic sample: keep a row iff
    * `substr(md5(salt|stratum|id), 1, 8) < threshold(stratum)`.
    * `rates` maps stratum values to keep-rates; missing strata use
    * `defaultRate`. The stratum value participates in the hash, so
    * per-stratum samples are decorrelated even for equal ids; `salt`
    * versions the whole sample (a new salt = a fresh independent
    * draw, the knob for train/validation splits).
    */
  def hashSample(df: DataFrame, id: Column, stratum: Column,
                 rates: Map[String, Double], defaultRate: Double = 1.0d,
                 salt: String = "graft"): DataFrame = {
    val threshold = rates.foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (k, r)) => when(stratum === lit(k), lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat_ws("|", lit(salt), stratum, id)), 1, 8) < threshold)
  }

  /** Per-group quota cap — the C4/RefinedWeb "at most k documents per
    * domain" step: keep each group's k best rows by `(priority,
    * tiebreak)` ascending. Priority should itself be a deterministic
    * hash (e.g. `md5(id)`) so the survivors are a reproducible uniform
    * draw rather than an ingestion-order artifact.
    *
    * Scale shape: written as the PLAIN single window + `rn <= k`
    * filter on purpose — Catalyst's rank-limit pushdown (SPARK-37099,
    * `WindowGroupLimit`) inserts a map-side Partial limit BELOW the
    * exchange, so every input partition pre-trims to k rows per
    * group and a mega-domain's reducer receives at most k·partitions
    * rows, never the domain's raw cardinality. A hand-salted
    * two-stage window (measured while writing this) plans as two
    * full exchanges and defeats the built-in pushdown — the optimizer
    * already runs the salted plan's bound with one shuffle.
    * PlanShapeSpec pins the Partial WindowGroupLimit below the
    * exchange so a regression (or a window-function change that
    * breaks pushdown eligibility) fails loudly.
    */
  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006, A-Res):
    * draw `n` rows with inclusion odds proportional to `weight` by
    * ranking on `key_i = u_i^(1/w_i)` and keeping the top n — here in
    * the equivalent log form `ln(u_i)/w_i` (monotone in the key,
    * numerically tame for tiny u). The importance-sampling primitive
    * quality-weighted corpus selection needs where [[hashSample]]'s
    * uniform draw treats a high-quality and a boilerplate document
    * identically.
    *
    * Deterministic like every sampler here: `u_i` derives from
    * `md5(salt|id)` — the first 13 hex chars are a 52-bit integer v
    * (exactly a double mantissa, so `(v + 0.5) / 2^52` is EXACT
    * arithmetic in (0,1), no rounding and no ln(0) pole), never
    * `rand()`. Same (salt, id) → same key across runs, retries, and
    * engines; a new salt is a fresh independent draw.
    *
    * Scale shape: the key is a pure map expression; the top-n is a
    * global `orderBy(key).limit(n)` — Spark plans
    * TakeOrderedAndProject (per-partition heap of n + driver merge of
    * partitions·n rows), never a full sort. Rows with weight ≤ 0 or
    * null are excluded (they have no sampling odds). Appends the key
    * as `__wkey` (callers drop or report it); ties break by id.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column, n: Int,
                     salt: String): DataFrame = {
    require(n > 0)
    require(!df.columns.contains("__wkey"),
      "input already has a __wkey column — rename it first; weightedSample would clobber it")
    val v = conv(substring(md5(concat_ws("|", lit(salt), id.cast("string"))), 1, 13), 16, 10)
      .cast("double")
    val u = (v + lit(0.5d)) / lit(4503599627370496.0d) // 2^52
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__wkey", log(u) / weight.cast("double"))
      .orderBy(col("__wkey").desc, id)
      .limit(n)
  }

  /** Value-based per-group quantile bucketing — the CCNet move
    * (Wenzek et al., LREC 2020 §3.3: split each language by perplexity
    * into head/middle/tail thirds) generalized to `q` buckets. Each
    * row gets the bucket of its score VALUE relative to per-group
    * cutoffs: `cut_k` = smallest score whose cumulative count reaches
    * `k·n/q` (ties share a bucket — value-based, like bucketing by a
    * published percentile table, NOT row-number ntile which splits
    * equal scores arbitrarily). Bucket 1 holds the lowest scores.
    *
    * Scale shape, same discipline as [[dropBottomQuantile]]: the
    * cumulative window runs over a compact (group, score) HISTOGRAM —
    * map-side combined, reducers hold distinct scores only — never
    * over the corpus, so a mega-language costs |distinct scores| window
    * rows, not a corpus-sized sort. Cutoff comparison is integer
    * cross-multiplication (`q·cum ≥ k·n`), no ceil, no float boundary.
    * The q−1 per-group cutoff frames are group-cardinality-sized and
    * broadcast into one map-side bucket assignment. `score` should be
    * discrete/quantized (integer micro-nats, cents) for the histogram
    * to stay compact.
    *
    * Appends `bucket` (1..q, long). Group cardinality and q are
    * assumed small (languages × thirds, not millions).
    */
  def quantileBuckets(df: DataFrame, group: String, score: String,
                      q: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(q >= 2, s"quantileBuckets: q must be >= 2, got $q")
    require(!df.columns.contains("bucket"),
      "input already has a bucket column — rename it first; quantileBuckets would clobber it")
    val hist = df.groupBy(col(group), col(score))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(group)).orderBy(col(score))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(group))))
    // ALL q−1 cutoffs from ONE aggregation as conditional mins — the
    // per-cut form built q−1 separate broadcast subqueries, each
    // re-executing the hist+cum subtree (and, through it, the
    // caller's whole scoring pipeline: RecomputeScan r16 on
    // llm_ccnet_buckets showed twin 15-18 s-CPU kernel jobs). One
    // frame, one broadcast, one join.
    val cutAggs = (1 until q).map { k =>
      min(when(col("__cum") * q >= col("__n") * k, col(score))).as(s"__cut$k")
    }
    val cuts = cum.groupBy(col(group)).agg(cutAggs.head, cutAggs.tail: _*)
    val bucket = (1 until q)
      .map(k => when(col(score) > col(s"__cut$k"), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    df.join(broadcast(cuts), Seq(group))
      .withColumn("bucket", bucket)
      .drop((1 until q).map(k => s"__cut$k"): _*)
  }

  def capPerGroup(df: DataFrame, group: Column, priority: Column,
                  tiebreak: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0)
    require(!df.columns.contains("__rn"),
      "input already has a __rn column — rename it first; capPerGroup would clobber it")
    val w = Window.partitionBy(group).orderBy(priority, tiebreak)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Exact per-group quantile filter — the FineWeb/Gopher-style
    * "drop the worst `num/den` of every language by quality score"
    * step with a DATA-DERIVED cutoff. Semantically identical to
    * `percent_rank() OVER (PARTITION BY group ORDER BY score, id)
    * >= num/den` (each group's lowest `ceil(frac·(n−1))` rows by
    * `(score, id)` are dropped; a 1-row group has percent_rank 0 and
    * is dropped for any positive fraction) — but built WITHOUT the
    * giant per-group sort window that form plans: a mega-group at
    * 100 TB would otherwise sort on one reducer.
    *
    * Shape: (1) a compact (group, score) histogram — map-side
    * combined, reducers hold distinct scores only; (2) a cumulative
    * window over THE HISTOGRAM (|distinct scores| rows per group) to
    * locate the boundary score and how many of its ties to drop —
    * the drop count is computed in INTEGER arithmetic, no float
    * boundary; (3) survivors = everything above the boundary score
    * (broadcast bounds, map-side filter) plus the boundary-score tie
    * group minus its `r` smallest ids (the one remaining per-group
    * window runs over a SINGLE score value per group). The contract
    * this buys: `score` should be discrete or quantized (quality
    * scores, per-mille buckets) — the histogram, not the corpus, is
    * what gets windowed, and the worst case (every score distinct)
    * degrades to the sort the method exists to avoid.
    */
  def dropBottomQuantile(df: DataFrame, group: String, score: String,
                         id: String, num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"drop fraction $num/$den must be in [0, 1]")
    val reserved = Seq("__cnt", "__cum", "__n", "__k", "__bg", "__bs", "__r", "__rn")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input already has a $c column — rename it first"))
    import org.apache.spark.sql.expressions.Window
    val (g, s, i) = (col(group), col(score), col(id))
    val hist = df.groupBy(g, s).agg(count(lit(1)).as("__cnt"))
    val wcum = Window.partitionBy(g).orderBy(s)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(g)
    // dropped-row count k per group: ceil(num·(n−1)/den), except the
    // 1-row group (percent_rank 0 → dropped whole). Integral div via
    // floor((a + den − 1)/den) — exact for any n below 2^53/num.
    val k = when(col("__n") === 1L, lit(if (num == 0L) 0L else 1L))
      .otherwise(floor(((col("__n") - 1L) * num + (den - 1L)) / lit(den.toDouble))
        .cast("long"))
    val bounds = hist
      .withColumn("__cum", sum(col("__cnt")).over(wcum) - col("__cnt"))
      .withColumn("__n", sum(col("__cnt")).over(wtot))
      .withColumn("__k", k)
      // the boundary score: strictly-below count < k ≤ through-count
      .filter(col("__cum") < col("__k") && col("__k") <= col("__cum") + col("__cnt"))
      .select(g.as("__bg"), s.as("__bs"), (col("__k") - col("__cum")).as("__r"))
    val joined = df.join(broadcast(bounds), g === col("__bg"), "left")
    // no bounds row = k == 0 (nothing dropped in this group)
    val keepOutright = joined.filter(col("__bg").isNull || s > col("__bs"))
      .drop("__bg", "__bs", "__r")
    val wTie = Window.partitionBy(g).orderBy(i)
    val tieSurvivors = joined.filter(col("__bg").isNotNull && s === col("__bs"))
      .withColumn("__rn", row_number().over(wTie))
      .filter(col("__rn") > col("__r"))
      .drop("__bg", "__bs", "__r", "__rn")
    keepOutright.unionByName(tieSurvivors)
  }

  /** Token-budget mixture sampling — the data-MIXING step of a
    * training run: down-sample each group (source, domain, language)
    * toward its target share of a total `budget`, measured in
    * `weight`'s unit (tokens). Each group's keep-rate is
    * `min(1, share·budget / group_weight)` from one narrow
    * aggregation, and rows are then admitted by the same
    * deterministic md5 predicate as [[hashSample]] — no `rand()`, no
    * global sort, membership reproducible across runs and engines.
    * Groups absent from `shares` use `defaultShare`; a group already
    * at or under its target is kept whole (the op never up-samples).
    *
    * `weight` must be INTEGRAL (token counts): group totals sum
    * exactly (order-independent) and convert to double once, so the
    * hex admission threshold — and therefore the kept SET, not just
    * its size — is bit-identical across engines and partitionings. A
    * double weight would make the total depend on partial-aggregation
    * order.
    *
    * Scale shape: one shuffle (the totals aggregation, |groups|
    * rows, broadcast back), then a pure map-side filter that folds
    * into the scan. The expected output is `budget` tokens however
    * large the corpus — the knob a 100 TB mixing pass turns.
    */
  def mixToBudget(df: DataFrame, id: Column, group: Column, weight: Column,
                  shares: Map[String, Double], budget: Double,
                  defaultShare: Double = 0.0d,
                  salt: String = "graft"): DataFrame = {
    require(budget > 0, s"non-positive budget $budget")
    (shares.values.toSeq :+ defaultShare).foreach(s =>
      require(s >= 0, s"negative share $s"))
    val shareCol = shares.foldLeft(lit(defaultShare)) {
      case (acc, (k, v)) => when(group === lit(k), lit(v)).otherwise(acc)
    }
    val totals = df.groupBy(group.as("__mix_g"))
      .agg(sum(weight.cast("long")).as("__mix_w"))
    // ((share·budget) / total) · 2³² floored, as 8 lowercase hex chars
    // — the COLUMN form of rateThreshold, same 'g' keep-all sentinel
    val rate = shareCol * lit(budget) / col("__mix_w").cast("double")
    val th = when(rate >= 1.0d, lit("g"))
      .otherwise(lower(lpad(hex(floor(rate * lit(4294967296.0d)).cast("long")), 8, "0")))
    df.join(broadcast(totals), group === col("__mix_g"))
      .filter(substring(md5(concat_ws("|", lit(salt), group, id)), 1, 8) < th)
      .drop("__mix_g", "__mix_w")
  }

  /** UniMax budget allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023, arXiv:2304.09151): split a total token
    * `budget` across groups (languages, sources) as EVENLY as
    * possible, subject to no group repeating more than `maxEpochs`
    * times — the allocation POLICY whose output shares
    * [[mixToBudget]] consumes. Proportional sampling lets head
    * languages dominate; uniform sampling over-repeats tail ones;
    * UniMax is the water-filling compromise.
    *
    * Closed form instead of the paper's sequential loop: sort groups
    * by cap `c = maxEpochs·n` ascending (group tiebreak). With
    * prefix sums S and L groups, group i is capped iff
    * `S_{i−1} + c_i·(L−i+1) ≤ B` — that predicate is monotone in i
    * (difference `(L−i)(c_{i+1}−c_i) ≥ 0`), so the capped set is a
    * prefix and one cumulative window decides it. Capped groups get
    * `c_i`; the rest split `B − S_K` evenly. All comparisons are in
    * exact LONG arithmetic (integral weights, integral budget); the
    * only float step is the final uncapped-share division.
    *
    * Scale: one (group)-keyed sum (map-side combined), then windows
    * over the |groups|-row totals frame — tens of rows, whatever the
    * corpus size; the single-partition window is over that frame,
    * never the data.
    *
    * Returns (grp, n_tok, cap, alloc) — `alloc/n_tok` is the
    * group's epoch count, ≤ maxEpochs by construction.
    */
  def uniMaxAlloc(df: DataFrame, group: Column, weight: Column,
                  budget: Long, maxEpochs: Int): DataFrame = {
    require(budget > 0, s"non-positive budget $budget")
    require(maxEpochs > 0, s"non-positive maxEpochs $maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val tot = df.groupBy(group.as("grp"))
      .agg(sum(weight.cast("long")).as("n_tok"))
      .withColumn("cap", col("n_tok") * maxEpochs)
    val ord  = Window.orderBy(col("cap"), col("grp"))
    val all  = Window.partitionBy()
    val ranked = tot
      .withColumn("__i", row_number().over(ord))
      .withColumn("__s_prev", coalesce(
        sum(col("cap")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__L", count(lit(1)).over(all))
      .withColumn("__capped",
        col("__s_prev") + col("cap") * (col("__L") - col("__i") + 1) <= budget)
    val sums = ranked.agg(
      sum(when(col("__capped"), 1L).otherwise(0L)).as("__K"),
      sum(when(col("__capped"), col("cap")).otherwise(0L)).as("__SK"),
      count(lit(1)).as("__Ltot"))
    ranked.crossJoin(broadcast(sums))
      .select(col("grp"), col("n_tok"), col("cap"),
        when(col("__capped"), col("cap").cast("double"))
          .otherwise((lit(budget) - col("__SK")).cast("double") /
            (col("__Ltot") - col("__K")).cast("double")).as("alloc"))
  }

  /** Temperature-scaled mixture weights (the α/τ-sampling of
    * multilingual pretraining — XLM-R, Conneau arXiv:1911.02116 §3.1;
    * mT5's language-sampling exponent, Xue arXiv:2010.11934 §3):
    * `w_i = p_i^τ / Σ_j p_j^τ` with `p_i = n_i / Σn`. τ=1 is
    * proportional sampling (head groups dominate), τ→0 approaches
    * uniform (tail groups over-repeat); 0.3–0.7 is the published
    * compromise band. Output shares feed [[mixToBudget]].
    *
    * Scale: one (group)-keyed sum — map-side combined, |groups| rows
    * — then windows over that tiny frame. The group totals are exact
    * longs; p and the normalization are the only float steps.
    */
  /** Rendezvous / highest-random-weight shard of `key` among `n`
    * shards (Thaler & Ravishankar 1998): argmax over s of
    * md5(key ":" s) — the sharding rule whose defining property is
    * MINIMAL disruption: adding shard n+1 moves exactly the keys
    * whose new weight wins, an expected 1/(n+1) of them, with every
    * moved key going TO the new shard (consistent-hashing semantics
    * without the ring). Evaluates as one codegen'd expression per
    * row — an n-entry struct array max, no explode, no shuffle, no
    * state — so assignment is a free map stage at any corpus size.
    * md5 hex compares lexicographically the same everywhere, which
    * makes placement itself engine-portable (an external system can
    * compute byte-identical shards).
    */
  /** Neyman optimal allocation (Neyman 1934): split a sample budget
    * across strata ∝ N_h·s_h (stratum size × sample standard
    * deviation) — the eval-set/audit construction rule that minimizes
    * the estimator variance at a fixed labeling budget. Returns one
    * row per stratum: (strata key, n_rows, weight, alloc) with
    * `alloc` exact integers that SUM EXACTLY to `budget`
    * (largest-remainder rounding; fraction ties to the smaller
    * stratum key).
    *
    * Exactness: the per-stratum moments are one distributed
    * aggregation in exact integers (Σx as long, Σx² in decimal so
    * multi-billion-char strata can't wrap); the |strata|-row moment
    * frame is a MODEL and resolves on the driver. Each weight
    * N_h·s_h is floor-quantized ONCE to integer micro-units (the
    * micro-nat discipline) — one double expression per stratum, no
    * cross-stratum float sum anywhere — so the weight total is an
    * exact long, the raw shares are divisions of exact integers, and
    * the largest-remainder ranking orders deterministically in both
    * engines. Single-row strata carry zero weight (no variance
    * evidence).
    */
  def neymanAlloc(df: DataFrame, stratum: Column, value: Column,
                  budget: Long): DataFrame = {
    require(budget >= 0, s"neymanAlloc: negative budget $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val m = df.groupBy(stratum.cast("string").as("g"))
      .agg(count(lit(1)).as("n"),
        sum(value.cast("long")).as("sx"),
        sum(value.cast("decimal(19,0)") * value.cast("decimal(19,0)"))
          .as("sxx"))
      .collect()
      .map(r => (String.valueOf(r.get(0)), r.getLong(1), r.getLong(2),
        r.getDecimal(3)))
      .sortBy(_._1)
    val w = m.map { case (g, n, sx, sxx) =>
      val wq =
        if (n < 2) 0L
        else {
          val num = new java.math.BigDecimal(n).multiply(sxx)
            .subtract(java.math.BigDecimal.valueOf(sx)
              .multiply(java.math.BigDecimal.valueOf(sx))).doubleValue()
          val sd = math.sqrt(num / (n.toDouble * (n - 1).toDouble))
          math.floor(n.toDouble * sd * 1000000.0d).toLong
        }
      (g, n, wq)
    }
    val sumW = w.map(_._3).sum
    val raw = w.map { case (g, n, wq) =>
      (g, n, wq,
        if (sumW > 0L) budget.toDouble * wq.toDouble / sumW.toDouble else 0.0d)
    }
    val base = raw.map { case (g, n, wq, r) => (g, n, wq, r, math.floor(r).toLong) }
    // an all-degenerate corpus (zero total weight) allocates nothing:
    // there is no variance evidence to split by, and bumping every
    // stratum by the remainder loop would invent an allocation
    val short = if (sumW == 0L) 0L else budget - base.map(_._5).sum
    val bump = base.map { case (g, _, _, r, b) => (g, r - b) }
      .sortBy { case (g, f) => (-f, g) }
      .take(short.toInt).map(_._1).toSet
    base.map { case (g, n, wq, _, b) =>
      (g, n, wq, b + (if (bump.contains(g)) 1L else 0L))
    }.toSeq.toDF("stratum", "n_rows", "w_micro", "alloc")
  }

  def rendezvousShard(key: Column, n: Int): Column = {
    require(n >= 1, s"rendezvousShard: n must be >= 1, got $n")
    array_max(array((0 until n).map(s =>
      struct(md5(concat(key.cast("string"), lit(":"), lit(s.toString))).as("w"),
        lit(s).as("s"))): _*)).getField("s")
  }

  def temperatureWeights(df: DataFrame, group: Column, weight: Column,
                         tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"temperature $tau outside (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    df.groupBy(group.as("grp"))
      .agg(sum(weight.cast("long")).as("n_tok"))
      .withColumn("p_raw",
        col("n_tok").cast("double") / sum(col("n_tok")).over(all).cast("double"))
      .withColumn("__pt", pow(col("p_raw"), lit(tau)))
      .withColumn("weight", col("__pt") / sum(col("__pt")).over(all))
      .select(col("grp"), col("n_tok"), col("p_raw"), col("weight"))
  }
}
