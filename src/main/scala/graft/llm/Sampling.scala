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
}
