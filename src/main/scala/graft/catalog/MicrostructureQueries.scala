package graft.catalog

import graft.catalog.IndicatorQueries.{hourly, hourlyCte}
import graft.catalog.Oracle._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-microstructure and econometric test statistics over the
  * hourly close series — the screens a quant user of the reference
  * (charts + indicators, reference web/routes/views/views.py) runs
  * downstream of the candle read path: effective-spread and
  * efficiency estimators (Roll 1984; Lo & MacKinlay 1988), randomness
  * tests (Wald–Wolfowitz 1940; Ljung & Box 1978), range-based
  * volatility (Garman & Klass 1980; Rogers & Satchell 1991), and the
  * lead-lag cross-correlation panel.
  *
  * Exactness discipline (the [[Oracle]] conventions): closes are exact
  * cents, price changes exact Longs, log returns floor-quantized once
  * to micro-nats, and every second-moment combination n·Σxy − Σx·Σy
  * runs in 38-digit decimal (Spark) ↔ HUGEINT (DuckDB) with ONE
  * double division at the end, so both engines round the same exact
  * rational to the nearest double exactly once. Per-row doubles that
  * must be summed (the range-based day variances) are floor-quantized
  * to integers BEFORE the sum — double addition is not associative
  * and the two engines sum in different orders.
  *
  * Scale: every statistic is a per-series (or per-pair) aggregation
  * over the rolled-up hourly frame — one keyed exchange over
  * series×hours rows, never over raw events; the pair panel is
  * series², a model-sized frame at any corpus scale.
  */
object MicrostructureQueries {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Micro-nat log return over the hourly close series, with the row
    * index the chunk/lag machinery keys on. Quantization matches
    * [[graft.ops.Indicators.autocorr]]: floor(ln(c/p)·1e6 + 0.5).
    */
  private def returns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    hourly(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull && col("__p") > 0L && col("c") > 0L)
      .withColumn("r", floor(
        log(col("c").cast("double") / col("__p").cast("double"))
          * lit(1000000.0d) + lit(0.5d)).cast("long"))
      .withColumn("rn", row_number().over(w))
      .select(col("event_type"), col("bus"), col("r"), col("rn"))
  }

  private val returnsCte: String =
    s"""$hourlyCte, lagd AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hourly
       |), ret AS (
       |  SELECT event_type, bus,
       |         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(p AS DOUBLE))
       |              * 1000000.0 + 0.5) AS BIGINT) AS r,
       |         row_number() OVER (PARTITION BY event_type ORDER BY bus) AS rn
       |  FROM lagd WHERE p IS NOT NULL AND p > 0 AND c > 0
       |)""".stripMargin

  // ---------------------------------------------------- Roll spread
  /** Roll (1984) implicit effective spread per series: the bid-ask
    * bounce makes successive price changes negatively autocovariant,
    * and s = 2·√(−cov(Δp_t, Δp_{t−1})) recovers the spread from
    * trade prices alone. Δp are exact cent Longs; the population
    * autocovariance times n² — n·ΣΔΔ' − ΣΔ·ΣΔ' — is exact decimal ↔
    * HUGEINT, divided to double once. Series whose autocovariance is
    * non-negative (no bounce signature) emit a null spread, the
    * standard convention.
    */
  private def rollSpreadQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    hourly(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .withColumn("__d", col("c") - col("__p"))
      .withColumn("__x", lag(col("__d"), 1).over(w))
      .filter(col("__d").isNotNull && col("__x").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__x"))).as("sx"), sum(dec(col("__d"))).as("sy"),
        sum(dec(col("__x")) * dec(col("__d"))).as("sxy"))
      .withColumn("__cov",
        (dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n").cast("double") * col("n").cast("double")))
      .select(col("event_type"), col("n"),
        r4(col("__cov")).as("autocov_c2"),
        r4(when(col("__cov") < 0.0d,
          lit(2.0d) * sqrt(-col("__cov")))).as("spread_cents"))
      .orderBy(col("event_type"))
  }

  private val rollSpreadSql: String =
    s"""$hourlyCte, d0 AS (
       |  SELECT event_type, bus,
       |         c - lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS dd
       |  FROM hourly
       |), d AS (
       |  SELECT event_type, dd,
       |         lag(dd) OVER (PARTITION BY event_type ORDER BY bus) AS dx
       |  FROM d0
       |), mo AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(dx AS HUGEINT)) AS sx, sum(CAST(dd AS HUGEINT)) AS sy,
       |         sum(CAST(dx AS HUGEINT) * dd) AS sxy
       |  FROM d WHERE dd IS NOT NULL AND dx IS NOT NULL
       |  GROUP BY 1
       |), cv AS (
       |  SELECT event_type, n,
       |         CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
       |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov
       |  FROM mo
       |)
       |SELECT event_type, n, ${r4Sql("cov")} AS autocov_c2,
       |       ${r4Sql("CASE WHEN cov < 0.0 THEN 2.0 * sqrt(-cov) END")} AS spread_cents
       |FROM cv ORDER BY event_type""".stripMargin

  // ------------------------------------------------- variance ratio
  /** Lo–MacKinlay (1988) variance ratio VR(q=4) per series: under a
    * random walk the variance of q-period returns is q times the
    * 1-period variance, so VR ≈ 1; VR > 1 flags momentum, VR < 1 mean
    * reversion. Overlapping 4-period sums via a trailing window;
    * both population variances are exact-integer second moments
    * (n·Σx² − S², decimal ↔ HUGEINT), combined with ONE double
    * division: VR = [(nq·Σs²−Ss²)·n1²] / [q·(n1·Σr²−Sr²)·nq²].
    */
  private def varianceRatioQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("rn"))
      .rowsBetween(-3, 0)
    val base = returns(s, dir)
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__s", sum(col("r")).over(w))
    base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("r"))).as("s1"),
        sum(dec(col("r")) * dec(col("r"))).as("s11"),
        sum(when(col("__cnt") === 4L, lit(1L)).otherwise(lit(0L))).as("nq"),
        sum(when(col("__cnt") === 4L, dec(col("__s")))
          .otherwise(lit(null))).as("sq"),
        sum(when(col("__cnt") === 4L, dec(col("__s")) * dec(col("__s")))
          .otherwise(lit(null))).as("sqq"))
      .withColumn("__v1", dec(col("n")) * col("s11") - col("s1") * col("s1"))
      .withColumn("__vq", dec(col("nq")) * col("sqq") - col("sq") * col("sq"))
      .filter(col("__v1") > 0 && col("nq") >= 2L)
      .select(col("event_type"), col("n"), col("nq"),
        r4((col("__vq") * dec(col("n")) * dec(col("n"))).cast("double")
          / (lit(4.0d) * col("__v1").cast("double")
            * col("nq").cast("double") * col("nq").cast("double"))).as("vr4"))
      .orderBy(col("event_type"))
  }

  private val varianceRatioSql: String =
    s"""$returnsCte, win AS (
       |  SELECT event_type, r,
       |         count(*) OVER fr AS cnt,
       |         CAST(sum(r) OVER fr AS BIGINT) AS s
       |  FROM ret
       |  WINDOW fr AS (PARTITION BY event_type ORDER BY rn
       |                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
       |), mo AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(r AS HUGEINT)) AS s1,
       |         sum(CAST(r AS HUGEINT) * r) AS s11,
       |         CAST(sum(CASE WHEN cnt = 4 THEN 1 ELSE 0 END) AS BIGINT) AS nq,
       |         sum(CASE WHEN cnt = 4 THEN CAST(s AS HUGEINT) END) AS sq,
       |         sum(CASE WHEN cnt = 4 THEN CAST(s AS HUGEINT) * s END) AS sqq
       |  FROM win GROUP BY 1
       |), v AS (
       |  SELECT event_type, n, nq,
       |         CAST(n AS HUGEINT) * s11 - s1 * s1 AS v1,
       |         CAST(nq AS HUGEINT) * sqq - sq * sq AS vq
       |  FROM mo
       |)
       |SELECT event_type, n, nq,
       |       ${r4Sql("CAST(vq * n * n AS DOUBLE) / (4.0 * CAST(v1 AS DOUBLE)" +
                       " * CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE))")} AS vr4
       |FROM v WHERE v1 > 0 AND nq >= 2 ORDER BY event_type""".stripMargin

  // ----------------------------------------------------- runs test
  /** Wald–Wolfowitz (1940) runs test on the sign sequence of hourly
    * price changes: counts maximal runs of consecutive same-sign
    * moves and z-scores the count against its randomness expectation
    * μ = 1 + 2n₊n₋/n, σ² = 2n₊n₋(2n₊n₋−n) / (n²(n−1)). Zero changes
    * are skipped (the classical two-category form); all counts are
    * exact integers — 2n₊n₋(2n₊n₋−n) tops out near n⁴/4 ≈ 10¹⁵ for an
    * hourly panel, inside BIGINT — and z is formed with one double
    * division and one sqrt, identically ordered on both engines.
    */
  private def runsTestQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val signed = hourly(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull && col("c") =!= col("__p"))
      .withColumn("sgn", when(col("c") > col("__p"), lit(1L)).otherwise(lit(-1L)))
    val runs = signed
      .withColumn("__prev", lag(col("sgn"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("__prev").isNull || col("__prev") =!= col("sgn"), 1L)
          .otherwise(0L)).as("runs"))
      .withColumn("n", col("n_pos") + col("n_neg"))
      .withColumn("__m2", lit(2L) * col("n_pos") * col("n_neg"))
      .filter(col("n") >= 2L && col("__m2") > 0L)
    runs.select(col("event_type"), col("n_pos"), col("n_neg"), col("runs"),
        r4((col("runs").cast("double")
          - (lit(1.0d) + col("__m2").cast("double") / col("n").cast("double")))
          / sqrt((col("__m2").cast("double")
            * (col("__m2") - col("n")).cast("double"))
            / (col("n").cast("double") * col("n").cast("double")
              * (col("n") - 1L).cast("double")))).as("z"))
      .orderBy(col("event_type"))
  }

  private val runsTestSql: String =
    s"""$hourlyCte, d AS (
       |  SELECT event_type, bus, c,
       |         lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |  FROM hourly
       |), sgn AS (
       |  SELECT event_type, bus,
       |         CASE WHEN c > p THEN 1 ELSE -1 END AS sgn
       |  FROM d WHERE p IS NOT NULL AND c <> p
       |), rr AS (
       |  SELECT event_type, sgn,
       |         lag(sgn) OVER (PARTITION BY event_type ORDER BY bus) AS prev
       |  FROM sgn
       |), agg AS (
       |  SELECT event_type,
       |         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       |         CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END)
       |              AS BIGINT) AS runs
       |  FROM rr GROUP BY 1
       |), m AS (
       |  SELECT event_type, n_pos, n_neg, runs,
       |         n_pos + n_neg AS n, 2 * n_pos * n_neg AS m2
       |  FROM agg WHERE n_pos + n_neg >= 2 AND n_pos * n_neg > 0
       |)
       |SELECT event_type, n_pos, n_neg, runs,
       |       ${r4Sql("(CAST(runs AS DOUBLE) - (1.0 + CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE)))" +
                       " / sqrt((CAST(m2 AS DOUBLE) * CAST(m2 - n AS DOUBLE))" +
                       " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))")} AS z
       |FROM m ORDER BY event_type""".stripMargin

  // ------------------------------------------------------ Ljung–Box
  /** Ljung–Box (1978) portmanteau statistic over lags 1..5 of the
    * hourly micro-nat returns: Q = n(n+2)·Σₖ ρₖ²/(n−k); large Q
    * rejects "white noise". Each ρₖ is the lag-k Pearson correlation
    * on exact integer moments (the [[graft.ops.Indicators.autocorr]]
    * form, one double division per lag); all five lags are produced
    * by ONE equi-join of the checkpointed return frame with itself on
    * (series, rn−k = rn) with k exploded — one shuffle, not five
    * window passes — and the five ρₖ² terms are summed in fixed
    * ascending-k order on both engines.
    */
  private def ljungBoxQ(s: SparkSession, dir: String): DataFrame = {
    val base = returns(s, dir)
      .select(col("event_type"), col("r"), col("rn"))
      .localCheckpoint(false)
    val lhs = base
      .withColumn("k", explode(array((1 to 5).map(k => lit(k.toLong)): _*)))
      .select(col("event_type"), col("k"), col("r").as("y"),
        (col("rn") - col("k")).as("rnm"))
    val rhs = base.select(col("event_type"), col("rn").as("rnm"),
      col("r").as("x"))
    val rho = lhs.join(rhs, Seq("event_type", "rnm"))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("np"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      .withColumn("__vx", dec(col("np")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("__vy", dec(col("np")) * col("syy") - col("sy") * col("sy"))
      .filter(col("np") >= 2L && col("__vx") > 0 && col("__vy") > 0)
      .withColumn("rho",
        (dec(col("np")) * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt(col("__vx").cast("double")) * sqrt(col("__vy").cast("double"))))
    val n = returns(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    def rhoK(k: Int): Column = max(when(col("k") === k.toLong, col("rho")))
    rho.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nk"),
        rhoK(1).as("r1"), rhoK(2).as("r2"), rhoK(3).as("r3"),
        rhoK(4).as("r4_"), rhoK(5).as("r5"))
      .filter(col("nk") === 5L)
      .join(n, "event_type")
      .select(col("event_type"), col("n"),
        r4(col("r1")).as("rho1"),
        r4(col("n").cast("double") * (col("n") + 2L).cast("double") *
          (col("r1") * col("r1") / (col("n") - 1L).cast("double")
            + col("r2") * col("r2") / (col("n") - 2L).cast("double")
            + col("r3") * col("r3") / (col("n") - 3L).cast("double")
            + col("r4_") * col("r4_") / (col("n") - 4L).cast("double")
            + col("r5") * col("r5") / (col("n") - 5L).cast("double")))
          .as("q_lb"))
      .orderBy(col("event_type"))
  }

  private val ljungBoxSql: String =
    s"""$returnsCte, lhs AS (
       |  SELECT event_type, k, r AS y, rn - k AS rnm
       |  FROM ret CROSS JOIN (SELECT CAST(k AS BIGINT) AS k
       |                       FROM range(1, 6) t(k))
       |), pr AS (
       |  SELECT l.event_type, l.k, l.y, b.r AS x
       |  FROM lhs l JOIN ret b
       |    ON l.event_type = b.event_type AND l.rnm = b.rn
       |), mo AS (
       |  SELECT event_type, k, CAST(count(*) AS BIGINT) AS np,
       |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |         sum(CAST(x AS HUGEINT) * x) AS sxx,
       |         sum(CAST(y AS HUGEINT) * y) AS syy,
       |         sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM pr GROUP BY 1, 2
       |), rho AS (
       |  SELECT event_type, k,
       |         CAST(CAST(np AS HUGEINT) * sxy - sx * sy AS DOUBLE)
       |           / (sqrt(CAST(CAST(np AS HUGEINT) * sxx - sx * sx AS DOUBLE))
       |              * sqrt(CAST(CAST(np AS HUGEINT) * syy - sy * sy AS DOUBLE))) AS rho
       |  FROM mo
       |  WHERE np >= 2 AND CAST(np AS HUGEINT) * sxx - sx * sx > 0
       |    AND CAST(np AS HUGEINT) * syy - sy * sy > 0
       |), wide AS (
       |  SELECT event_type, count(*) AS nk,
       |         max(CASE WHEN k = 1 THEN rho END) AS r1,
       |         max(CASE WHEN k = 2 THEN rho END) AS r2,
       |         max(CASE WHEN k = 3 THEN rho END) AS r3,
       |         max(CASE WHEN k = 4 THEN rho END) AS r4_,
       |         max(CASE WHEN k = 5 THEN rho END) AS r5
       |  FROM rho GROUP BY 1 HAVING count(*) = 5
       |), nn AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ret GROUP BY 1
       |)
       |SELECT w.event_type, n, ${r4Sql("r1")} AS rho1,
       |       ${r4Sql("CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * (" +
                       "r1 * r1 / CAST(n - 1 AS DOUBLE)" +
                       " + r2 * r2 / CAST(n - 2 AS DOUBLE)" +
                       " + r3 * r3 / CAST(n - 3 AS DOUBLE)" +
                       " + r4_ * r4_ / CAST(n - 4 AS DOUBLE)" +
                       " + r5 * r5 / CAST(n - 5 AS DOUBLE))")} AS q_lb
       |FROM wide w JOIN nn USING (event_type) ORDER BY event_type""".stripMargin

  // ------------------------------------- range-based volatility pair
  /** Garman–Klass (1980) and Rogers–Satchell (1991) range-based
    * daily-variance estimators per series, from exact-cent daily OHLC:
    * GK = 0.5·ln(h/l)² − (2ln2−1)·ln(c/o)², RS = ln(h/c)ln(h/o) +
    * ln(l/c)ln(l/o) (drift-robust). Each day's estimate is
    * floor-quantized to nano-units BEFORE the per-series mean — the
    * sum is then an exact integer in both engines — and emitted in
    * micro-units (variance × 1e6) at 4 dp.
    */
  private def rangeVolQ(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Tables
    val daily = Tables.eventSeries(s, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        (expr("tus div 86400000000") * 86400000000L).as("day"))
      .agg(cents(min_by(col("value"), col("tus"))).as("o"),
        cents(max(col("value"))).as("h"),
        cents(min(col("value"))).as("l"),
        cents(max_by(col("value"), col("tus"))).as("c"))
      .filter(col("o") > 0L && col("l") > 0L)
    def lg(a: Column, b: Column): Column =
      log(a.cast("double") / b.cast("double"))
    val u = lg(col("h"), col("l"))
    val v = lg(col("c"), col("o"))
    val gk = lit(0.5d) * (u * u) -
      (lit(2.0d) * log(lit(2.0d)) - lit(1.0d)) * (v * v)
    val rs = lg(col("h"), col("c")) * lg(col("h"), col("o")) +
      lg(col("l"), col("c")) * lg(col("l"), col("o"))
    daily
      .withColumn("__gkq", floor(gk * lit(1.0e9d) + lit(0.5d)).cast("long"))
      .withColumn("__rsq", floor(rs * lit(1.0e9d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__gkq")).as("__sgk"), sum(col("__rsq")).as("__srs"))
      .select(col("event_type"), col("n_days"),
        r4(col("__sgk").cast("double") / col("n_days").cast("double")
          / lit(1000.0d)).as("gk_var_e6"),
        r4(col("__srs").cast("double") / col("n_days").cast("double")
          / lit(1000.0d)).as("rs_var_e6"))
      .orderBy(col("event_type"))
  }

  private val rangeVolSql: String =
    s"""${TimeSeriesQueries.seriesCte}, daily AS (
       |  SELECT event_type, (tus // 86400000000) * 86400000000 AS day,
       |         ${centsSql("min_by(value, tus)")} AS o,
       |         ${centsSql("max(value)")} AS h,
       |         ${centsSql("min(value)")} AS l,
       |         ${centsSql("max_by(value, tus)")} AS c
       |  FROM series GROUP BY 1, 2
       |), est AS (
       |  SELECT event_type,
       |         CAST(floor((0.5 * (ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
       |                            * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)))
       |              - (2.0 * ln(2.0) - 1.0)
       |                * (ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))
       |                   * ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))))
       |              * 1000000000.0 + 0.5) AS BIGINT) AS gkq,
       |         CAST(floor((ln(CAST(h AS DOUBLE) / CAST(c AS DOUBLE))
       |                     * ln(CAST(h AS DOUBLE) / CAST(o AS DOUBLE))
       |              + ln(CAST(l AS DOUBLE) / CAST(c AS DOUBLE))
       |                * ln(CAST(l AS DOUBLE) / CAST(o AS DOUBLE)))
       |              * 1000000000.0 + 0.5) AS BIGINT) AS rsq
       |  FROM daily WHERE o > 0 AND l > 0
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |       ${r4Sql("CAST(sum(gkq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0")} AS gk_var_e6,
       |       ${r4Sql("CAST(sum(rsq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0")} AS rs_var_e6
       |FROM est GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------- lead-lag cross-correlation
  /** Lead-lag cross-correlation panel: Pearson correlation of hourly
    * micro-nat returns for every ordered series pair (a < b) at lags
    * L ∈ [−3, 3] hours (positive L = a leads b). The price-discovery
    * screen: which series moves first. One equi-join on
    * (bus + L·3600s = bus) with L exploded — the panel is
    * series² × 7 rows, model-sized; the join shuffles the rolled-up
    * hourly frame once. Exact integer moments, one double division.
    */
  private def xcorrQ(s: SparkSession, dir: String): DataFrame = {
    val base = returns(s, dir)
      .select(col("event_type"), col("bus"), col("r"))
      .localCheckpoint(false)
    val lags = array((-3 to 3).map(l => lit(l.toLong)): _*)
    val lhs = base
      .withColumn("lag_h", explode(lags))
      .select(col("event_type").as("a"), col("lag_h"),
        col("r").as("x"), (col("bus") + col("lag_h") * 3600000000L).as("jb"))
    val rhs = base.select(col("event_type").as("b"), col("bus").as("jb"),
      col("r").as("y"))
    lhs.join(rhs, "jb")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("lag_h"))
      .agg(count(lit(1)).as("np"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      .withColumn("__vx", dec(col("np")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("__vy", dec(col("np")) * col("syy") - col("sy") * col("sy"))
      .filter(col("np") >= 2L && col("__vx") > 0 && col("__vy") > 0)
      .select(col("a"), col("b"), col("lag_h"), col("np").as("n"),
        r4((dec(col("np")) * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt(col("__vx").cast("double"))
            * sqrt(col("__vy").cast("double")))).as("xcorr"))
      .orderBy(col("a"), col("b"), col("lag_h"))
  }

  private val xcorrSql: String =
    s"""$returnsCte, lhs AS (
       |  SELECT event_type AS a, lag_h, r AS x,
       |         bus + lag_h * 3600000000 AS jb
       |  FROM ret CROSS JOIN (SELECT CAST(l AS BIGINT) AS lag_h
       |                       FROM range(-3, 4) t(l))
       |), pr AS (
       |  SELECT l.a, b.event_type AS b, l.lag_h, l.x, b.r AS y
       |  FROM lhs l JOIN ret b ON l.jb = b.bus
       |  WHERE l.a < b.event_type
       |), mo AS (
       |  SELECT a, b, lag_h, CAST(count(*) AS BIGINT) AS np,
       |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |         sum(CAST(x AS HUGEINT) * x) AS sxx,
       |         sum(CAST(y AS HUGEINT) * y) AS syy,
       |         sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM pr GROUP BY 1, 2, 3
       |)
       |SELECT a, b, lag_h, np AS n,
       |       ${r4Sql("CAST(CAST(np AS HUGEINT) * sxy - sx * sy AS DOUBLE)" +
                       " / (sqrt(CAST(CAST(np AS HUGEINT) * sxx - sx * sx AS DOUBLE))" +
                       " * sqrt(CAST(CAST(np AS HUGEINT) * syy - sy * sy AS DOUBLE)))")} AS xcorr
       |FROM mo
       |WHERE np >= 2 AND CAST(np AS HUGEINT) * sxx - sx * sx > 0
       |  AND CAST(np AS HUGEINT) * syy - sy * sy > 0
       |ORDER BY a, b, lag_h""".stripMargin

  // -------------------------------------------- pairs-trading z-score
  /** Pairs-trading screen per ordered series pair (a < b): the OLS
    * hedge ratio β of b's close on a's, then the z-score of the LAST
    * hedge spread s_t = c_b − β·c_a against the spread's own history.
    * ONE aggregation over the paired frame carries every moment the
    * spread distribution needs — Σc_a, Σc_b, Σc_a², Σc_b², Σc_a·c_b
    * (exact decimal ↔ HUGEINT) plus the last closes by bus — because
    * the spread moments expand algebraically: Σs = Σc_b − βΣc_a,
    * Σs² = Σc_b² − 2βΣc_ac_b + β²Σc_a². β, the mean, the variance and
    * z are then one fixed-order float expression over exact integers
    * (identical IEEE ops in both engines; the round-14 two-pass
    * quantized-spread form was measured at 1.6 s and replaced — the
    * algebra removes the checkpoint AND the second pass). |z| > 2 is
    * the classical entry signal. The paired frame is series²×hours —
    * model-sized at any corpus scale.
    */
  private def pairsZQ(s: SparkSession, dir: String): DataFrame = {
    val h = hourly(s, dir)
    val a = h.select(col("event_type").as("a"), col("bus"), col("c").as("ca"))
    val b = h.select(col("event_type").as("b"), col("bus"), col("c").as("cb"))
    val mo = a.join(b, "bus").filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("ca"))).as("sxa"), sum(dec(col("cb"))).as("sxb"),
        sum(dec(col("ca")) * dec(col("ca"))).as("saa"),
        sum(dec(col("cb")) * dec(col("cb"))).as("sbb"),
        sum(dec(col("ca")) * dec(col("cb"))).as("sab"),
        max_by(col("ca"), col("bus")).as("ca_t"),
        max_by(col("cb"), col("bus")).as("cb_t"))
      .withColumn("__den", dec(col("n")) * col("saa") - col("sxa") * col("sxa"))
      .filter(col("__den") > 0)
    val nD = col("n").cast("double")
    val beta = (dec(col("n")) * col("sab") - col("sxa") * col("sxb"))
      .cast("double") / col("__den").cast("double")
    val withBeta = mo.withColumn("__beta", beta)
    val m = (col("sxb").cast("double") - col("__beta") * col("sxa").cast("double")) / nD
    val ex2 = (col("sbb").cast("double")
      - lit(2.0d) * col("__beta") * col("sab").cast("double")
      + col("__beta") * col("__beta") * col("saa").cast("double")) / nD
    val sT = col("cb_t").cast("double") - col("__beta") * col("ca_t").cast("double")
    withBeta
      .withColumn("__m", m)
      .withColumn("__var", ex2 - col("__m") * col("__m"))
      .filter(col("__var") > 0.0d)
      .select(col("a"), col("b"), col("n"), r4(col("__beta")).as("beta"),
        r4((sT - col("__m")) / sqrt(col("__var"))).as("z_last"))
      .orderBy(col("a"), col("b"))
  }

  private val pairsZSql: String =
    s"""$hourlyCte, pa AS (
       |  SELECT event_type AS a, bus, c AS ca FROM hourly
       |), pb AS (
       |  SELECT event_type AS b, bus, c AS cb FROM hourly
       |), mo AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(ca AS HUGEINT)) AS sxa, sum(CAST(cb AS HUGEINT)) AS sxb,
       |         sum(CAST(ca AS HUGEINT) * ca) AS saa,
       |         sum(CAST(cb AS HUGEINT) * cb) AS sbb,
       |         sum(CAST(ca AS HUGEINT) * cb) AS sab,
       |         max_by(ca, bus) AS ca_t, max_by(cb, bus) AS cb_t
       |  FROM pa JOIN pb USING (bus) WHERE a < b
       |  GROUP BY 1, 2
       |  HAVING CAST(count(*) AS HUGEINT) * sum(CAST(ca AS HUGEINT) * ca)
       |         - sum(CAST(ca AS HUGEINT)) * sum(CAST(ca AS HUGEINT)) > 0
       |), sc AS (
       |  SELECT a, b, n,
       |         CAST(CAST(n AS HUGEINT) * sab - sxa * sxb AS DOUBLE)
       |           / CAST(CAST(n AS HUGEINT) * saa - sxa * sxa AS DOUBLE) AS beta,
       |         CAST(sxa AS DOUBLE) AS sxad, CAST(sxb AS DOUBLE) AS sxbd,
       |         CAST(saa AS DOUBLE) AS saad, CAST(sbb AS DOUBLE) AS sbbd,
       |         CAST(sab AS DOUBLE) AS sabd,
       |         CAST(ca_t AS DOUBLE) AS cat, CAST(cb_t AS DOUBLE) AS cbt
       |  FROM mo
       |), z AS (
       |  SELECT a, b, n, beta,
       |         (sxbd - beta * sxad) / CAST(n AS DOUBLE) AS m,
       |         (sbbd - 2.0 * beta * sabd + beta * beta * saad)
       |           / CAST(n AS DOUBLE) AS ex2,
       |         cbt - beta * cat AS st
       |  FROM sc
       |)
       |SELECT a, b, n, ${r4Sql("beta")} AS beta,
       |       ${r4Sql("(st - m) / sqrt(ex2 - m * m)")} AS z_last
       |FROM z WHERE ex2 - m * m > 0.0
       |ORDER BY a, b""".stripMargin

  // ------------------------------------------------------ event study
  /** Event-study average around large moves (MacKinlay, JEL 1997):
    * event hours are those whose micro-nat return clears 3 population
    * sigmas — detected with the EXACT integer inequality
    * n²·r² > 9·(n·Σr² − S²) AND a sign carried so the panel averages
    * signed post-event drift (events aligned by shock direction:
    * returns at +τ are multiplied by the event's sign). Only events
    * with the full −3..+5 offset window inside the series count, so
    * every (series, τ) cell averages the same event set and the
    * cumulative average return is an exact prefix sum over τ. One
    * equi-join of the checkpointed return frame against the event
    * list with τ exploded — events × 9 rows, never a window per
    * offset.
    */
  private def eventStudyQ(s: SparkSession, dir: String): DataFrame = {
    val base = returns(s, dir)
      .select(col("event_type"), col("r"), col("rn"))
      .localCheckpoint(false)
    val mo = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("r"))).as("s1"),
        sum(dec(col("r")) * dec(col("r"))).as("s2"))
      .withColumn("__v", dec(col("n")) * col("s2") - col("s1") * col("s1"))
      .filter(col("__v") > 0)
      .select(col("event_type"), col("n"), col("__v"))
    val ev = base.join(broadcast(mo), "event_type")
      .filter(
        dec(col("n")) * dec(col("n")) * dec(col("r")) * dec(col("r"))
          > lit(9) * col("__v"))
      .filter(col("rn") >= 4L && col("rn") <= col("n") - 5L)
      .select(col("event_type"), col("rn").as("rn_e"),
        when(col("r") >= 0L, lit(1L)).otherwise(lit(-1L)).as("sgn"))
    val panel = ev
      .withColumn("tau", explode(array((-3 to 5).map(t => lit(t.toLong)): _*)))
      .select(col("event_type"), col("tau"), col("sgn"),
        (col("rn_e") + col("tau")).as("rn"))
      .join(base, Seq("event_type", "rn"))
      .groupBy(col("event_type"), col("tau"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("sgn") * col("r")).as("__sr"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("tau"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    panel
      .withColumn("__car_q", sum(col("__sr")).over(w))
      .select(col("event_type"), col("tau"), col("n_events"),
        r4(col("__sr").cast("double") / col("n_events").cast("double")
          / lit(1000000.0d)).as("avg_r"),
        r4(col("__car_q").cast("double") / col("n_events").cast("double")
          / lit(1000000.0d)).as("car"))
      .orderBy(col("event_type"), col("tau"))
  }

  private val eventStudySql: String =
    s"""$returnsCte, mo AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(r AS HUGEINT)) AS s1,
       |         sum(CAST(r AS HUGEINT) * r) AS s2
       |  FROM ret GROUP BY 1
       |), mv AS (
       |  SELECT event_type, n,
       |         CAST(n AS HUGEINT) * s2 - s1 * s1 AS v
       |  FROM mo WHERE CAST(n AS HUGEINT) * s2 - s1 * s1 > 0
       |), ev AS (
       |  SELECT ret.event_type, rn AS rn_e,
       |         CASE WHEN r >= 0 THEN 1 ELSE -1 END AS sgn
       |  FROM ret JOIN mv USING (event_type)
       |  WHERE CAST(n AS HUGEINT) * n * r * r > 9 * v
       |    AND rn >= 4 AND rn <= n - 5
       |), panel AS (
       |  SELECT e.event_type, t.tau, CAST(count(*) AS BIGINT) AS n_events,
       |         CAST(sum(e.sgn * b.r) AS BIGINT) AS sr
       |  FROM ev e
       |  CROSS JOIN (SELECT CAST(tau AS BIGINT) AS tau FROM range(-3, 6) t(tau)) t
       |  JOIN ret b ON b.event_type = e.event_type AND b.rn = e.rn_e + t.tau
       |  GROUP BY 1, 2
       |)
       |SELECT event_type, tau, n_events,
       |       ${r4Sql("CAST(sr AS DOUBLE) / CAST(n_events AS DOUBLE) / 1000000.0")} AS avg_r,
       |       ${r4Sql("CAST(sum(sr) OVER (PARTITION BY event_type ORDER BY tau" +
                       " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)" +
                       " / CAST(n_events AS DOUBLE) / 1000000.0")} AS car
       |FROM panel ORDER BY event_type, tau""".stripMargin

  // --------------------------------------- Corwin–Schultz spread
  /** Corwin & Schultz (JF 2012) high-low spread estimator per series:
    * consecutive-day high-low ranges embed both variance (scales with
    * time) and spread (doesn't), so β = Σ ln(h/l)² over two days vs
    * γ = ln(H₂/L₂)² over the joined window separate them:
    * α = (√(2β)−√β)/(3−2√2) − √(γ/(3−2√2)), s = 2(eᵅ−1)/(1+eᵅ).
    * Daily OHLC is exact cents; each day-pair's s is one fixed float
    * expression over exact integers (identical IEEE op order both
    * engines), floor-quantized to nano-units BEFORE the per-series
    * mean — negative-alpha pairs are kept as-is (the paper's "set to
    * zero" variant is a downstream choice; reporting the raw mean
    * keeps the estimator unbiased-comparable). One window lead over
    * the daily frame, one keyed aggregation.
    */
  private def corwinSchultzQ(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Tables
    val daily = Tables.eventSeries(s, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("event_type"),
        expr("tus div 86400000000").as("day"))
      .agg(cents(max(col("value"))).as("h"), cents(min(col("value"))).as("l"))
      .filter(col("l") > 0L)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def lg(a: Column, b: Column): Column =
      log(a.cast("double") / b.cast("double"))
    val withNext = daily
      .withColumn("h2", lead(col("h"), 1).over(w))
      .withColumn("l2", lead(col("l"), 1).over(w))
      .withColumn("d2", lead(col("day"), 1).over(w))
      .filter(col("h2").isNotNull && col("d2") === col("day") + 1L)
    val beta = lg(col("h"), col("l")) * lg(col("h"), col("l")) +
      lg(col("h2"), col("l2")) * lg(col("h2"), col("l2"))
    val gamma = lg(greatest(col("h"), col("h2")), least(col("l"), col("l2"))) *
      lg(greatest(col("h"), col("h2")), least(col("l"), col("l2")))
    val k = lit(3.0d) - lit(2.0d) * sqrt(lit(2.0d))
    val alpha = (sqrt(lit(2.0d) * beta) - sqrt(beta)) / k - sqrt(gamma / k)
    val spread = lit(2.0d) * (exp(alpha) - lit(1.0d)) / (lit(1.0d) + exp(alpha))
    withNext
      .withColumn("__sq", floor(spread * lit(1.0e9d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__sq")).as("__ss"))
      .select(col("event_type"), col("n_pairs"),
        r4(col("__ss").cast("double") / col("n_pairs").cast("double")
          / lit(100000.0d)).as("cs_spread_e4"))
      .orderBy(col("event_type"))
  }

  private val corwinSchultzSql: String = {
    val lgHL = "ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))"
    val lgHL2 = "ln(CAST(h2 AS DOUBLE) / CAST(l2 AS DOUBLE))"
    val lgG = "ln(CAST(greatest(h, h2) AS DOUBLE) / CAST(least(l, l2) AS DOUBLE))"
    val kSql = "(3.0 - 2.0 * sqrt(2.0))"
    val betaSql = s"($lgHL * $lgHL + $lgHL2 * $lgHL2)"
    val alphaSql = s"((sqrt(2.0 * $betaSql) - sqrt($betaSql)) / $kSql" +
      s" - sqrt(($lgG * $lgG) / $kSql))"
    s"""${TimeSeriesQueries.seriesCte}, daily AS (
       |  SELECT event_type, tus // 86400000000 AS day,
       |         ${centsSql("max(value)")} AS h, ${centsSql("min(value)")} AS l
       |  FROM series GROUP BY 1, 2
       |), p AS (
       |  SELECT event_type, day, h, l,
       |         lead(h) OVER w AS h2, lead(l) OVER w AS l2,
       |         lead(day) OVER w AS d2
       |  FROM daily WHERE l > 0
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
       |), q AS (
       |  SELECT event_type,
       |         CAST(floor(2.0 * (exp($alphaSql) - 1.0) / (1.0 + exp($alphaSql))
       |              * 1000000000.0 + 0.5) AS BIGINT) AS sq
       |  FROM p WHERE h2 IS NOT NULL AND d2 = day + 1
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       |       ${r4Sql("CAST(sum(sq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100000.0")} AS cs_spread_e4
       |FROM q GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------- VPIN
  /** VPIN — volume-synchronized probability of informed trading
    * (Easley, López de Prado & O'Hara, RFS 2012): classify each
    * hour's volume by the tick rule (sign of Δclose; zero-change
    * inherits nothing and splits evenly, the paper's neutral
    * handling), cut the flow into equal-VOLUME buckets of the
    * series' total/50 (integer cumulative-volume division — exact,
    * deterministic), and report VPIN = mean over buckets of
    * |V_buy − V_sell| / V_bucket. Doubled volumes (×2) keep the even
    * split of zero-change hours integer-exact. Toxic flow ⇒ VPIN → 1.
    * One window pass (lag + cumulative sum), one bucket aggregation.
    */
  private def vpinQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val flows = IndicatorQueries.hourlyOhlcQty(s, dir)
      .withColumn("__p", lag(col("c"), 1).over(w))
      .filter(col("__p").isNotNull && col("qty") > 0L)
      .withColumn("v2", col("qty") * 2L)
      .withColumn("buy2",
        when(col("c") > col("__p"), col("qty") * 2L)
          .when(col("c") < col("__p"), lit(0L))
          .otherwise(col("qty")))
      .withColumn("cum", sum(col("v2")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // flows feeds BOTH the per-series total (bucket sizing) and the
      // bucket cut join — localCheckpoint stops the events→hourly→
      // window pipeline running twice (the ts_vpoc lesson; flows is
      // one row per (series, hour))
      .localCheckpoint(false)
    val tot = flows.groupBy(col("event_type"))
      .agg(sum(col("v2")).as("vt"))
      .withColumn("bsize", greatest(expr("vt div 50"), lit(1L)))
    flows.join(broadcast(tot), "event_type")
      .withColumn("bucket", expr("(cum - 1) div bsize"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("buy2")).as("b"), sum(col("v2")).as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(floor(abs(col("b") * 2L - col("v")).cast("double")
          / col("v").cast("double") * lit(1.0e9d) + lit(0.5d)).cast("long"))
          .as("__sq"))
      .select(col("event_type"), col("n_buckets"),
        r4(col("__sq").cast("double") / col("n_buckets").cast("double")
          / lit(1.0e9d)).as("vpin"))
      .orderBy(col("event_type"))
  }

  private val vpinSql: String =
    s"""${IndicatorQueries.hourlyCte}, q AS (
       |  SELECT event_type,
       |         ((epoch_ns(ts) // 1000) // 3600000000) * 3600000000 AS bus,
       |         CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS qty
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2
       |), hq AS (
       |  SELECT event_type, bus, c, coalesce(qty, 0) AS qty
       |  FROM hourly LEFT JOIN q USING (event_type, bus)
       |), fl AS (
       |  SELECT event_type, bus, qty * 2 AS v2,
       |         CASE WHEN c > p THEN qty * 2
       |              WHEN c < p THEN 0 ELSE qty END AS buy2
       |  FROM (SELECT event_type, bus, c, qty,
       |               lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS p
       |        FROM hq)
       |  WHERE p IS NOT NULL AND qty > 0
       |), cu AS (
       |  SELECT event_type, v2, buy2,
       |         CAST(sum(v2) OVER (PARTITION BY event_type ORDER BY bus
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |              AS BIGINT) AS cum
       |  FROM fl
       |), tot AS (
       |  SELECT event_type, greatest(sum(v2) // 50, 1) AS bsize
       |  FROM fl GROUP BY 1
       |), bk AS (
       |  SELECT c.event_type, (cum - 1) // bsize AS bucket,
       |         CAST(sum(buy2) AS BIGINT) AS b, CAST(sum(v2) AS BIGINT) AS v
       |  FROM cu c JOIN tot USING (event_type)
       |  GROUP BY 1, 2
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
       |       ${r4Sql("CAST(sum(CAST(floor(CAST(abs(b * 2 - v) AS DOUBLE)" +
                       " / CAST(v AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)" +
                       " / CAST(count(*) AS DOUBLE) / 1000000000.0")} AS vpin
       |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ time underwater
  /** Drawdown duration — the risk dimension `ts_drawdown`'s depth
    * number misses: how LONG the series sits below its running peak.
    * Underwater = close strictly below the running max; runs found by
    * the gaps-and-islands identity (global row index minus underwater
    * row index is constant within a run — exact integers, one window
    * pass each). Reports the longest run, the total underwater share,
    * and the count of distinct underwater spells.
    */
  private def underwaterQ(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val uw = hourly(s, dir)
      .withColumn("__pk", max(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("c") < col("__pk"))
      .withColumn("__rnu", row_number().over(w))
      .withColumn("__grp", col("__rn") - col("__rnu"))
    uw.groupBy(col("event_type"), col("__grp"))
      .agg(count(lit(1)).as("__len"), first(col("__n")).as("__n"))
      .groupBy(col("event_type"))
      .agg(first(col("__n")).as("n"),
        sum(col("__len")).as("n_underwater"),
        max(col("__len")).as("max_spell_h"),
        count(lit(1)).as("n_spells"))
      .select(col("event_type"), col("n"), col("n_underwater"),
        col("max_spell_h"), col("n_spells"),
        r4(col("n_underwater").cast("double") / col("n").cast("double"))
          .as("underwater_share"))
      .orderBy(col("event_type"))
  }

  private val underwaterSql: String =
    s"""$hourlyCte, pk AS (
       |  SELECT event_type, bus, c,
       |         max(c) OVER (PARTITION BY event_type ORDER BY bus
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
       |         row_number() OVER (PARTITION BY event_type ORDER BY bus) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM hourly
       |), uw AS (
       |  SELECT event_type, n, rn,
       |         rn - row_number() OVER (PARTITION BY event_type ORDER BY bus) AS grp
       |  FROM pk WHERE c < p
       |), runs AS (
       |  SELECT event_type, grp, CAST(count(*) AS BIGINT) AS len,
       |         any_value(n) AS n
       |  FROM uw GROUP BY 1, 2
       |)
       |SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
       |       CAST(sum(len) AS BIGINT) AS n_underwater,
       |       CAST(max(len) AS BIGINT) AS max_spell_h,
       |       CAST(count(*) AS BIGINT) AS n_spells,
       |       ${r4Sql("CAST(sum(len) AS DOUBLE) / CAST(any_value(n) AS DOUBLE)")} AS underwater_share
       |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ Granger lead-lag
  /** Granger-style lag-1 lead-lag test (Granger, Econometrica 1969)
    * for every ordered series pair (src, tgt): does src's PREVIOUS
    * hourly price change improve the AR(1) prediction of tgt's
    * current change? Restricted model dy_t ~ dy_{t-1}; full model
    * adds dx_{t-1}; F = (RSS_r − RSS_f)·(n−3)/RSS_f with 1 numerator
    * df. The directional counterpart of `ts_xcorr`'s symmetric panel.
    *
    * Exactness: changes are exact cent Longs; the 2×2 normal
    * equations are solved from scaled centered moments
    * M_ab = n·Σab − Σa·Σb held in decimal/HUGEINT, each cast to
    * double exactly once, so β's, RSS's and F are the same fixed
    * float expression in both engines. n·RSS scaling cancels in F.
    */
  private def grangerQ(s: SparkSession, dir: String): DataFrame = {
    val wlag = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val dd = hourly(s, dir)
      .withColumn("d", col("c") - lag(col("c"), 1).over(wlag))
      .withColumn("d1", lag(col("d"), 1).over(wlag))
      .filter(col("d").isNotNull && col("d1").isNotNull)
      .localCheckpoint(false) // consumed as target AND predictor side
    val yf = dd.select(col("event_type").as("tgt"), col("bus"),
      col("d").as("dy"), col("d1").as("dy1"))
    val xf = dd.select(col("event_type").as("src"), col("bus"),
      col("d1").as("dx1"))
    val mo = yf.join(xf, Seq("bus")).filter(col("src") =!= col("tgt"))
      .groupBy(col("src"), col("tgt"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("dy"))).as("sy"),
        sum(dec(col("dy1"))).as("sy1"),
        sum(dec(col("dx1"))).as("sx1"),
        sum(dec(col("dy")) * dec(col("dy"))).as("syy"),
        sum(dec(col("dy")) * dec(col("dy1"))).as("syy1"),
        sum(dec(col("dy")) * dec(col("dx1"))).as("syx1"),
        sum(dec(col("dy1")) * dec(col("dy1"))).as("sy1y1"),
        sum(dec(col("dx1")) * dec(col("dx1"))).as("sx1x1"),
        sum(dec(col("dy1")) * dec(col("dx1"))).as("sy1x1"))
      .filter(col("n") > 3)
    def m(sab: Column, sa: Column, sb: Column): Column =
      (dec(col("n")) * sab - sa * sb).cast("double")
    val withM = mo
      .withColumn("myy",   m(col("syy"),   col("sy"),  col("sy")))
      .withColumn("myy1",  m(col("syy1"),  col("sy"),  col("sy1")))
      .withColumn("myx1",  m(col("syx1"),  col("sy"),  col("sx1")))
      .withColumn("my1y1", m(col("sy1y1"), col("sy1"), col("sy1")))
      .withColumn("mx1x1", m(col("sx1x1"), col("sx1"), col("sx1")))
      .withColumn("my1x1", m(col("sy1x1"), col("sy1"), col("sx1")))
      .withColumn("det",
        col("my1y1") * col("mx1x1") - col("my1x1") * col("my1x1"))
      .filter(col("my1y1") > 0.0d && col("det") > 0.0d)
      .withColumn("b",
        (col("myy1") * col("mx1x1") - col("myx1") * col("my1x1")) / col("det"))
      .withColumn("cx",
        (col("myx1") * col("my1y1") - col("myy1") * col("my1x1")) / col("det"))
      .withColumn("rss_r",
        col("myy") - col("myy1") * col("myy1") / col("my1y1"))
      .withColumn("rss_f",
        col("myy") - (col("b") * col("myy1") + col("cx") * col("myx1")))
      .filter(col("rss_f") > 0.0d)
    withM.select(col("src"), col("tgt"), col("n"),
        r4(col("b")).as("beta_ar"), r4(col("cx")).as("beta_x"),
        r4((col("rss_r") - col("rss_f"))
          * (col("n").cast("double") - lit(3.0d)) / col("rss_f")).as("f_stat"))
      .orderBy(col("src"), col("tgt"))
  }

  private val grangerSql: String =
    s"""$hourlyCte, gd AS (
       |  SELECT event_type, bus,
       |         c - lag(c) OVER (PARTITION BY event_type ORDER BY bus) AS d
       |  FROM hourly
       |), gdd AS (
       |  SELECT event_type, bus, d,
       |         lag(d) OVER (PARTITION BY event_type ORDER BY bus) AS d1
       |  FROM gd
       |), gv AS (
       |  SELECT event_type, bus, d, d1 FROM gdd
       |  WHERE d IS NOT NULL AND d1 IS NOT NULL
       |), gmo AS (
       |  SELECT x.event_type AS src, y.event_type AS tgt,
       |         CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(y.d AS HUGEINT)) AS sy,
       |         sum(CAST(y.d1 AS HUGEINT)) AS sy1,
       |         sum(CAST(x.d1 AS HUGEINT)) AS sx1,
       |         sum(CAST(y.d AS HUGEINT) * y.d) AS syy,
       |         sum(CAST(y.d AS HUGEINT) * y.d1) AS syy1,
       |         sum(CAST(y.d AS HUGEINT) * x.d1) AS syx1,
       |         sum(CAST(y.d1 AS HUGEINT) * y.d1) AS sy1y1,
       |         sum(CAST(x.d1 AS HUGEINT) * x.d1) AS sx1x1,
       |         sum(CAST(y.d1 AS HUGEINT) * x.d1) AS sy1x1
       |  FROM gv y JOIN gv x USING (bus)
       |  WHERE x.event_type <> y.event_type
       |  GROUP BY 1, 2 HAVING count(*) > 3
       |), gm AS (
       |  SELECT src, tgt, n,
       |         CAST(n * syy  - sy  * sy  AS DOUBLE) AS myy,
       |         CAST(n * syy1 - sy  * sy1 AS DOUBLE) AS myy1,
       |         CAST(n * syx1 - sy  * sx1 AS DOUBLE) AS myx1,
       |         CAST(n * sy1y1 - sy1 * sy1 AS DOUBLE) AS my1y1,
       |         CAST(n * sx1x1 - sx1 * sx1 AS DOUBLE) AS mx1x1,
       |         CAST(n * sy1x1 - sy1 * sx1 AS DOUBLE) AS my1x1
       |  FROM gmo
       |), gb AS (
       |  SELECT src, tgt, n, myy, myy1, myx1, my1y1,
       |         (myy1 * mx1x1 - myx1 * my1x1)
       |           / (my1y1 * mx1x1 - my1x1 * my1x1) AS b,
       |         (myx1 * my1y1 - myy1 * my1x1)
       |           / (my1y1 * mx1x1 - my1x1 * my1x1) AS cx
       |  FROM gm
       |  WHERE my1y1 > 0 AND (my1y1 * mx1x1 - my1x1 * my1x1) > 0
       |), gr AS (
       |  SELECT src, tgt, n, b, cx,
       |         myy - myy1 * myy1 / my1y1 AS rss_r,
       |         myy - (b * myy1 + cx * myx1) AS rss_f
       |  FROM gb
       |)
       |SELECT src, tgt, n, ${r4Sql("b")} AS beta_ar, ${r4Sql("cx")} AS beta_x,
       |       ${r4Sql("(rss_r - rss_f) * (CAST(n AS DOUBLE) - 3.0) / rss_f")} AS f_stat
       |FROM gr WHERE rss_f > 0
       |ORDER BY src, tgt""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_granger" -> grangerQ,
    "ts_underwater" -> underwaterQ,
    "ts_corwin_schultz" -> corwinSchultzQ,
    "ts_vpin" -> vpinQ,
    "ts_event_study" -> eventStudyQ,
    "ts_roll_spread" -> rollSpreadQ,
    "ts_variance_ratio" -> varianceRatioQ,
    "ts_runs_test" -> runsTestQ,
    "ts_ljung_box" -> ljungBoxQ,
    "ts_range_vol" -> rangeVolQ,
    "ts_xcorr" -> xcorrQ,
    "ts_pairs_z" -> pairsZQ,
  )

  def oracleSql: Map[String, String] = Map(
    "ts_granger" -> grangerSql,
    "ts_underwater" -> underwaterSql,
    "ts_corwin_schultz" -> corwinSchultzSql,
    "ts_vpin" -> vpinSql,
    "ts_event_study" -> eventStudySql,
    "ts_roll_spread" -> rollSpreadSql,
    "ts_variance_ratio" -> varianceRatioSql,
    "ts_runs_test" -> runsTestSql,
    "ts_ljung_box" -> ljungBoxSql,
    "ts_range_vol" -> rangeVolSql,
    "ts_xcorr" -> xcorrSql,
    "ts_pairs_z" -> pairsZSql,
  )
}
