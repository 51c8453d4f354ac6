package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical-indicator operators over keyed time series — the analytics
  * a user of the reference's OHLCV stack layers on the candle tables it
  * serves (the reference stops at SMA, reference
  * web/frontend/src/components/functions/chart.js:298-312; RSI /
  * Bollinger / EMA / VWAP are the canonical next indicators on the same
  * read path).
  *
  * Scale shape shared by all four: one window partitioned by the series
  * key with a bounded ROWS frame — Spark plans a single hash exchange
  * on the key followed by a streaming WindowExec; no self-joins, no
  * per-row subqueries, state per partition is O(frame), so a series of
  * any length streams. Value arithmetic follows the
  * [[graft.catalog.Oracle]] discipline: exact 2-dp values are lifted to
  * Long cents so every windowed SUM is integer-exact and
  * order-independent, with one float division at the end.
  */
object Indicators {

  /** Cutler's RSI over `periods` deltas (simple-average form — the
    * SQL-expressible variant; Wilder's recursive smoothing is the
    * [[emaTruncated]] fold applied to gains, not a different operator).
    * `closeCents` must be an integer (cents-lifted) column.
    *
    * RSI = 100·ΣGain / (ΣGain + ΣLoss) over the trailing `periods`
    * deltas; rows with fewer than `periods` deltas in frame emit null
    * (warm-up), an all-flat frame (ΣG+ΣL = 0) emits 50 — both
    * decisions on exact integers, so the cut is engine-deterministic.
    */
  def rsi(series: DataFrame, keys: Seq[Column], ts: Column,
          closeCents: Column, periods: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(periods - 1), 0)
    val delta = closeCents - lag(closeCents, 1).over(ord)
    series
      .withColumn("__delta", delta)
      .withColumn("__gain", when(col("__delta") > 0, col("__delta")).otherwise(lit(0L)))
      .withColumn("__loss", when(col("__delta") < 0, -col("__delta")).otherwise(lit(0L)))
      .withColumn("__n", count(col("__delta")).over(frame))
      .withColumn("__sg", sum(col("__gain")).over(frame))
      .withColumn("__sl", sum(col("__loss")).over(frame))
      .withColumn("rsi",
        when(col("__n") < periods, lit(null).cast("double"))
          .when(col("__sg") + col("__sl") === 0L, lit(50.0d))
          .otherwise(lit(100.0d) * col("__sg") / (col("__sg") + col("__sl")).cast("double")))
      .drop("__delta", "__gain", "__loss", "__n", "__sg", "__sl")
  }

  /** Bollinger bands: n-row trailing mean ± k population standard
    * deviations. Moments accumulate as integer cents sums (Σc, Σc²) —
    * exact and order-independent — and convert to doubles in one fixed
    * expression: sd = √(n·Σc² − (Σc)²)/n, evaluated identically by any
    * engine. Warm-up rows (frame < n) emit null bands.
    */
  def bollinger(series: DataFrame, keys: Seq[Column], ts: Column,
                closeCents: Column, n: Int, k: Double): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    val nn = lit(n.toDouble)
    val mid = col("__sc").cast("double") / (lit(100.0d) * nn)
    // n·Σc² − (Σc)² stays integer (exact, < 2^53 for 2-dp values) and
    // converts to double once; sqrt is IEEE-correctly-rounded, so the
    // whole band expression is engine-portable.
    val sd = sqrt((lit(n.toLong) * col("__sc2") - col("__sc") * col("__sc")).cast("double")) /
      (lit(100.0d) * nn)
    series
      .withColumn("__cnt", count(closeCents).over(frame))
      .withColumn("__sc", sum(closeCents).over(frame))
      .withColumn("__sc2", sum(closeCents * closeCents).over(frame))
      .withColumn("mid", when(col("__cnt") < n, lit(null).cast("double")).otherwise(mid))
      .withColumn("upper", when(col("__cnt") < n, lit(null).cast("double"))
        .otherwise(mid + lit(k) * sd))
      .withColumn("lower", when(col("__cnt") < n, lit(null).cast("double"))
        .otherwise(mid - lit(k) * sd))
      .drop("__cnt", "__sc", "__sc2")
  }

  /** EMA with the standard recursion ema ← α·x + (1−α)·ema, seeded at
    * the first element, folded over a trailing `window`-row frame
    * (collect_list over an ordered ROWS frame is frame-ordered, so the
    * fold order is the series order). Truncation at `window` rows
    * bounds state; the discarded tail carries weight (1−α)^window —
    * ~2.6e-4 for span 10 / window 40 — and BOTH engines apply the
    * same truncation, so results stay bit-identical (the determinism
    * contract; an untruncated streaming EMA is
    * [[graft.streaming.CandleStream]] territory, not a window query).
    *
    * α is passed as (num, den) and computed as num/den inside the
    * expression so both engines derive the identical double. The fold
    * is a fixed left-to-right chain of IEEE mul/adds — engine-portable,
    * unlike pow()-based weights whose libm implementations differ.
    */
  def emaTruncated(series: DataFrame, keys: Seq[Column], ts: Column,
                   closeCents: Column, alphaNum: Int, alphaDen: Int,
                   window: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(window - 1), 0)
    val a = lit(alphaNum.toDouble) / lit(alphaDen.toDouble)
    series
      .withColumn("__arr", collect_list(closeCents.cast("double")).over(frame))
      .withColumn("ema",
        aggregate(col("__arr"), lit(null).cast("double"),
          (acc, x) => when(acc.isNull, x).otherwise(a * x + (lit(1.0d) - a) * acc))
          / lit(100.0d))
      .drop("__arr")
  }

  /** Stochastic oscillator %K (with the %D signal line) over an OHLC
    * candle series in cents: %K = 100·(close − minLow_n)/(maxHigh_n −
    * minLow_n) on exact integer range sums (one division), %D = the
    * 3-period simple average of %K folded left-to-right over an
    * ordered window list (the [[emaTruncated]] determinism trick —
    * a plain windowed SUM of doubles is association-order-dependent
    * and not engine-portable). Warm-up rows (< n candles) emit null
    * %K; %D needs 3 valid %K values. A flat n-candle range (den = 0)
    * pins %K to 50 — decided on exact integers.
    */
  def stochastic(series: DataFrame, keys: Seq[Column], ts: Column,
                 highCents: Column, lowCents: Column, closeCents: Column,
                 n: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    val d3 = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-2, 0)
    val base = series
      .withColumn("__cnt", count(closeCents).over(frame))
      .withColumn("__lo", min(lowCents).over(frame))
      .withColumn("__hi", max(highCents).over(frame))
      .withColumn("pct_k",
        when(col("__cnt") < n, lit(null).cast("double"))
          .when(col("__hi") === col("__lo"), lit(50.0d))
          .otherwise(lit(100.0d) * (closeCents - col("__lo")) /
            (col("__hi") - col("__lo")).cast("double")))
    base
      .withColumn("__ks", collect_list(col("pct_k")).over(d3))
      .withColumn("pct_d",
        when(size(col("__ks")) === 3,
          aggregate(col("__ks"), lit(null).cast("double"),
            (acc, x) => when(acc.isNull, x).otherwise(acc + x)) / lit(3.0d)))
      .drop("__cnt", "__lo", "__hi", "__ks")
  }

  /** Average True Range (simple-average form) over an OHLC candle
    * series in cents: TR = max(h−l, |h−prevClose|, |l−prevClose|) —
    * exact integers — averaged over the trailing `n` candles with one
    * float division. The first candle of a key has no previous close
    * and uses TR = h−l (the standard seeding). Warm-up (< n candles)
    * emits null.
    */
  def atr(series: DataFrame, keys: Seq[Column], ts: Column,
          highCents: Column, lowCents: Column, closeCents: Column,
          n: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(n - 1), 0)
    val pc = lag(closeCents, 1).over(ord)
    series
      .withColumn("__tr",
        when(pc.isNull, highCents - lowCents)
          .otherwise(greatest(highCents - lowCents,
            abs(highCents - pc), abs(lowCents - pc))))
      .withColumn("__cnt", count(col("__tr")).over(frame))
      .withColumn("atr",
        when(col("__cnt") < n, lit(null).cast("double"))
          .otherwise(sum(col("__tr")).over(frame).cast("double") /
            (lit(100.0d) * lit(n.toDouble))))
      .drop("__tr", "__cnt")
  }

  /** Keltner channels — the volatility envelope pairing [[emaTruncated]]
    * with [[atr]]: mid = EMA(emaN) of close (2/(n+1) smoothing, the
    * standard), upper/lower = mid ± mult·ATR(atrN). Pure composition
    * of the two portable kernels; both windows share the one keyed
    * exchange (same partition + order), and the band arithmetic is
    * three IEEE ops in fixed order. Warm-up rows (ATR undefined)
    * carry null bands; `mult` must be exactly representable (e.g.
    * 2.0) for engine-portability.
    */
  def keltner(series: DataFrame, keys: Seq[Column], ts: Column,
              highCents: Column, lowCents: Column, closeCents: Column,
              emaN: Int, atrN: Int, mult: Double, window: Int = 40): DataFrame = {
    val withEma = emaTruncated(series, keys, ts, closeCents,
      alphaNum = 2, alphaDen = emaN + 1, window = window)
    atr(withEma, keys, ts, highCents, lowCents, closeCents, atrN)
      .withColumn("mid", col("ema"))
      .withColumn("upper", col("ema") + lit(mult) * col("atr"))
      .withColumn("lower", col("ema") - lit(mult) * col("atr"))
      .drop("ema")
  }

  /** Ichimoku Kinkō Hyō over an OHLC cents series — every component
    * an integer window extreme + ONE exactly-dyadic halving (the sum
    * of two Longs divided by 2.0 — IEEE exact), so the whole cloud is
    * engine-portable with no fold at all:
    * tenkan = (max₉ h + min₉ l)/2, kijun = (max₂₆ h + min₂₆ l)/2,
    * senkou A = (tenkan + kijun)/2 shifted +26, senkou B =
    * (max₅₂ h + min₅₂ l)/2 shifted +26, chikou = close shifted −26.
    * Rows whose lookback window is incomplete emit null (exact
    * integer count checks); the displacements are row-based lead/lag
    * (the charting convention on a gapless bucket series). Emits
    * dollars.
    */
  def ichimoku(series: DataFrame, keys: Seq[Column], ts: Column,
               highCents: Column, lowCents: Column, closeCents: Column,
               pTenkan: Int = 9, pKijun: Int = 26, pSenkouB: Int = 52)
      : DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    def mids(n: Int): Column = {
      val fr = ord.rowsBetween(-(n - 1), 0)
      when(count(closeCents).over(fr) >= n,
        (max(highCents).over(fr) + min(lowCents).over(fr)).cast("double")
          / lit(2.0d) / lit(100.0d))
    }
    series
      .withColumn("tenkan", mids(pTenkan))
      .withColumn("kijun", mids(pKijun))
      .withColumn("senkou_a",
        lag((col("tenkan") + col("kijun")) / lit(2.0d), pKijun).over(ord))
      .withColumn("senkou_b", lag(mids(pSenkouB), pKijun).over(ord))
      .withColumn("chikou",
        lead(closeCents, pKijun).over(ord).cast("double") / lit(100.0d))
  }

  /** MACD(12, 26) with the 9-period signal line, all three EMAs as
    * truncated left-to-right folds over ordered window lists (the
    * [[emaTruncated]] recursion — fixed IEEE op order, engine
    * portable). `window` bounds the close-price fold (residual weight
    * (25/27)^window for the slow EMA); the signal folds over the last
    * 40 MACD values. Emits macd, signal, hist (= macd − signal).
    */
  def macd(series: DataFrame, keys: Seq[Column], ts: Column,
           closeCents: Column, window: Int = 64): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(window - 1), 0)
    val sigFrame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-39, 0)
    def fold(arr: Column, alphaNum: Int, alphaDen: Int): Column = {
      val a = lit(alphaNum.toDouble) / lit(alphaDen.toDouble)
      aggregate(arr, lit(null).cast("double"),
        (acc, x) => when(acc.isNull, x).otherwise(a * x + (lit(1.0d) - a) * acc))
    }
    series
      .withColumn("__arr", collect_list(closeCents.cast("double")).over(frame))
      .withColumn("macd",
        (fold(col("__arr"), 2, 13) - fold(col("__arr"), 2, 27)) / lit(100.0d))
      .withColumn("__marr", collect_list(col("macd")).over(sigFrame))
      .withColumn("signal", fold(col("__marr"), 2, 10))
      .withColumn("hist", col("macd") - col("signal"))
      .drop("__arr", "__marr")
  }

  /** On-balance volume: the running Σ sign(Δclose)·qty per key —
    * VWAP's companion volume-flow indicator. Entirely integer (cents
    * deltas decide the sign, quantities sum as Longs, one cumulative
    * window), so the result is engine-exact with no rounding step at
    * all. The first candle contributes 0 (no delta). The cumulative
    * frame is unbounded-preceding but runs per key inside the same
    * single exchange as the other indicators — a streaming running
    * sum, O(1) state per row.
    */
  def obv(series: DataFrame, keys: Seq[Column], ts: Column,
          closeCents: Column, qty: Column): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val cum = ord.rowsBetween(Window.unboundedPreceding, 0)
    val delta = closeCents - lag(closeCents, 1).over(ord)
    series
      .withColumn("__signed",
        when(delta > 0, qty).when(delta < 0, -qty).otherwise(lit(0L)))
      .withColumn("obv", sum(col("__signed")).over(cum))
      .drop("__signed")
  }

  /** Rolling Pearson correlation between two aligned series (the
    * pairs-trading / beta primitive): all five moments (Σx, Σy, Σxy,
    * Σx², Σy²) accumulate as exact cents-integer window sums, and the
    * correlation is one fixed expression over them — numerator and
    * both variance terms stay integer (< 2^53) until a single double
    * conversion, so the only rounding is the final IEEE multiply/
    * sqrt/divide chain, identical in any engine. Degenerate frames
    * (either variance 0, or < n rows) emit null on exact integer
    * checks.
    */
  def rollingCorr(df: DataFrame, keys: Seq[Column], ts: Column,
                  xCents: Column, yCents: Column, n: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    val nn = lit(n.toLong)
    val num = nn * col("__sxy") - col("__sx") * col("__sy")
    val dx = nn * col("__sx2") - col("__sx") * col("__sx")
    val dy = nn * col("__sy2") - col("__sy") * col("__sy")
    df
      .withColumn("__cnt", count(xCents).over(frame))
      .withColumn("__sx", sum(xCents).over(frame))
      .withColumn("__sy", sum(yCents).over(frame))
      .withColumn("__sxy", sum(xCents * yCents).over(frame))
      .withColumn("__sx2", sum(xCents * xCents).over(frame))
      .withColumn("__sy2", sum(yCents * yCents).over(frame))
      .withColumn("corr",
        when(col("__cnt") < n || dx === 0L || dy === 0L, lit(null).cast("double"))
          .otherwise(num.cast("double") /
            sqrt(dx.cast("double") * dy.cast("double"))))
      .drop("__cnt", "__sx", "__sy", "__sxy", "__sx2", "__sy2")
  }

  /** Parkinson range volatility: σ = √(Σ ln(h/l)² / (4·n·ln 2))
    * (Parkinson, J. Business 1980 — the high-low estimator that's
    * ~5× more efficient than close-to-close). Each ln ratio is
    * quantized to micro-units (floor(ln(h/l)·10⁶+0.5) as a Long) so
    * the squared sum is an exact integer window aggregate — the
    * engine-portability move, since a windowed SUM of raw doubles is
    * association-order-dependent. Candles with l ≤ 0 are excluded;
    * frames with < n valid candles emit null.
    */
  def parkinson(series: DataFrame, keys: Seq[Column], ts: Column,
                highCents: Column, lowCents: Column, n: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    val q = when(lowCents > 0,
      floor(log(highCents.cast("double") / lowCents.cast("double")) *
        lit(1000000.0d) + lit(0.5d)))
    series
      .withColumn("__q2", q * q)
      .withColumn("__cnt", count(col("__q2")).over(frame))
      .withColumn("__sq", sum(col("__q2")).over(frame))
      .withColumn("parkinson",
        when(col("__cnt") < n, lit(null).cast("double"))
          .otherwise(sqrt(col("__sq").cast("double") /
            (lit(4.0d) * lit(n.toDouble) * log(lit(2.0d)) * lit(1.0e12d)))))
      .drop("__q2", "__cnt", "__sq")
  }

  /** Volume-weighted average price per (keys, bucket): Σ(price·qty) /
    * Σqty with the numerator in exact cents·qty integers. Buckets with
    * zero total quantity are dropped (no defined VWAP). One keyed
    * aggregation — partial map-side combine, single shuffle on
    * (keys, bucket).
    */
  def vwap(df: DataFrame, keys: Seq[Column], bucket: Column,
           priceCents: Column, qty: Column): DataFrame = {
    df.groupBy((keys :+ bucket): _*)
      .agg(sum(priceCents * qty).as("__pv"), sum(qty).as("qty"))
      .filter(col("qty") > 0L)
      .withColumn("vwap", col("__pv").cast("double") / (lit(100.0d) * col("qty").cast("double")))
      .drop("__pv")
  }

  /** Annualized Sharpe ratio per key over the log-return series:
    * mean(r)/sd(r) · √periodsPerYear (risk-free rate 0 — the crypto
    * convention). Each return quantizes to integer micro-nats
    * (`floor(ln(c/prev)·1e6 + 0.5)`, the [[parkinson]] scheme) so the
    * two moment sums are exact order-independent integers; products
    * run in decimal(38,0) (the ts_corr discipline — Σr² · n passes
    * 2^63 long before a year of minutes), and only the final quotient
    * drops to double in one fixed expression. Keys with < 2 returns
    * or zero variance emit no row (Sharpe undefined).
    */
  def sharpe(series: DataFrame, keys: Seq[Column], ts: Column,
             closeCents: Column, periodsPerYear: Double): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val prev = lag(closeCents, 1).over(ord)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val rq = when(prev > 0L && closeCents > 0L,
      floor(log(closeCents.cast("double") / prev.cast("double")) *
        lit(1000000.0d) + lit(0.5d)).cast("long"))
    val varNum = dec(col("n")) * col("q") - col("s") * col("s")
    series.withColumn("__r", rq)
      .filter(col("__r").isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), sum(dec(col("__r"))).as("s"),
        sum(dec(col("__r")) * dec(col("__r"))).as("q"))
      .filter(col("n") >= 2L && varNum > 0)
      .select((keys :+ col("n") :+
        (col("s").cast("double") / col("n").cast("double") /
          sqrt(varNum.cast("double") /
            (dec(col("n")) * dec(col("n"))).cast("double")) *
          sqrt(lit(periodsPerYear))).as("sharpe")): _*)
  }

  /** Annualized Sortino ratio per key: mean(r) / downside-deviation ·
    * √periodsPerYear, where downside deviation is √(Σ_{r<0} r² / n)
    * (target return 0). Same micro-nat/decimal discipline as
    * [[sharpe]]; the negative-return filter is an exact integer
    * compare, so which returns count as downside can never flip
    * between engines. Keys with < 2 returns or no downside emit no
    * row.
    */
  def sortino(series: DataFrame, keys: Seq[Column], ts: Column,
              closeCents: Column, periodsPerYear: Double): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val prev = lag(closeCents, 1).over(ord)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val rq = when(prev > 0L && closeCents > 0L,
      floor(log(closeCents.cast("double") / prev.cast("double")) *
        lit(1000000.0d) + lit(0.5d)).cast("long"))
    series.withColumn("__r", rq)
      .filter(col("__r").isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), sum(dec(col("__r"))).as("s"),
        sum(when(col("__r") < 0L, dec(col("__r")) * dec(col("__r")))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("qd"))
      .filter(col("n") >= 2L && col("qd") > 0)
      .select((keys :+ col("n") :+
        (col("s").cast("double") / col("n").cast("double") /
          sqrt(col("qd").cast("double") / col("n").cast("double")) *
          sqrt(lit(periodsPerYear))).as("sortino")): _*)
  }

  /** Lag-k autocorrelation of log returns per key — the
    * mean-reversion / momentum diagnostic (significantly negative ⇒
    * reverting at the bucket scale, positive ⇒ trending). Returns are
    * quantized to exact micro-nat integers (the [[sharpe]]
    * discipline), the lag pairs (r_{t−k}, r_t) form over the FILTERED
    * return series (gaps close up — standard practice), and the
    * Pearson coefficient is the [[rollingCorr]] expression tree over
    * whole-series decimal(38,0) moments: every sum exact, one float
    * expression at the end. Keys with < 2 pairs or a degenerate
    * variance emit no row. One keyed window + one aggregate — the
    * shuffle carries six numbers per key.
    */
  def autocorr(series: DataFrame, keys: Seq[Column], ts: Column,
               closeCents: Column, lagK: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val prev = lag(closeCents, 1).over(ord)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val rq = when(prev > 0L && closeCents > 0L,
      floor(log(closeCents.cast("double") / prev.cast("double")) *
        lit(1000000.0d) + lit(0.5d)).cast("long"))
    val num = dec(col("n")) * col("sxy") - col("sx") * col("sy")
    val vx = dec(col("n")) * col("sxx") - col("sx") * col("sx")
    val vy = dec(col("n")) * col("syy") - col("sy") * col("sy")
    series.withColumn("__r", rq)
      .filter(col("__r").isNotNull)
      .withColumn("__x", lag(col("__r"), lagK).over(ord))
      .filter(col("__x").isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__x"))).as("sx"), sum(dec(col("__r"))).as("sy"),
        sum(dec(col("__x")) * dec(col("__x"))).as("sxx"),
        sum(dec(col("__r")) * dec(col("__r"))).as("syy"),
        sum(dec(col("__x")) * dec(col("__r"))).as("sxy"))
      .filter(col("n") >= 2L && vx > 0 && vy > 0)
      .select((keys :+ col("n") :+
        (num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))).as("ac")): _*)
  }

  /** Heikin-Ashi candle transform per key — the smoothed-candle view
    * every charting surface offers beside raw OHLC:
    * ha_close = (o+h+l+c)/4 (an exact integer quarter-cents sum,
    * ONE division), ha_high/ha_low = max/min of (h, ha_open,
    * ha_close), and the recursive
    * ha_open_t = (ha_open_{t-1} + ha_close_{t-1})/2 — which is
    * precisely the α=½ EMA recursion over the shifted series
    * g_0 = (o_0+c_0)/2, g_t = ha_close_{t-1}, so the
    * [[emaTruncated]] portability discipline applies verbatim: fold
    * g left-to-right over a `window`-row ordered frame (fixed IEEE
    * op order ⇒ engine-portable), truncation weight (½)^40 ≈ 9e-13 —
    * invisible at 4 dp, and applied identically by both engines
    * because the frame is identical. Emits dollars.
    */
  def heikinAshi(series: DataFrame, keys: Seq[Column], ts: Column,
                 openCents: Column, highCents: Column, lowCents: Column,
                 closeCents: Column, window: Int = 41): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(window - 1), 0)
    series
      .withColumn("__hacq",
        (openCents + highCents + lowCents + closeCents).cast("long"))
      .withColumn("__g",
        when(row_number().over(ord) === 1,
          (openCents + closeCents).cast("double") / lit(2.0d))
          .otherwise(lag(col("__hacq"), 1).over(ord).cast("double") / lit(4.0d)))
      .withColumn("__garr", collect_list(col("__g")).over(frame))
      .withColumn("ha_open",
        aggregate(col("__garr"), lit(null).cast("double"),
          (acc, x) => when(acc.isNull, x).otherwise((x + acc) / lit(2.0d)))
          / lit(100.0d))
      .withColumn("ha_close", col("__hacq").cast("double") / lit(400.0d))
      .withColumn("ha_high",
        greatest(highCents.cast("double") / lit(100.0d), col("ha_open"), col("ha_close")))
      .withColumn("ha_low",
        least(lowCents.cast("double") / lit(100.0d), col("ha_open"), col("ha_close")))
      .drop("__hacq", "__g", "__garr")
  }

  /** Maximum drawdown per key: the largest peak-to-trough loss of the
    * series, in percent of the peak — the risk summary every OHLCV
    * dashboard pairs with returns. Running peak is an integer cummax
    * over the cents series (one keyed window, the same exchange every
    * other indicator rides); each row's drawdown converts to double in
    * ONE fixed expression `(peak − c) · 100.0 / peak`, and the per-key
    * max over those doubles is order-independent (max, not sum), so
    * the result is engine-exact under the [[graft.catalog.Oracle]]
    * discipline. Returns one row per key: (keys..., n, max_dd_pct).
    */
  def maxDrawdown(series: DataFrame, keys: Seq[Column], ts: Column,
                  closeCents: Column): DataFrame = {
    val cum = Window.partitionBy(keys: _*).orderBy(ts)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .withColumn("__peak", max(closeCents).over(cum))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        max((col("__peak") - closeCents) * lit(100.0d) /
          col("__peak").cast("double")).as("max_dd_pct"))
  }

  /** CUSUM change-point statistic (Page 1954) over a cents series —
    * the level-shift detector a monitoring pass runs on a price/metric
    * stream: cusum⁺_t = max(0, cusum⁺_{t−1} + (x_t − μ)) measures
    * accumulated upward drift from the series mean, cusum⁻ the
    * downward twin. The recursion has the closed form
    * cusum⁺_t = S_t − min_{j≤t} S_j over the cumulative deviation sum
    * S, so it is TWO window passes (cumsum + running extreme) sharing
    * one keyed exchange — no per-row recursion, no UDAF.
    *
    * Exactness: deviations are scaled by n (δ'_t = n·x_t − Σx, an
    * integer), so the cumulative sums, running extremes, and argmax
    * are exact BIGINT arithmetic in any engine and any partitioning;
    * the single division by n (and cents→price) happens once at the
    * end. Returns per-key (n, peak_up_ts, peak_up, peak_down_ts,
    * peak_down) — the strongest upward/downward level-shift evidence
    * and when it peaked (ties → earliest), in price units.
    *
    * Range: the scaled cumsum is bounded by n²·maxCents — fine for
    * any per-key series that fits a realistic monitoring window
    * (n = 10⁶ hourly rows × 10⁸ cents ≈ 10²⁰ overflows; beyond ~10⁵
    * rows per key, window the series or drop to the unscaled
    * double-μ form).
    */
  def cusumPeaks(series: DataFrame, keys: Seq[Column], ts: Column,
                 closeCents: Column): DataFrame = {
    val wAll = Window.partitionBy(keys: _*)
    val cum = Window.partitionBy(keys: _*).orderBy(ts)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .withColumn("__n", count(closeCents).over(wAll))
      .withColumn("__sum", sum(closeCents).over(wAll))
      .withColumn("__s", sum(closeCents * col("__n") - col("__sum")).over(cum))
      // the running extreme must include the EMPTY prefix (S = 0):
      // max(0, ...) clamps the recursion at zero, and without the
      // least/greatest-with-0 the first rows would measure drift
      // against S_0 instead of 0
      .withColumn("__up", col("__s") - least(lit(0L), min(col("__s")).over(cum)))
      .withColumn("__dn", greatest(lit(0L), max(col("__s")).over(cum)) - col("__s"))
      .groupBy(keys: _*)
      .agg(
        first(col("__n")).as("n"),
        min(struct((-col("__up")).as("v"), ts.as("t"))).as("__bu"),
        min(struct((-col("__dn")).as("v"), ts.as("t"))).as("__bd"))
      .select((keys :+ col("n") :+
        col("__bu.t").as("peak_up_ts") :+
        (-col("__bu.v") / (col("n") * lit(100.0d))).as("peak_up") :+
        col("__bd.t").as("peak_down_ts") :+
        (-col("__bd.v") / (col("n") * lit(100.0d))).as("peak_down")): _*)
  }

  /** Williams %R over an OHLC cents series: −100·(maxHigh_n − close)/
    * (maxHigh_n − minLow_n) — the inverted [[stochastic]] %K, on the
    * same exact-integer window extremes with one float division.
    * Warm-up rows (< n candles) emit null; a flat n-candle range
    * pins %R to −50 (decided on exact integers, the %K=50 twin).
    */
  def williamsR(series: DataFrame, keys: Seq[Column], ts: Column,
                highCents: Column, lowCents: Column, closeCents: Column,
                n: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    series
      .withColumn("__cnt", count(closeCents).over(frame))
      .withColumn("__lo", min(lowCents).over(frame))
      .withColumn("__hi", max(highCents).over(frame))
      .withColumn("wr",
        when(col("__cnt") < n, lit(null).cast("double"))
          .when(col("__hi") === col("__lo"), lit(-50.0d))
          .otherwise(lit(-100.0d) * (col("__hi") - closeCents) /
            (col("__hi") - col("__lo")).cast("double")))
      .drop("__cnt", "__lo", "__hi")
  }

  /** Commodity Channel Index (Lambert) over an OHLC cents series:
    * CCI = (tp − SMA_n(tp)) / (0.015 · MD_n), tp = (h+l+c)/3, MD the
    * mean absolute deviation of tp from the FRAME'S OWN mean. The
    * frame-dependent MD makes a plain windowed sum impossible, so the
    * kernel folds the frame's tp3 = h+l+c list (bounded, n elements):
    * with S = Σtp3 the identity n²·300·(tp − mean) = n·(n·tp3 − S)
    * and D = Σ|n·tp3_j − S| give CCI = 200·n·(n·tp3 − S)/(3·D) —
    * every term an exact integer (|n·tp3| < 2^53 for 2-dp cents), one
    * float division at the end, so the result is engine-portable.
    * Warm-up (< n) emits null; an all-flat frame (D = 0) pins 0.
    */
  def cci(series: DataFrame, keys: Seq[Column], ts: Column,
          highCents: Column, lowCents: Column, closeCents: Column,
          n: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    val nn = lit(n.toLong)
    series
      .withColumn("__tp3", highCents + lowCents + closeCents)
      .withColumn("__cnt", count(col("__tp3")).over(frame))
      .withColumn("__s", sum(col("__tp3")).over(frame))
      .withColumn("__d",
        aggregate(collect_list(col("__tp3")).over(frame), lit(0L),
          (acc, x) => acc + abs(nn * x - col("__s"))))
      .withColumn("cci",
        when(col("__cnt") < n, lit(null).cast("double"))
          .when(col("__d") === 0L, lit(0.0d))
          .otherwise(lit(200.0d) * lit(n.toDouble) *
            (nn * col("__tp3") - col("__s")).cast("double") /
            (lit(3.0d) * col("__d").cast("double"))))
      .drop("__tp3", "__cnt", "__s", "__d")
  }

  /** Aroon oscillator over an OHLC cents series: periods since the
    * trailing-n highest high / lowest low, scaled to [0, 100].
    * Recency is resolved without any fold: each row's position index
    * (row_number within the key) packs into the low 20 bits of an
    * integer m = h·2^20 + idx, so max(m) over the frame IS (highest
    * high, most recent on ties) and m % 2^20 recovers its index —
    * exact integer window max/min, no lists. Requires cents < 2^33
    * and < 2^20 rows per key (document: re-block longer series).
    * aroon_up = 100·(n−1−sinceHigh)/(n−1), likewise down with the
    * low (ties → most recent via the complemented index). Warm-up
    * (< n) emits null. Emits aroon_up, aroon_down, aroon_osc (up −
    * down, the oscillator).
    */
  def aroon(series: DataFrame, keys: Seq[Column], ts: Column,
            highCents: Column, lowCents: Column, n: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(n - 1), 0)
    val B = 1L << 20
    val up = (lit(100.0d) * (lit((n - 1).toLong) - col("__dh")).cast("double")) /
      lit((n - 1).toDouble)
    val dn = (lit(100.0d) * (lit((n - 1).toLong) - col("__dl")).cast("double")) /
      lit((n - 1).toDouble)
    series
      .withColumn("__idx", row_number().over(ord).cast("long") - 1L)
      .withColumn("__cnt", count(col("__idx")).over(frame))
      .withColumn("__dh",
        col("__idx") - pmod(max(highCents * B + col("__idx")).over(frame), lit(B)))
      .withColumn("__dl",
        col("__idx") - (lit(B - 1) -
          pmod(min(lowCents * B + (lit(B - 1) - col("__idx"))).over(frame), lit(B))))
      .withColumn("aroon_up", when(col("__cnt") < n, lit(null).cast("double")).otherwise(up))
      .withColumn("aroon_down", when(col("__cnt") < n, lit(null).cast("double")).otherwise(dn))
      .withColumn("aroon_osc", col("aroon_up") - col("aroon_down"))
      .drop("__idx", "__cnt", "__dh", "__dl")
  }

  /** ADX (simple-average form, the Cutler-style SQL-expressible
    * variant of Wilder's recursion — same reading as [[rsi]]'s): from
    * integer directional moves up = h−prevH, down = prevL−l,
    * +DM = up·[up>down ∧ up>0], −DM = down·[down>up ∧ down>0],
    * DX = 100·|Σ₊DM − Σ₋DM| / (Σ₊DM + Σ₋DM) over the trailing n
    * deltas (the ΣTR denominators of ±DI cancel — DX is exact
    * integers + one float division), and ADX = the n-value mean of
    * DX folded left-to-right over an ordered frame list (windowed
    * double sums are association-order-dependent; the fold is not —
    * the [[stochastic]] %D discipline). Rows emit once n DX values
    * exist (2n−1 deltas); an n-frame with no directional movement
    * (den = 0) pins DX to 0.
    */
  def adx(series: DataFrame, keys: Seq[Column], ts: Column,
          highCents: Column, lowCents: Column, n: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(n - 1), 0)
    val up = highCents - lag(highCents, 1).over(ord)
    val dn = lag(lowCents, 1).over(ord) - lowCents
    val base = series
      .withColumn("__up", up)
      .withColumn("__dn", dn)
      .withColumn("__pdm",
        when(col("__up").isNull, lit(null).cast("long"))
          .when(col("__up") > col("__dn") && col("__up") > 0L, col("__up"))
          .otherwise(lit(0L)))
      .withColumn("__mdm",
        when(col("__dn").isNull, lit(null).cast("long"))
          .when(col("__dn") > col("__up") && col("__dn") > 0L, col("__dn"))
          .otherwise(lit(0L)))
      .withColumn("__nd", count(col("__pdm")).over(frame))
      .withColumn("__sp", sum(col("__pdm")).over(frame))
      .withColumn("__sm", sum(col("__mdm")).over(frame))
      .withColumn("dx",
        when(col("__nd") < n, lit(null).cast("double"))
          .when(col("__sp") + col("__sm") === 0L, lit(0.0d))
          .otherwise(lit(100.0d) * abs(col("__sp") - col("__sm")).cast("double") /
            (col("__sp") + col("__sm")).cast("double")))
    base
      .withColumn("__dxs", filter(collect_list(col("dx")).over(frame), _.isNotNull))
      .withColumn("adx",
        when(size(col("__dxs")) === n,
          aggregate(col("__dxs"), lit(null).cast("double"),
            (acc, x) => when(acc.isNull, x).otherwise(acc + x)) / lit(n.toDouble)))
      .drop("__up", "__dn", "__pdm", "__mdm", "__nd", "__sp", "__sm", "__dxs")
  }

  /** Donchian channels: trailing-n highest high / lowest low envelope
    * with the midline — pure integer window extremes plus ONE
    * exactly-dyadic halving (the [[ichimoku]] discipline; no fold,
    * no float accumulation anywhere). Warm-up (< n) emits null.
    * Emits dollars.
    */
  def donchian(series: DataFrame, keys: Seq[Column], ts: Column,
               highCents: Column, lowCents: Column, n: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    val ok = count(highCents).over(frame) >= n
    series
      .withColumn("upper",
        when(ok, max(highCents).over(frame).cast("double") / lit(100.0d)))
      .withColumn("lower",
        when(ok, min(lowCents).over(frame).cast("double") / lit(100.0d)))
      .withColumn("mid",
        when(ok, (max(highCents).over(frame) + min(lowCents).over(frame))
          .cast("double") / lit(2.0d) / lit(100.0d)))
  }

  /** Rate of change + momentum over `n` periods: ROC = 100·(c −
    * c₋ₙ)/c₋ₙ (integer numerator, one float division), momentum =
    * the raw integer cents delta (no rounding at all). Rows without
    * an n-back close (or a non-positive one) emit null.
    */
  def roc(series: DataFrame, keys: Seq[Column], ts: Column,
          closeCents: Column, n: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val back = lag(closeCents, n).over(ord)
    series
      .withColumn("momentum",
        when(back.isNotNull, closeCents - back))
      .withColumn("roc",
        when(back > 0L, lit(100.0d) * (closeCents - back).cast("double") /
          back.cast("double")))
  }

  /** TRIX: the 1-period percent change of a triple-smoothed EMA —
    * three [[emaTruncated]] folds composed (each a fixed left-to-
    * right IEEE chain over an ordered `window`-row list, engine-
    * portable; the middle folds list the PREVIOUS stage's windowed
    * value, so truncation compounds identically in both engines),
    * then TRIX = 100·(e₃ − lag e₃)/lag e₃. α = 2/(n+1). The first
    * row of a key has no lag and emits null.
    */
  def trix(series: DataFrame, keys: Seq[Column], ts: Column,
           closeCents: Column, n: Int, window: Int = 40): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(window - 1), 0)
    val a = lit(2.0d) / lit((n + 1).toDouble)
    def fold(arr: Column): Column =
      aggregate(arr, lit(null).cast("double"),
        (acc, x) => when(acc.isNull, x).otherwise(a * x + (lit(1.0d) - a) * acc))
    val withE3 = series
      .withColumn("__e1", fold(collect_list(closeCents.cast("double")).over(frame)))
      .withColumn("__e2", fold(collect_list(col("__e1")).over(frame)))
      .withColumn("__e3", fold(collect_list(col("__e2")).over(frame)))
    val prev = lag(col("__e3"), 1).over(ord)
    withE3
      .withColumn("trix",
        when(prev.isNotNull && prev =!= 0.0d,
          lit(100.0d) * (col("__e3") - prev) / prev))
      .drop("__e1", "__e2", "__e3")
  }

  /** Vortex indicator: VI± = ΣVM± / ΣTR over the trailing n deltas,
    * VM+ = |h − prevL|, VM− = |l − prevH| — every sum an exact
    * integer (the [[atr]] TR definition), each VI one float
    * division. Warm-up (< n deltas) emits null; a zero-TR frame
    * (all candles identical) pins both VIs to 1 (direction-neutral,
    * decided on exact integers).
    */
  def vortex(series: DataFrame, keys: Seq[Column], ts: Column,
             highCents: Column, lowCents: Column, closeCents: Column,
             n: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(n - 1), 0)
    val ph = lag(highCents, 1).over(ord)
    val pl = lag(lowCents, 1).over(ord)
    val pc = lag(closeCents, 1).over(ord)
    series
      .withColumn("__vp", when(pl.isNotNull, abs(highCents - pl)))
      .withColumn("__vm", when(ph.isNotNull, abs(lowCents - ph)))
      .withColumn("__tr", when(pc.isNotNull,
        greatest(highCents - lowCents, abs(highCents - pc), abs(lowCents - pc))))
      .withColumn("__nd", count(col("__tr")).over(frame))
      .withColumn("__sp", sum(col("__vp")).over(frame))
      .withColumn("__sm", sum(col("__vm")).over(frame))
      .withColumn("__st", sum(col("__tr")).over(frame))
      .withColumn("vi_plus",
        when(col("__nd") < n, lit(null).cast("double"))
          .when(col("__st") === 0L, lit(1.0d))
          .otherwise(col("__sp").cast("double") / col("__st").cast("double")))
      .withColumn("vi_minus",
        when(col("__nd") < n, lit(null).cast("double"))
          .when(col("__st") === 0L, lit(1.0d))
          .otherwise(col("__sm").cast("double") / col("__st").cast("double")))
      .drop("__vp", "__vm", "__tr", "__nd", "__sp", "__sm", "__st")
  }

  /** Money Flow Index (n-period, simple-sum form): the volume-weighted
    * RSI. Raw money flow mf = tp3·qty with tp3 = h+l+c (integer cents
    * ×3 — the /3 and /100 scale factors cancel in the ratio), signed
    * by the tp3 delta; unchanged typical price joins neither side
    * (the standard convention). MFI = 100·Σ₊mf / (Σ₊mf + Σ₋mf) —
    * exact integer sums, one float division (100 − 100/(1+MR)
    * algebraically simplified). Warm-up (< n deltas) emits null; a
    * frame with zero signed flow pins 50 (the RSI twin). Caller
    * guarantees Σ|tp3·qty| < 2^63 per frame (cents ≤ 2^33, qty sums
    * well below 2^28 at any real bucket width).
    */
  def mfi(series: DataFrame, keys: Seq[Column], ts: Column,
          highCents: Column, lowCents: Column, closeCents: Column,
          qty: Column, n: Int): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val frame = ord.rowsBetween(-(n - 1), 0)
    series
      .withColumn("__tp3", highCents + lowCents + closeCents)
      .withColumn("__q", qty)
      .withColumn("__d", col("__tp3") - lag(col("__tp3"), 1).over(ord))
      .withColumn("__pmf",
        when(col("__d").isNull, lit(null).cast("long"))
          .when(col("__d") > 0L, col("__tp3") * col("__q")).otherwise(lit(0L)))
      .withColumn("__nmf",
        when(col("__d").isNull, lit(null).cast("long"))
          .when(col("__d") < 0L, col("__tp3") * col("__q")).otherwise(lit(0L)))
      .withColumn("__nd", count(col("__pmf")).over(frame))
      .withColumn("__sp", sum(col("__pmf")).over(frame))
      .withColumn("__sn", sum(col("__nmf")).over(frame))
      .withColumn("mfi",
        when(col("__nd") < n, lit(null).cast("double"))
          .when(col("__sp") + col("__sn") === 0L, lit(50.0d))
          .otherwise(lit(100.0d) * col("__sp").cast("double") /
            (col("__sp") + col("__sn")).cast("double")))
      .drop("__tp3", "__q", "__d", "__pmf", "__nmf", "__nd", "__sp", "__sn")
  }

  /** Chaikin Money Flow (n-period): CMF = Σ(mfm·vol) / Σvol with the
    * money-flow multiplier mfm = ((c−l)−(h−c))/(h−l) ∈ [−1, 1]. A
    * per-row double mfm would make the windowed sum association-
    * order-dependent, so mfm is quantized ONCE to exact micro-units —
    * mq = floor((2c−h−l)/(h−l)·10⁶ + 0.5), an IEEE expression over
    * integer-valued doubles both engines evaluate identically — and
    * the frame sums Σ(mq·vol), Σvol stay integer; one float division
    * recovers CMF at 1e-6 mfm resolution. h = l (doji with zero
    * range) contributes mfm = 0 (the convention that avoids 0/0).
    * Warm-up (< n) and zero-volume frames emit null.
    */
  def chaikinMoneyFlow(series: DataFrame, keys: Seq[Column], ts: Column,
                       highCents: Column, lowCents: Column, closeCents: Column,
                       qty: Column, n: Int): DataFrame = {
    val frame = Window.partitionBy(keys: _*).orderBy(ts).rowsBetween(-(n - 1), 0)
    val mq = when(highCents === lowCents, lit(0L))
      .otherwise(floor(
        (lit(2L) * closeCents - highCents - lowCents).cast("double") /
          (highCents - lowCents).cast("double") * lit(1000000.0d) + lit(0.5d)))
    series
      .withColumn("__mq", mq)
      .withColumn("__qv", qty)
      .withColumn("__cnt", count(col("__mq")).over(frame))
      .withColumn("__sq", sum(col("__mq") * col("__qv")).over(frame))
      .withColumn("__sv", sum(col("__qv")).over(frame))
      .withColumn("cmf",
        when(col("__cnt") < n || col("__sv") === 0L, lit(null).cast("double"))
          .otherwise(col("__sq").cast("double") /
            (lit(1000000.0d) * col("__sv").cast("double"))))
      .drop("__mq", "__qv", "__cnt", "__sq", "__sv")
  }

  /** Vectorized SMA-crossover backtest — the strategy-evaluation
    * query a user runs on top of the indicator layer: hold +1 when
    * SMA(fast) > SMA(slow), −1 when below, flat on exact equality,
    * with the position applied to the NEXT period's return (no
    * look-ahead). Everything that decides anything is integer: the
    * cross is the cross-multiplied compare slowN·Σfast vs
    * fastN·Σslow (no division, can't drift), returns are the
    * micro-nat integers of the [[sharpe]] discipline, the equity sum
    * S = Σ pos·rq and the position-flip trade count are exact Long
    * sums (order-free), and the only float ops are the final
    * exp(S/10⁶) compounding — one call on an identical double in
    * both engines. Emits per key: n (applied periods), trades
    * (position changes), strat_ret_pct (compounded strategy return).
    * One keyed window exchange + one same-key aggregate.
    */
  def smaCrossBacktest(series: DataFrame, keys: Seq[Column], ts: Column,
                       closeCents: Column, fastN: Int, slowN: Int): DataFrame = {
    require(fastN > 0 && slowN > fastN, s"need 0 < fastN < slowN: $fastN, $slowN")
    val ord = Window.partitionBy(keys: _*).orderBy(ts)
    val ff = ord.rowsBetween(-(fastN - 1), 0)
    val fs = ord.rowsBetween(-(slowN - 1), 0)
    val prev = lag(closeCents, 1).over(ord)
    val rq = when(prev > 0L && closeCents > 0L,
      floor(log(closeCents.cast("double") / prev.cast("double")) *
        lit(1000000.0d) + lit(0.5d)).cast("long"))
    val cross = lit(slowN.toLong) * col("__sf") - lit(fastN.toLong) * col("__ss")
    val base = series
      .withColumn("__cs", count(closeCents).over(fs))
      .withColumn("__sf", sum(closeCents).over(ff))
      .withColumn("__ss", sum(closeCents).over(fs))
      .withColumn("__rq", rq)
      .withColumn("__pos",
        when(col("__cs") < slowN, lit(null).cast("long"))
          .when(cross > 0L, lit(1L)).when(cross < 0L, lit(-1L))
          .otherwise(lit(0L)))
      .withColumn("__spos", lag(col("__pos"), 1).over(ord))
    base.groupBy(keys: _*)
      .agg(
        count(when(col("__spos").isNotNull && col("__rq").isNotNull, lit(1)))
          .as("n"),
        sum(when(col("__pos").isNotNull && col("__spos").isNotNull &&
          col("__pos") =!= col("__spos"), lit(1L)).otherwise(lit(0L)))
          .as("trades"),
        sum(when(col("__spos").isNotNull && col("__rq").isNotNull,
          col("__spos") * col("__rq"))).as("__s"))
      .filter(col("n") >= 1L)
      .select((keys :+ col("n") :+ col("trades") :+
        ((exp(col("__s").cast("double") / lit(1000000.0d)) - lit(1.0d)) *
          lit(100.0d)).as("strat_ret_pct")): _*)
  }

  /** Per-series sign-of-return signature: bit j is the MAJORITY sign
    * of the series' bucket-to-bucket deltas over the buckets mapped
    * to slot j (`slot` must be a shared bucket→[0,bits) mapping, e.g.
    * `hour_index % bits`, so every series votes on the same slots).
    * Pure integer arithmetic — votes are ±1 sums, the bit cut is
    * `sum > 0`, the pack is exact shifts — so the signature is
    * engine- and partitioning-exact. Correlated series agree on most
    * delta signs, hence on most bits: Hamming distance is a O(1)-per-
    * pair correlation proxy (sign agreement IS Kendall-style
    * concordance against the time axis), while an uncorrelated pair
    * sits at the binomial mean bits/2. One narrow groupBy pass;
    * state is O(series · bits). Returns (k, sig).
    */
  def signSignatures(series: DataFrame, key: Column, bucket: Column,
                     closeCents: Column, slot: Column): DataFrame = {
    val h = series.select(key.as("k"), bucket.as("bus"),
      closeCents.as("c"), slot.cast("int").as("j"))
    val ord = Window.partitionBy(col("k")).orderBy(col("bus"))
    h.select(col("k"), col("j"),
        (col("c") > lag(col("c"), 1).over(ord)).as("u"))
      .filter(col("u").isNotNull)
      .groupBy(col("k"), col("j"))
      .agg(sum(when(col("u"), 1L).otherwise(-1L)).as("v"))
      .groupBy(col("k"))
      .agg(sum(when(col("v") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L)).as("sig"))
  }

  /** Top-k most-correlated series pairs, signature-pruned — the form
    * of `ts_corr_matrix`'s screener a 1000-symbol universe actually
    * runs: the all-pairs moment join is |series|²·|buckets| rows,
    * quadratic in the universe; here candidates come from
    * [[signSignatures]] + [[graft.llm.Dedup.simHashPairs]]' pigeonhole
    * blocks (recall exactly 1 within Hamming `maxDist` — not an LSH
    * curve), and the exact integer-moment join (same expression tree
    * as the matrix) runs ONLY on candidate pairs, so the quadratic
    * frame shrinks to |candidates|·|buckets|. The contract is
    * deterministic and oracle-checkable: top `k` by exact Pearson
    * corr among pairs whose signatures differ in ≤ `maxDist` of
    * `bits` bits (an uncorrelated pair's expected distance is bits/2,
    * so any radius meaningfully below that prunes the quadratic
    * bulk). Final top-k is one TakeOrderedAndProject.
    * Returns (key_a, key_b, n, corr), corr descending.
    */
  def topCorrelated(series: DataFrame, key: Column, bucket: Column,
                    closeCents: Column, slot: Column, bits: Int,
                    maxDist: Int, k: Int): DataFrame = {
    val h = series.select(key.as("k"), bucket.as("bus"), closeCents.as("c"))
    val sigs = signSignatures(series, key, bucket, closeCents, slot)
    val cands = graft.llm.Dedup.simHashPairs(sigs, col("k"), col("sig"),
        bits, maxDist)
      .select(col("id_a").as("ka"), col("id_b").as("kb"))
    val a = h.select(col("k").as("ka"), col("bus"), col("c").as("x"))
    val b = h.select(col("k").as("kb"), col("bus"), col("c").as("y"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    cands.join(a, "ka").join(b, Seq("kb", "bus"))
      .groupBy(col("ka"), col("kb"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      .filter(col("n") >= 2L &&
        (dec(col("n")) * col("sxx") - col("sx") * col("sx")) > 0 &&
        (dec(col("n")) * col("syy") - col("sy") * col("sy")) > 0)
      .select(col("ka").as("key_a"), col("kb").as("key_b"), col("n"),
        ((dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((dec(col("n")) * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("corr"))
      .orderBy(col("corr").desc, col("key_a"), col("key_b"))
      .limit(k)
  }
}
