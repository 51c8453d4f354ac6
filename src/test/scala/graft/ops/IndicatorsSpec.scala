package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the indicator operators. */
class IndicatorsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def series(vals: Seq[Long]) =
    vals.zipWithIndex.map { case (c, i) => ("k", i.toLong, c) }
      .toDF("key", "t", "c")

  test("rsi: warm-up nulls, flat frame = 50, hand-checked value") {
    // 15 closes: deltas alternate +10/-5 → 7 gains of 10 and 7 losses
    // of 5 in the first full 14-delta frame.
    val vals = (0 until 15).scanLeft(100L) {
      case (acc, i) => acc + (if (i % 2 == 0) 10L else -5L)
    }.take(15)
    val out = Indicators.rsi(series(vals), Seq(col("key")), col("t"), col("c"), 14)
      .orderBy("t").select("rsi").as[Option[Double]].collect()
    assert(out.take(14).forall(_.isEmpty), "first 14 rows are warm-up")
    // frame at row 14: deltas rows 1..14 = 7×(+10), 7×(−5)
    val exp = 100.0 * 70 / (70 + 35)
    assert(math.abs(out(14).get - exp) < 1e-12)

    val flat = Indicators.rsi(series(Seq.fill(20)(42L)), Seq(col("key")),
      col("t"), col("c"), 14).orderBy("t").select("rsi")
      .as[Option[Double]].collect()
    assert(flat(19).contains(50.0d), "all-flat frame pins RSI to 50")
  }

  test("bollinger: constant series has zero-width bands; variance matches") {
    val out = Indicators.bollinger(series(Seq.fill(25)(200L)), Seq(col("key")),
      col("t"), col("c"), n = 20, k = 2.0)
      .orderBy("t").select("mid", "upper", "lower")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(out(18)._1.isEmpty, "warm-up row emits null")
    assert(out(24) == ((Some(2.0), Some(2.0), Some(2.0))))

    // two-value alternation 100/300 cents: mean 200c = 2.0, population
    // sd = 100c = 1.0 ⇒ bands at 2 ± 2·1
    val alt = Indicators.bollinger(series(Seq.tabulate(24)(i => if (i % 2 == 0) 100L else 300L)),
      Seq(col("key")), col("t"), col("c"), n = 20, k = 2.0)
      .orderBy("t").select("mid", "upper", "lower")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(alt(23) == ((Some(2.0), Some(4.0), Some(0.0))))
  }

  test("ema: recursion matches a driver-side fold; full-history window is exact") {
    val vals = Seq(100L, 200L, 300L, 250L, 150L, 400L)
    val out = Indicators.emaTruncated(series(vals), Seq(col("key")), col("t"),
      col("c"), alphaNum = 2, alphaDen = 11, window = 40)
      .orderBy("t").select("ema").as[Double].collect()
    val a = 2.0 / 11.0
    val exp = vals.map(_.toDouble).reduceLeft((acc, x) => a * x + (1.0 - a) * acc) / 100.0
    assert(math.abs(out.last - exp) < 1e-12)
    assert(out.head == 1.0, "seed = first close")
  }

  private def ohlc(rows: Seq[(Long, Long, Long)]) =
    rows.zipWithIndex.map { case ((h, l, c), i) => ("k", i.toLong, h, l, c) }
      .toDF("key", "t", "h", "l", "c")

  test("stochastic: %K range position, flat range pins 50, %D is the 3-avg") {
    // 16 candles, high=200, low=100, close walks 100→250 in steps.
    val rows = (0 until 16).map(i => (300L, 100L, 100L + 10L * i))
    val out = Indicators.stochastic(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), n = 14)
      .orderBy("t").select("pct_k", "pct_d")
      .as[(Option[Double], Option[Double])].collect()
    assert(out(12)._1.isEmpty, "warm-up")
    // row 13: lo=100, hi=300, close=230 → %K = 100·130/200 = 65
    assert(out(13)._1.contains(65.0))
    assert(out(14)._1.contains(70.0) && out(15)._1.contains(75.0))
    // %D at row 15 = (65+70+75)/3 = 70
    assert(out(15)._2.contains(70.0))
    assert(out(14)._2.isEmpty, "only 2 valid %K values in frame")

    val flat = Indicators.stochastic(ohlc(Seq.fill(15)((100L, 100L, 100L))),
      Seq(col("key")), col("t"), col("h"), col("l"), col("c"), n = 14)
      .orderBy("t").select("pct_k").as[Option[Double]].collect()
    assert(flat(14).contains(50.0))
  }

  test("atr: first-candle TR is h−l, gap candles dominate via |h − prevClose|") {
    // 14 identical candles h=210,l=190,c=200 (TR=20c) then a gapped
    // candle h=310,l=305,c=306 (TR = |310−200| = 110c).
    val rows = Seq.fill(14)((210L, 190L, 200L)) :+ (310L, 305L, 306L)
    val out = Indicators.atr(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), n = 14)
      .orderBy("t").select("atr").as[Option[Double]].collect()
    assert(out(12).isEmpty, "warm-up")
    assert(out(13).contains(20.0 * 14 / (100.0 * 14)), "all-TR=20c frame")
    // frame rows 1..14: 13×20 + 110 = 370 → 370/1400
    assert(out(14).contains(370.0 / 1400.0))
  }

  test("macd: constant series is identically zero; fold matches driver-side EMAs") {
    // fl(500·α) + fl(500·(1−α)) is not exactly 500, so a constant
    // series yields MACD ~1e-15, not a hard 0 — r4 rounds it away in
    // the oracle query; here assert the tolerance.
    val flat = Indicators.macd(series(Seq.fill(30)(500L)), Seq(col("key")),
      col("t"), col("c")).orderBy("t")
      .select("macd", "signal", "hist").as[(Double, Double, Double)].collect()
    assert(flat.forall(r => math.abs(r._1) < 1e-9 && math.abs(r._2) < 1e-9 &&
      math.abs(r._3) < 1e-9))

    val vals = Seq(100L, 150L, 300L, 250L, 275L)
    val out = Indicators.macd(series(vals), Seq(col("key")), col("t"), col("c"))
      .orderBy("t").select("macd").as[Double].collect()
    def emaRef(xs: Seq[Double], a: Double) =
      xs.reduceLeft((acc, x) => a * x + (1.0 - a) * acc)
    val ds = vals.map(_.toDouble)
    val exp = (emaRef(ds, 2.0 / 13.0) - emaRef(ds, 2.0 / 27.0)) / 100.0
    assert(math.abs(out.last - exp) < 1e-12)
  }

  test("rolling corr: perfect linear co-movement = ±1, constant side = null") {
    def pairDf(xs: Seq[Long], ys: Seq[Long]) =
      xs.zip(ys).zipWithIndex.map { case ((x, y), i) => ("p", i.toLong, x, y) }
        .toDF("pair", "t", "x", "y")
    val xs = (0 until 25).map(i => 100L + 7L * i)
    // y = 3x + 40 → corr exactly 1 on every full frame
    val up = Indicators.rollingCorr(pairDf(xs, xs.map(3 * _ + 40L)),
        Seq(col("pair")), col("t"), col("x"), col("y"), n = 20)
      .filter(col("corr").isNotNull).select("corr").as[Double].collect()
    assert(up.nonEmpty && up.forall(c => math.abs(c - 1.0) < 1e-12))
    val down = Indicators.rollingCorr(pairDf(xs, xs.map(-2 * _ + 9000L)),
        Seq(col("pair")), col("t"), col("x"), col("y"), n = 20)
      .filter(col("corr").isNotNull).select("corr").as[Double].collect()
    assert(down.nonEmpty && down.forall(c => math.abs(c + 1.0) < 1e-12))
    val flat = Indicators.rollingCorr(pairDf(xs, Seq.fill(25)(5L)),
        Seq(col("pair")), col("t"), col("x"), col("y"), n = 20)
      .filter(col("corr").isNotNull).count()
    assert(flat == 0L, "zero variance side yields no correlation")
  }

  test("parkinson: constant h/l ratio gives the closed-form volatility; h=l gives 0") {
    // h/l = e^0.2 exactly by construction of the quantized ln: pick
    // h,l with ln(h/l)·1e6 rounding to 200000 → σ = √(n·q²/(4n ln2 e12))
    val rows = Seq.fill(25)((12214L, 10000L, 11000L)) // ln(1.2214) ≈ 0.200000...
    val out = Indicators.parkinson(ohlc(rows), Seq(col("key")), col("t"),
        col("h"), col("l"), n = 20)
      .filter(col("parkinson").isNotNull).select("parkinson").as[Double].collect()
    val q = math.floor(math.log(12214.0 / 10000.0) * 1e6 + 0.5)
    val exp = math.sqrt(20 * q * q / (4.0 * 20.0 * math.log(2.0) * 1e12))
    assert(out.nonEmpty && out.forall(v => math.abs(v - exp) < 1e-12))

    val flat = Indicators.parkinson(ohlc(Seq.fill(25)((500L, 500L, 500L))),
        Seq(col("key")), col("t"), col("h"), col("l"), n = 20)
      .filter(col("parkinson").isNotNull).select("parkinson").as[Double].collect()
    assert(flat.nonEmpty && flat.forall(_ == 0.0))
  }

  test("obv: signed cumulative flow, flat deltas contribute nothing") {
    val df = Seq(
      ("k", 0L, 100L, 5L),  // no delta → 0
      ("k", 1L, 110L, 3L),  // up   → +3
      ("k", 2L, 110L, 7L),  // flat → 0
      ("k", 3L, 90L, 4L),   // down → −4
      ("k", 4L, 95L, 2L)    // up   → +2
    ).toDF("key", "t", "c", "q")
    val out = Indicators.obv(df, Seq(col("key")), col("t"), col("c"), col("q"))
      .orderBy("t").select("obv").as[Long].collect().toSeq
    assert(out == Seq(0L, 3L, 3L, -1L, 1L))
  }

  test("vwap: hand-checked weighted means, zero-qty buckets dropped") {
    val df = Seq(
      ("k", 0L, 1000L, 2L), ("k", 0L, 2000L, 2L), // bucket 0: (2000+4000)/4c
      ("k", 1L, 500L, 0L),                        // bucket 1: qty 0 → dropped
      ("k", 2L, 300L, 5L)
    ).toDF("key", "b", "pc", "q")
    val out = Indicators.vwap(df, Seq(col("key")), col("b").as("bucket"),
        col("pc"), col("q"))
      .orderBy("bucket").select("bucket", "qty", "vwap")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 4L, 15.0), (2L, 5L, 3.0)))
  }

  test("topCorrelated: signature prune reproduces the exact all-pairs top-k") {
    // a universe with REAL correlation structure: base random-walk
    // series, strongly-correlated companions (2x + tiny wiggle), and
    // independent walks. The screener (48-bit sign signatures,
    // Hamming <= 12 candidates, exact moment verify) must return
    // exactly the all-pairs top-k -- the recall-1-within-radius
    // contract, demonstrated where the radius provably covers the
    // true top pairs and excludes the uncorrelated bulk.
    val rnd = new scala.util.Random(7)
    def walk(n: Int): Seq[Long] =
      Iterator.iterate(10000L)(_ + (rnd.nextInt(401) - 200L)).take(n).toSeq
    val n = 96
    val rows = (0 until 4).flatMap { s =>
      val w = walk(n)
      w.zipWithIndex.flatMap { case (c, t) =>
        Seq((s"base_$s", t.toLong, c),
          (s"twin_$s", t.toLong, 2L * c + t % 5))
      }
    }
    val df = rows.toDF("key", "t", "c")
    val slot = col("t") % 48
    val got = Indicators.topCorrelated(df, col("key"), col("t"), col("c"),
        slot, bits = 48, maxDist = 12, k = 4)
      .select("key_a", "key_b").as[(String, String)].collect().toSet
    assert(got === (0 until 4).map(s => (s"base_$s", s"twin_$s")).toSet,
      "the 4 constructed (base, twin) pairs are the exact top-4")

    // exact all-pairs top-4 agrees: compute corr without the prune
    val h = df.select(col("key").as("k"), col("t").as("bus"), col("c"))
    val a = h.select(col("k").as("ka"), col("bus"), col("c").as("x"))
    val b = h.select(col("k").as("kb"), col("bus"), col("c").as("y"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val exact = a.join(b, "bus").filter(col("ka") < col("kb"))
      .groupBy("ka", "kb")
      .agg(count(lit(1)).as("nn"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      .select(col("ka"), col("kb"),
        ((dec(col("nn")) * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((dec(col("nn")) * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((dec(col("nn")) * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("corr"))
      .orderBy(col("corr").desc, col("ka"), col("kb")).limit(4)
      .select("ka", "kb").as[(String, String)].collect().toSet
    assert(got === exact, "pruned top-k must equal the exact all-pairs top-k")

    // and the prune is real: candidate pairs are far fewer than all pairs
    val sigs = Indicators.signSignatures(df, col("key"), col("t"), col("c"), slot)
    val nCands = graft.llm.Dedup.simHashPairs(sigs, col("k"), col("sig"), 48, 12).count()
    assert(nCands < 28L, s"8 series = 28 pairs all-pairs; prune kept $nCands")
  }

  test("keltner: bands are EMA mid ± mult·ATR, symmetric, null during ATR warm-up") {
    val df = (0 until 15).map(i =>
      ("k", i.toLong, 1000L + i * 10L, 980L - i * 2L, 990L + i * 5L))
      .toDF("key", "t", "h", "l", "c")
    val out = Indicators.keltner(df, Seq(col("key")), col("t"),
        col("h"), col("l"), col("c"), emaN = 20, atrN = 10, mult = 2.0d)
      .orderBy("t").select("mid", "upper", "lower", "atr")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(out.take(9).forall(_._4.isEmpty), "ATR(10) needs 10 candles")
    out.drop(9).foreach { case (Some(mid), Some(up), Some(lo), atr) =>
      assert(atr.nonEmpty && atr.get > 0)
      assert(math.abs((up - mid) - (mid - lo)) < 1e-9, "bands must be symmetric")
      assert(math.abs((up - mid) - 2.0 * atr.get) < 1e-9, "width = mult * ATR")
    }
  }

  test("ichimoku: window midpoints, displacements, and warm-up nulls") {
    // constant series: every midpoint = (maxH+minL)/2 = (120+80)/2 = 1.0
    val n = 90
    val df = (0 until n).map(i => ("k", i.toLong, 120L, 80L, 100L))
      .toDF("key", "t", "h", "l", "c")
    val out = Indicators.ichimoku(df, Seq(col("key")), col("t"),
        col("h"), col("l"), col("c"))
      .orderBy("t")
      .select("tenkan", "kijun", "senkou_a", "senkou_b", "chikou")
      .collect()
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      Option(r.get(i)).map(_.asInstanceOf[Double])
    // warm-ups: tenkan from row 8, kijun from 25, senkou_b from 77 (52-window at t-26)
    assert(d(out(7), 0).isEmpty && d(out(8), 0).contains(1.0))
    assert(d(out(24), 1).isEmpty && d(out(25), 1).contains(1.0))
    assert(d(out(76), 3).isEmpty && d(out(77), 3).contains(1.0))
    // senkou_a appears once kijun existed at t-26: row 25+26 = 51
    assert(d(out(50), 2).isEmpty && d(out(51), 2).contains(1.0))
    // chikou is the +26 close: defined until row n-27, then null
    assert(d(out(n - 27), 4).contains(1.0) && d(out(n - 26), 4).isEmpty)
  }

  test("heikinAshi ≡ the sequential recursion; high/low envelope holds") {
    // (o,h,l,c) cents walking series with gaps and reversals
    val candles = Seq(
      (0L, 100L, 130L, 90L, 120L), (1L, 120L, 140L, 110L, 115L),
      (2L, 115L, 160L, 100L, 150L), (3L, 150L, 155L, 120L, 125L),
      (4L, 125L, 135L, 105L, 110L))
    val df = candles.map { case (t, o, h, l, c) => ("k", t, o, h, l, c) }
      .toDF("key", "t", "o", "h", "l", "c")
    val got = Indicators.heikinAshi(df, Seq(col("key")), col("t"),
        col("o"), col("h"), col("l"), col("c"))
      .orderBy("t")
      .select("ha_open", "ha_high", "ha_low", "ha_close")
      .as[(Double, Double, Double, Double)].collect().toSeq
    // driver-side reference: the textbook recursion in dollars
    var haoC = (candles.head._2 + candles.head._5) / 2.0 // cents
    val expect = candles.map { case (_, o, h, l, c) =>
      val hacC = (o + h + l + c) / 4.0
      val row = (haoC / 100.0, math.max(h / 100.0, math.max(haoC, hacC) / 100.0),
        math.min(l / 100.0, math.min(haoC, hacC) / 100.0), hacC / 100.0)
      haoC = (haoC + hacC) / 2.0
      row
    }
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._1 - e._1) < 1e-12 && math.abs(g._4 - e._4) < 1e-12,
        s"open/close recursion: $g vs $e")
      assert(math.abs(g._2 - e._2) < 1e-12 && math.abs(g._3 - e._3) < 1e-12,
        s"high/low envelope: $g vs $e")
      assert(g._2 >= g._1 && g._2 >= g._4 && g._3 <= g._1 && g._3 <= g._4,
        "ha_high/ha_low must envelope ha_open/ha_close")
    }
  }

  test("autocorr: exact sign-alternating returns give ac = -1; flat gives no row") {
    // closes alternate 100/200: every log return is ±ln 2, and each
    // lag-1 pair satisfies y = -x exactly → Pearson -1.
    val vals = Seq.tabulate(12)(i => if (i % 2 == 0) 100L else 200L)
    val out = Indicators.autocorr(series(vals), Seq(col("key")), col("t"),
      col("c"), lagK = 1)
      .select("n", "ac").as[(Long, Double)].collect()
    assert(out.length == 1)
    assert(out.head._1 == 10L, "11 returns form 10 lag-1 pairs")
    assert(math.abs(out.head._2 + 1.0) < 1e-12)

    val flat = Indicators.autocorr(series(Seq.fill(12)(100L)), Seq(col("key")),
      col("t"), col("c"), lagK = 1).collect()
    assert(flat.isEmpty, "zero-variance returns emit no row")
  }

  test("smaCrossBacktest: trend capture matches driver compounding; flat holds 0") {
    def rqs(c: Seq[Long]): Seq[Long] = c.sliding(2).map { w =>
      math.floor(math.log(w(1).toDouble / w(0).toDouble) * 1e6 + 0.5).toLong
    }.toSeq
    // strictly rising: pos=+1 from the first warm row (3); applied to
    // the returns INTO rows 4..11 (no look-ahead)
    val up = (0 until 12).map(i => 100L + 10L * i)
    val out = Indicators.smaCrossBacktest(series(up), Seq(col("key")), col("t"),
      col("c"), fastN = 2, slowN = 4)
      .select("n", "trades", "strat_ret_pct").as[(Long, Long, Double)].head()
    val s = rqs(up).drop(3).sum
    assert(out._1 == 8L && out._2 == 0L)
    assert(math.abs(out._3 - (math.exp(s / 1e6) - 1.0) * 100.0) < 1e-9)

    // flat series: exact-equality cross → pos 0 throughout, zero return
    val flat = Indicators.smaCrossBacktest(series(Seq.fill(8)(500L)),
      Seq(col("key")), col("t"), col("c"), fastN = 2, slowN = 4)
      .select("n", "trades", "strat_ret_pct").as[(Long, Long, Double)].head()
    assert(flat == ((4L, 0L, 0.0)))

    // reversal: the fast average crosses under → at least one trade,
    // and the short leg profits from the fall
    val rev = (0 until 10).map(i => 1000L + 100L * i) ++
      (1 to 10).map(i => 1900L - 150L * i)
    val r = Indicators.smaCrossBacktest(series(rev), Seq(col("key")), col("t"),
      col("c"), fastN = 2, slowN = 4)
      .select("n", "trades", "strat_ret_pct").as[(Long, Long, Double)].head()
    assert(r._2 >= 1L, "crossover must register a position flip")
  }

  private def ohlcq(rows: Seq[(Long, Long, Long, Long)]) =
    rows.zipWithIndex.map { case ((h, l, c, q), i) => ("k", i.toLong, h, l, c, q) }
      .toDF("key", "t", "h", "l", "c", "q")

  test("donchian: extremes envelope with dyadic mid; warm-up null") {
    val rows = (0 until 25).map(i => (200L + 10L * i, 100L + 10L * i, 150L))
    val out = Indicators.donchian(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), n = 20)
      .orderBy("t").select("upper", "lower", "mid")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(out(18)._1.isEmpty, "warm-up")
    // row 19: hi = h19 = 390c, lo = l0 = 100c, mid = 245c
    assert(out(19) == ((Some(3.9), Some(1.0), Some(2.45))))
    // row 24: hi = h24 = 440c, lo = l5 = 150c
    assert(out(24) == ((Some(4.4), Some(1.5), Some(2.95))))
  }

  test("roc: integer momentum and the hand-checked percent change") {
    val vals = (0 until 15).map(i => 100L + 10L * i)
    val out = Indicators.roc(series(vals), Seq(col("key")), col("t"),
      col("c"), n = 12)
      .orderBy("t").select("momentum", "roc")
      .as[(Option[Long], Option[Double])].collect()
    assert(out(11)._1.isEmpty, "no 12-back close yet")
    assert(out(12) == ((Some(120L), Some(120.0))), "220 vs 100 → +120c, +120%")
    assert(out(14) == ((Some(120L), Some(100.0))), "240 vs 120 → +120c, +100%")
  }

  test("trix: constant series is identically zero; fold matches driver-side triple EMA") {
    val flat = Indicators.trix(series(Seq.fill(10)(500L)), Seq(col("key")),
      col("t"), col("c"), n = 15)
      .orderBy("t").select("trix").as[Option[Double]].collect()
    assert(flat(0).isEmpty, "first row has no lag")
    assert(flat.drop(1).forall(_.contains(0.0)))

    val vals = Seq(100L, 200L, 300L, 250L, 150L, 400L)
    val out = Indicators.trix(series(vals), Seq(col("key")), col("t"),
      col("c"), n = 15)
      .orderBy("t").select("trix").as[Option[Double]].collect()
    val a = 2.0 / 16.0
    def fold(xs: Seq[Double]): Double =
      xs.reduceLeft((acc, x) => a * x + (1.0 - a) * acc)
    def stage(xs: Seq[Double]): Seq[Double] =
      xs.indices.map(i => fold(xs.take(i + 1)))
    val e3 = stage(stage(stage(vals.map(_.toDouble))))
    val exp = 100.0 * (e3(5) - e3(4)) / e3(4)
    assert(math.abs(out(5).get - exp) < 1e-12)
  }

  test("vortex: steady uptrend gives the closed-form VI pair; zero-TR pins 1") {
    // h,l,c all +10c/candle: VM+ = h−prevL = 110, VM- = |l−prevH| = 90,
    // TR = 100 per delta
    val rows = (0 until 16).map(i => (200L + 10L * i, 100L + 10L * i, 150L + 10L * i))
    val out = Indicators.vortex(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), n = 14)
      .orderBy("t").select("vi_plus", "vi_minus")
      .as[(Option[Double], Option[Double])].collect()
    assert(out(13)._1.isEmpty, "warm-up: 13 deltas")
    assert(out(14) == ((Some(1.1), Some(0.9))))

    val flat = Indicators.vortex(ohlc(Seq.fill(16)((100L, 100L, 100L))),
      Seq(col("key")), col("t"), col("h"), col("l"), col("c"), n = 14)
      .orderBy("t").select("vi_plus", "vi_minus")
      .as[(Option[Double], Option[Double])].collect()
    assert(flat(14) == ((Some(1.0), Some(1.0))), "zero-TR frame pins both to 1")
  }

  test("mfi: hand-checked signed-flow ratio; all-up pins 100, flat pins 50") {
    // n=3: deltas +100c, −50c, +150c with qty 2/3/4 →
    // sp = 600·2 + 900·4 = 4800, sn = 450·3 = 1350.
    val rows = Seq((100L, 100L, 100L, 1L), (200L, 200L, 200L, 2L),
      (150L, 150L, 150L, 3L), (300L, 300L, 300L, 4L))
    val out = Indicators.mfi(ohlcq(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), col("q"), n = 3)
      .orderBy("t").select("mfi").as[Option[Double]].collect()
    assert(out(2).isEmpty, "warm-up: only 2 deltas in frame")
    assert(math.abs(out(3).get - 100.0 * 4800 / 6150.0) < 1e-12)

    val up = Indicators.mfi(ohlcq((0 until 16).map(i =>
        (100L + 10 * i, 100L + 10 * i, 100L + 10 * i, i + 1L))),
      Seq(col("key")), col("t"), col("h"), col("l"), col("c"), col("q"), n = 14)
      .orderBy("t").select("mfi").as[Option[Double]].collect()
    assert(up(14).contains(100.0) && up(15).contains(100.0))

    val flat = Indicators.mfi(ohlcq(Seq.fill(16)((100L, 100L, 100L, 7L))),
      Seq(col("key")), col("t"), col("h"), col("l"), col("c"), col("q"), n = 14)
      .orderBy("t").select("mfi").as[Option[Double]].collect()
    assert(flat(14).contains(50.0), "zero signed flow pins 50")
  }

  test("cmf: hand-checked quantized multiplier; doji mfm=0; zero volume null") {
    // n=2: mfm +0.5 on qty 5, −0.5 on qty 3 → (0.5·5 − 0.5·3)/8 = 0.125
    val rows = Seq((200L, 100L, 175L, 5L), (300L, 100L, 150L, 3L))
    val out = Indicators.chaikinMoneyFlow(ohlcq(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), col("q"), n = 2)
      .orderBy("t").select("cmf").as[Option[Double]].collect()
    assert(out(0).isEmpty, "warm-up")
    assert(out(1).contains(0.125))

    // doji rows (h=l) contribute mfm 0 but their volume still counts:
    // frame = mfm −0.5·qty3 + 0·qty5 → −1.5/8
    val doji = Seq((300L, 100L, 150L, 3L), (100L, 100L, 100L, 5L))
    val out2 = Indicators.chaikinMoneyFlow(ohlcq(doji), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), col("q"), n = 2)
      .orderBy("t").select("cmf").as[Option[Double]].collect()
    assert(out2(1).contains(-1.5 / 8.0))

    val zerov = Indicators.chaikinMoneyFlow(ohlcq(Seq.fill(3)((200L, 100L, 150L, 0L))),
      Seq(col("key")), col("t"), col("h"), col("l"), col("c"), col("q"), n = 2)
      .orderBy("t").select("cmf").as[Option[Double]].collect()
    assert(zerov(2).isEmpty, "zero-volume frame emits null")
  }

  test("williamsR: range position is the inverted %K; flat range pins -50") {
    val rows = (0 until 16).map(i => (300L, 100L, 100L + 10L * i))
    val out = Indicators.williamsR(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), n = 14)
      .orderBy("t").select("wr").as[Option[Double]].collect()
    assert(out(12).isEmpty, "warm-up")
    // row 13: hi=300, lo=100, close=230 → %R = −100·70/200 = −35
    assert(out(13).contains(-35.0))
    assert(out(14).contains(-30.0) && out(15).contains(-25.0))

    val flat = Indicators.williamsR(ohlc(Seq.fill(15)((100L, 100L, 100L))),
      Seq(col("key")), col("t"), col("h"), col("l"), col("c"), n = 14)
      .orderBy("t").select("wr").as[Option[Double]].collect()
    assert(flat(14).contains(-50.0))
  }

  test("cci: alternating series matches the closed form; flat frame pins 0") {
    // h=l=c alternating 100/200 cents: tp = 1.0 / 2.0, frame mean 1.5,
    // MAD 0.5 → CCI = ±0.5 / (0.015·0.5) = ±66.66…
    val rows = (0 until 20).map(i => { val c = if (i % 2 == 0) 100L else 200L; (c, c, c) })
    val out = Indicators.cci(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), col("c"), n = 20)
      .orderBy("t").select("cci").as[Option[Double]].collect()
    assert(out(18).isEmpty, "warm-up")
    assert(math.abs(out(19).get - 0.5 / (0.015 * 0.5)) < 1e-9)

    val flat = Indicators.cci(ohlc(Seq.fill(22)((300L, 300L, 300L))),
      Seq(col("key")), col("t"), col("h"), col("l"), col("c"), n = 20)
      .orderBy("t").select("cci").as[Option[Double]].collect()
    assert(flat(21).contains(0.0), "zero deviation pins CCI to 0")
  }

  test("aroon: monotonic trend pins up=100/down=0; ties resolve most-recent") {
    // strictly rising h and l: newest high is always current (dh=0),
    // lowest low is always the oldest frame row (dl=n−1).
    val rows = (0 until 30).map(i => (100L + i, 50L + i, 75L + i))
    val out = Indicators.aroon(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), n = 25)
      .orderBy("t").select("aroon_up", "aroon_down", "aroon_osc")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(out(23)._1.isEmpty, "warm-up")
    assert(out(24) == ((Some(100.0), Some(0.0), Some(100.0))))
    assert(out(29) == ((Some(100.0), Some(0.0), Some(100.0))))

    // constant series: every row ties; most-recent wins for BOTH
    // extremes → up = down = 100, osc = 0.
    val flat = Indicators.aroon(ohlc(Seq.fill(26)((100L, 100L, 100L))),
      Seq(col("key")), col("t"), col("h"), col("l"), n = 25)
      .orderBy("t").select("aroon_up", "aroon_down", "aroon_osc")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(flat(25) == ((Some(100.0), Some(100.0), Some(0.0))))
  }

  test("adx: pure uptrend pins DX=ADX=100; flat series pins 0") {
    val rows = (0 until 30).map(i => (200L + 10L * i, 100L + 10L * i, 150L + 10L * i))
    val out = Indicators.adx(ohlc(rows), Seq(col("key")), col("t"),
      col("h"), col("l"), n = 14)
      .orderBy("t").select("dx", "adx")
      .as[(Option[Double], Option[Double])].collect()
    assert(out(13)._1.isEmpty, "DX warm-up needs 14 deltas")
    assert(out(14)._1.contains(100.0), "all-up frame: DX = 100")
    assert(out(26)._2.isEmpty, "ADX warm-up needs 14 DX values")
    assert(out(27)._2.contains(100.0) && out(29)._2.contains(100.0))

    val flat = Indicators.adx(ohlc(Seq.fill(30)((100L, 50L, 75L))),
      Seq(col("key")), col("t"), col("h"), col("l"), n = 14)
      .orderBy("t").select("dx", "adx")
      .as[(Option[Double], Option[Double])].collect()
    assert(flat(14)._1.contains(0.0), "no directional movement: DX = 0")
    assert(flat(27)._2.contains(0.0))
  }
}
