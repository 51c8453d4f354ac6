package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property tests: the indicator windows vs sequential
  * in-memory references over random multi-key price walks. Fixed
  * seeds → reproducible failures.
  */
class IndicatorsPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  /** Random cents walk per key: 2 keys × up to 60 steps. */
  private def walks(seed: Long): Map[String, Vector[Long]] = {
    val gen = Gen.listOfN(2, for {
      n <- Gen.choose(20, 60)
      steps <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    } yield steps.scanLeft(10000L)(_ + _).toVector)
    val ws = gen.apply(Gen.Parameters.default, Seed(seed)).get
    Seq("a", "b").zip(ws).toMap
  }

  private def toDf(ws: Map[String, Vector[Long]]) =
    ws.toSeq.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (c, i) => (k, i.toLong, c) }
    }.toDF("key", "t", "c")

  test("rsi ∈ [0, 100], matches the sequential gain/loss definition") {
    for (seed <- 1L to 5L) {
      val ws = walks(seed)
      val got = Indicators.rsi(toDf(ws), Seq(col("key")), col("t"), col("c"), 14)
        .select("key", "t", "rsi").as[(String, Long, Option[Double])]
        .collect().map { case (k, t, r) => (k, t) -> r }.toMap
      for ((k, vs) <- ws; i <- vs.indices) {
        val want: Option[Double] =
          if (i < 14) None
          else {
            val deltas = ((i - 13) to i).map(j => vs(j) - vs(j - 1))
            val g = deltas.filter(_ > 0).sum
            val l = -deltas.filter(_ < 0).sum
            Some(if (g + l == 0) 50.0 else 100.0 * g / (g + l).toDouble)
          }
        assert(got((k, i.toLong)) == want, s"key=$k i=$i seed=$seed")
        got((k, i.toLong)).foreach(r => assert(r >= 0.0 && r <= 100.0))
      }
    }
  }

  test("bollinger bands bracket mid and close stays within [lo-frame, hi-frame]") {
    for (seed <- 1L to 5L) {
      val ws = walks(seed)
      val rows = Indicators.bollinger(toDf(ws), Seq(col("key")), col("t"),
          col("c"), n = 20, k = 2.0)
        .filter(col("mid").isNotNull)
        .select("key", "t", "mid", "upper", "lower")
        .as[(String, Long, Double, Double, Double)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (k, t, mid, up, lo) =>
        assert(up >= mid && mid >= lo, s"band order key=$k t=$t seed=$seed")
        // sequential reference for the mean
        val frame = ws(k).slice(t.toInt - 19, t.toInt + 1)
        assert(math.abs(mid - frame.sum / (100.0 * 20)) < 1e-9)
      }
    }
  }

  test("obv telescopes: last OBV = Σ signed flow, and is shift-invariant in qty sign pattern") {
    for (seed <- 1L to 5L) {
      val ws = walks(seed)
      val df = toDf(ws).withColumn("q", pmod(col("c"), lit(7L)) + 1L)
      val got = Indicators.obv(df, Seq(col("key")), col("t"), col("c"), col("q"))
        .select("key", "t", "obv").as[(String, Long, Long)]
        .collect().map { case (k, t, o) => (k, t) -> o }.toMap
      for ((k, vs) <- ws) {
        var acc = 0L
        vs.indices.foreach { i =>
          val q = vs(i) % 7 + (if (vs(i) % 7 < 0) 8 else 1) // pmod+1
          if (i > 0) {
            if (vs(i) > vs(i - 1)) acc += q
            else if (vs(i) < vs(i - 1)) acc -= q
          }
          assert(got((k, i.toLong)) == acc, s"key=$k i=$i seed=$seed")
        }
      }
    }
  }

  test("stochastic %K ∈ [0, 100] and hits 0/100 exactly at frame extremes") {
    for (seed <- 1L to 5L) {
      val ws = walks(seed)
      val ohlc = ws.toSeq.flatMap { case (k, vs) =>
        vs.zipWithIndex.map { case (c, i) => (k, i.toLong, c + 50L, c - 50L, c) }
      }.toDF("key", "t", "h", "l", "c")
      val rows = Indicators.stochastic(ohlc, Seq(col("key")), col("t"),
          col("h"), col("l"), col("c"), n = 14)
        .filter(col("pct_k").isNotNull)
        .select("key", "t", "pct_k").as[(String, Long, Double)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (k, t, pk) =>
        assert(pk >= 0.0 && pk <= 100.0, s"key=$k t=$t seed=$seed pk=$pk")
        val frame = ws(k).slice(t.toInt - 13, t.toInt + 1)
        val lo = frame.min - 50L; val hi = frame.max + 50L
        val want = 100.0 * (ws(k)(t.toInt) - lo) / (hi - lo).toDouble
        assert(math.abs(pk - want) < 1e-9)
      }
    }
  }

  test("sharpe equals the sequential micro-nat moment computation") {
    for (seed <- 1L to 5L) {
      val ws = walks(seed).view.mapValues(_.map(math.max(_, 1L))).toMap
      val got = Indicators.sharpe(toDf(ws), Seq(col("key")), col("t"), col("c"),
          periodsPerYear = 8760.0d)
        .select("key", "n", "sharpe").as[(String, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      for ((k, vs) <- ws) {
        val rq = vs.sliding(2).collect {
          case Vector(p, c) if p > 0 && c > 0 =>
            math.floor(math.log(c.toDouble / p.toDouble) * 1e6 + 0.5).toLong
        }.toVector
        val n = rq.size.toLong
        val s = rq.map(BigInt(_)).sum
        val q = rq.map(r => BigInt(r) * BigInt(r)).sum
        val varNum = BigInt(n) * q - s * s
        if (n >= 2 && varNum > 0) {
          val want = s.toDouble / n.toDouble /
            math.sqrt(varNum.toDouble / (BigInt(n) * BigInt(n)).toDouble) *
            math.sqrt(8760.0)
          assert(got(k)._1 == n, s"key=$k seed=$seed n")
          assert(math.abs(got(k)._2 - want) < 1e-9 * math.abs(want),
            s"key=$k seed=$seed ${got(k)._2} vs $want")
        } else assert(!got.contains(k), s"key=$k seed=$seed should be absent")
      }
    }
  }

  test("sortino equals the sequential downside-moment computation") {
    for (seed <- 1L to 5L) {
      val ws = walks(seed).view.mapValues(_.map(math.max(_, 1L))).toMap
      val got = Indicators.sortino(toDf(ws), Seq(col("key")), col("t"), col("c"),
          periodsPerYear = 8760.0d)
        .select("key", "n", "sortino").as[(String, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      for ((k, vs) <- ws) {
        val rq = vs.sliding(2).collect {
          case Vector(p, c) if p > 0 && c > 0 =>
            math.floor(math.log(c.toDouble / p.toDouble) * 1e6 + 0.5).toLong
        }.toVector
        val n = rq.size.toLong
        val s = rq.map(BigInt(_)).sum
        val qd = rq.filter(_ < 0).map(r => BigInt(r) * BigInt(r)).sum
        if (n >= 2 && qd > 0) {
          val want = s.toDouble / n.toDouble /
            math.sqrt(qd.toDouble / n.toDouble) * math.sqrt(8760.0)
          assert(got(k)._1 == n && math.abs(got(k)._2 - want) <= 1e-9 * math.abs(want),
            s"key=$k seed=$seed")
        } else assert(!got.contains(k), s"key=$k seed=$seed should be absent")
      }
    }
  }

  test("maxDrawdown equals the sequential peak-to-trough scan") {
    for (seed <- 1L to 5L) {
      // clamp to ≥1 cent: prices are positive by domain, and the
      // percent-of-peak division needs a nonzero peak
      val ws = walks(seed).view.mapValues(_.map(math.max(_, 1L))).toMap
      val got = Indicators.maxDrawdown(toDf(ws),
          Seq(col("key")), col("t"), col("c"))
        .select("key", "n", "max_dd_pct").as[(String, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      for ((k, vs) <- ws) {
        var peak = Long.MinValue
        var dd = Double.MinValue
        vs.foreach { c =>
          peak = math.max(peak, c)
          dd = math.max(dd, (peak - c) * 100.0 / peak.toDouble)
        }
        assert(got(k)._1 == vs.size && got(k)._2 == dd, s"key=$k seed=$seed")
      }
    }
  }
}
