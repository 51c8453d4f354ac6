package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property tests for the round-12 indicator operators,
  * each against a brute-force in-memory reference over random inputs.
  * Fixed seeds → reproducible failures.
  */
class Round12PropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def ohlcGen(rows: Int): Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(rows, for {
      l <- Gen.choose(100L, 900L)
      spread <- Gen.choose(0L, 50L) // 0 → deliberate h = l doji ties
      cOff <- Gen.choose(0L, 50L)
    } yield (l + spread, l, l + math.min(cOff, spread)))

  test("aroon ≡ brute-force since-extreme scan, most-recent tie rule") {
    val n = 10
    for (seed <- 1L to 4L) {
      // values from a SMALL range so ties are common — the tie rule
      // (most recent wins) is the part worth testing
      val rows = sample(Gen.listOfN(50, Gen.choose(1L, 12L)
        .flatMap(h => Gen.choose(0L, h - 1).map(lo => (h, lo)))), seed)
      val df = rows.zipWithIndex.map { case ((h, l), i) => ("k", i.toLong, h, l) }
        .toDF("key", "t", "h", "l")
      val got = Indicators.aroon(df, Seq(col("key")), col("t"),
          col("h"), col("l"), n)
        .orderBy("t").select("aroon_up", "aroon_down")
        .as[(Option[Double], Option[Double])].collect()
      rows.indices.foreach { i =>
        if (i < n - 1) assert(got(i)._1.isEmpty)
        else {
          val frame = rows.slice(i - n + 1, i + 1)
          val maxH = frame.map(_._1).max
          val minL = frame.map(_._2).min
          val dh = (n - 1) - frame.lastIndexWhere(_._1 == maxH)
          val dl = (n - 1) - frame.lastIndexWhere(_._2 == minL)
          val up = 100.0 * (n - 1 - dh) / (n - 1).toDouble
          val dn = 100.0 * (n - 1 - dl) / (n - 1).toDouble
          assert(got(i)._1.contains(up) && got(i)._2.contains(dn),
            s"seed=$seed row=$i: got ${got(i)} want ($up, $dn)")
        }
      }
    }
  }

  test("cci ≡ the integer MAD identity evaluated sequentially") {
    val n = 7
    for (seed <- 1L to 4L) {
      val rows = sample(ohlcGen(40), seed)
      val df = rows.zipWithIndex.map { case ((h, l, c), i) => ("k", i.toLong, h, l, c) }
        .toDF("key", "t", "h", "l", "c")
      val got = Indicators.cci(df, Seq(col("key")), col("t"),
          col("h"), col("l"), col("c"), n)
        .orderBy("t").select("cci").as[Option[Double]].collect()
      val tp3 = rows.map { case (h, l, c) => h + l + c }
      tp3.indices.foreach { i =>
        if (i < n - 1) assert(got(i).isEmpty)
        else {
          val frame = tp3.slice(i - n + 1, i + 1)
          val s = frame.sum
          val d = frame.map(x => math.abs(n * x - s)).sum
          val want =
            if (d == 0L) 0.0
            else 200.0 * n * (n * tp3(i) - s).toDouble / (3.0 * d.toDouble)
          assert(math.abs(got(i).get - want) < 1e-12,
            s"seed=$seed row=$i: got ${got(i)} want $want")
        }
      }
    }
  }

  test("smaCrossBacktest ≡ a sequential in-memory simulation") {
    val (fastN, slowN) = (5, 15)
    for (seed <- 1L to 5L) {
      val closes = sample(Gen.listOfN(80, Gen.choose(50L, 5000L)), seed)
      val df = closes.zipWithIndex.map { case (c, i) => ("k", i.toLong, c) }
        .toDF("key", "t", "c")
      val got = Indicators.smaCrossBacktest(df, Seq(col("key")), col("t"),
          col("c"), fastN, slowN)
        .select("n", "trades", "strat_ret_pct").as[(Long, Long, Double)].head()

      def pos(i: Int): Option[Long] =
        if (i < slowN - 1) None
        else {
          val sf = closes.slice(i - fastN + 1, i + 1).sum
          val ss = closes.slice(i - slowN + 1, i + 1).sum
          val cross = slowN * sf - fastN * ss
          Some(if (cross > 0) 1L else if (cross < 0) -1L else 0L)
        }
      def rq(i: Int): Option[Long] =
        if (i == 0) None
        else Some(math.floor(
          math.log(closes(i).toDouble / closes(i - 1).toDouble) * 1e6 + 0.5).toLong)
      val contribs = closes.indices.flatMap { i =>
        for { sp <- if (i == 0) None else pos(i - 1); r <- rq(i) } yield sp * r
      }
      val trades = closes.indices.count { i =>
        i > 0 && pos(i).isDefined && pos(i - 1).isDefined && pos(i) != pos(i - 1)
      }
      val want = (math.exp(contribs.sum / 1e6) - 1.0) * 100.0
      assert(got._1 == contribs.size.toLong && got._2 == trades.toLong,
        s"seed=$seed: got $got want (n=${contribs.size}, trades=$trades)")
      assert(math.abs(got._3 - want) < 1e-9, s"seed=$seed: ret ${got._3} vs $want")
    }
  }

  test("vortex ≡ sequential TR/VM sums on random candles") {
    val n = 6
    for (seed <- 3L to 6L) {
      val rows = sample(ohlcGen(30), seed)
      val df = rows.zipWithIndex.map { case ((h, l, c), i) => ("k", i.toLong, h, l, c) }
        .toDF("key", "t", "h", "l", "c")
      val got = Indicators.vortex(df, Seq(col("key")), col("t"),
          col("h"), col("l"), col("c"), n)
        .orderBy("t").select("vi_plus", "vi_minus")
        .as[(Option[Double], Option[Double])].collect()
      rows.indices.foreach { i =>
        if (i < n) assert(got(i)._1.isEmpty) // n deltas need n+1 rows
        else {
          val window = (i - n + 1) to i
          val vp = window.map(j => math.abs(rows(j)._1 - rows(j - 1)._2)).sum
          val vm = window.map(j => math.abs(rows(j)._2 - rows(j - 1)._1)).sum
          val tr = window.map { j =>
            val (h, l, c0) = rows(j); val pc = rows(j - 1)._3
            math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
          }.sum
          val (wp, wm) =
            if (tr == 0L) (1.0, 1.0) else (vp.toDouble / tr, vm.toDouble / tr)
          assert(got(i)._1.contains(wp) && got(i)._2.contains(wm),
            s"seed=$seed row=$i: got ${got(i)} want ($wp, $wm)")
        }
      }
    }
  }
}
