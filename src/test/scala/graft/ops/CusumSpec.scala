package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Indicators.cusumPeaks]] — the closed form (cumsum − running
  * extreme over n-scaled integer deviations) must agree with the
  * textbook recursion cusum⁺_t = max(0, cusum⁺_{t−1} + (x_t − μ)),
  * including peak location and earliest-tie behavior.
  */
class CusumSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def brute(cents: Seq[Long]): (Double, Int, Double, Int) = {
    val n = cents.size
    val mu = cents.sum.toDouble / n
    var up = 0.0; var dn = 0.0
    var bu = 0.0; var bui = 0; var bd = 0.0; var bdi = 0
    cents.zipWithIndex.foreach { case (c, i) =>
      up = math.max(0.0, up + (c - mu))
      dn = math.max(0.0, dn + (mu - c))
      if (up > bu + 1e-9) { bu = up; bui = i }
      if (dn > bd + 1e-9) { bd = dn; bdi = i }
    }
    (bu / 100.0, bui, bd / 100.0, bdi)
  }

  test("matches the textbook recursion on a shifted-level series") {
    // level shift up at t=10, back down at t=20
    val cents = (0 until 30).map(i => if (i >= 10 && i < 20) 1500L else 1000L)
    val df = cents.zipWithIndex.map { case (c, i) => ("k", i.toLong, c) }
      .toDF("key", "t", "c")
    val got = Indicators.cusumPeaks(df, Seq($"key"), $"t", $"c").collect().head
    val (bu, bui, bd, bdi) = brute(cents)
    assert(got.getAs[Long]("n") == 30L)
    assert(math.abs(got.getAs[Double]("peak_up") - bu) < 1e-9)
    assert(got.getAs[Long]("peak_up_ts") == bui.toLong)
    assert(math.abs(got.getAs[Double]("peak_down") - bd) < 1e-9)
    assert(got.getAs[Long]("peak_down_ts") == bdi.toLong)
  }

  test("flat series: zero peaks, earliest timestamp wins the tie") {
    val df = (0 until 10).map(i => ("k", i.toLong, 500L)).toDF("key", "t", "c")
    val got = Indicators.cusumPeaks(df, Seq($"key"), $"t", $"c").collect().head
    assert(got.getAs[Double]("peak_up") == 0.0 && got.getAs[Double]("peak_down") == 0.0)
    assert(got.getAs[Long]("peak_up_ts") == 0L && got.getAs[Long]("peak_down_ts") == 0L)
  }

  test("random walk agrees with the recursion per key") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b")
    val data = keys.flatMap { k =>
      var c = 10000L
      (0 until 200).map { i => c += rnd.nextInt(201) - 100; (k, i.toLong, c) }
    }
    val got = Indicators.cusumPeaks(data.toDF("key", "t", "c"),
      Seq($"key"), $"t", $"c").collect().map(r => r.getString(0) -> r).toMap
    keys.foreach { k =>
      val cents = data.filter(_._1 == k).sortBy(_._2).map(_._3)
      val (bu, bui, bd, bdi) = brute(cents)
      val r = got(k)
      assert(math.abs(r.getAs[Double]("peak_up") - bu) < 1e-6, s"up $k")
      assert(r.getAs[Long]("peak_up_ts") == bui.toLong, s"up_ts $k")
      assert(math.abs(r.getAs[Double]("peak_down") - bd) < 1e-6, s"down $k")
      assert(r.getAs[Long]("peak_down_ts") == bdi.toLong, s"down_ts $k")
    }
  }
}
