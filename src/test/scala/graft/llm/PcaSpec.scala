package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pca.topComponent]] — quantized power iteration. */
class PcaSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // planted dominant direction e0-ish: x_i = s_i * u + small noise,
  // deterministic (no RNG)
  private val dim = 8
  private val u = Array(0.9, 0.3, 0.2, 0.1, 0.0, 0.0, 0.1, 0.2)
  private def corpus(n: Int, parts: Int) =
    (0 until n).map { i =>
      val s = (i % 11).toDouble - 5.0 // signal spread
      (i.toLong, (0 until dim).map(j =>
        (s * u(j) + 0.01 * (((i * 31 + j * 17) % 7) - 3)).toFloat))
    }.toDF("id", "v").repartition(parts)

  test("recovers the planted dominant direction, unit norm") {
    val got = Pca.topComponent(corpus(200, 4), col("v"), iters = 3)
      .collect().map(_.getDouble(1))
    val norm = math.sqrt(got.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    val uNorm = math.sqrt(u.map(x => x * x).sum)
    val cos = got.zip(u).map { case (a, b) => a * b }.sum / uNorm
    assert(math.abs(cos) > 0.99, s"|cos(got, planted)| = ${math.abs(cos)}")
  }

  test("quantized sums make the component partition-layout-invariant") {
    val a = Pca.topComponent(corpus(120, 1), col("v"), iters = 2)
      .collect().map(_.getDouble(1)).toSeq
    val b = Pca.topComponent(corpus(120, 7), col("v"), iters = 2)
      .collect().map(_.getDouble(1)).toSeq
    assert(a === b) // exact equality, not approximate
  }

  test("abtt annihilates the top direction and the mean") {
    val df = corpus(200, 4)
    val u = Pca.topComponent(df, col("v"), iters = 3)
      .collect().map(_.getDouble(1))
    val ws = Pca.abtt(df, col("id"), col("v"), iters = 3)
      .collect().map(_.getSeq[Double](1))
    // every processed vector is orthogonal to the removed component
    ws.foreach { w =>
      val proj = w.zip(u).map { case (a, b) => a * b }.sum
      assert(math.abs(proj) < 1e-8, s"residual projection $proj")
    }
    // and the processed corpus mean is (near) zero per dim — only the
    // 10^-6 mean quantization survives
    val n = ws.length
    (0 until dim).foreach { j =>
      val m = ws.map(_(j)).sum / n
      assert(math.abs(m) < 1e-5, s"dim $j mean $m")
    }
  }

  test("mean-centering: a constant offset does not change the component") {
    val base = corpus(150, 3)
    val shifted = base.select(col("id"),
      transform(col("v"), x => x + lit(5.0f)).as("v"))
    val a = Pca.topComponent(base, col("v"), iters = 3)
      .collect().map(_.getDouble(1)).toSeq
    val b = Pca.topComponent(shifted, col("v"), iters = 3)
      .collect().map(_.getDouble(1)).toSeq
    // same direction within quantization noise (10^-6-grained means)
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-3) }
  }
}
