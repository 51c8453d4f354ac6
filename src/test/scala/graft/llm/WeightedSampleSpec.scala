package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.weightedSample]] — Efraimidis–Spirakis A-Res. Pins the
  * exact key closed form against an independent Scala md5 reference,
  * weight-proportional inclusion odds over many independent salts,
  * degenerate-n behavior, weight guards, and partition determinism.
  */
class WeightedSampleSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def refKey(salt: String, id: Long, w: Double): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$salt|$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val v = java.lang.Long.parseLong(hex.take(13), 16).toDouble
    math.log((v + 0.5) / 4503599627370496.0) / w
  }

  private def sample(rows: Seq[(Long, Long)], n: Int, salt: String) =
    Sampling.weightedSample(rows.toDF("id", "w"), col("id"), col("w"), n, salt)

  test("key matches the closed form computed independently") {
    val out = sample(Seq(1L -> 10L, 2L -> 200L, 3L -> 3L), 3, "s0")
      .select(col("id"), col("__wkey")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, w) <- Seq(1L -> 10L, 2L -> 200L, 3L -> 3L))
      assert(out(id) == refKey("s0", id, w.toDouble))
  }

  test("n >= rows returns every positive-weight row") {
    val out = sample(Seq(1L -> 5L, 2L -> 5L, 3L -> 5L), 10, "s1")
    assert(out.count() == 3)
  }

  test("zero, negative, and null weights are excluded") {
    val df = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-4L)), (4L, None))
      .toDF("id", "w")
    val out = Sampling.weightedSample(df, col("id"), col("w"), 10, "s2")
    assert(out.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("inclusion odds track the weights across independent salts") {
    // item 1 has weight 9, item 2 weight 1: P(item 1 wins the single
    // slot) = 9/10. Each salt is an independent deterministic draw;
    // the "key matches the closed form" test ties the engine to
    // refKey, so the odds property can be measured on the closed form
    // directly — 2000 salts without 2000 Spark jobs.
    val wins = (0 until 2000).count { i =>
      refKey(s"odds$i", 1L, 9.0) > refKey(s"odds$i", 2L, 1.0)
    }
    assert(wins > 1720 && wins < 1880, s"heavy item won $wins/2000 (expect ~1800)")
  }

  test("partition determinism: 1 vs 4 shuffle partitions agree") {
    val rows = (1L to 500L).map(i => i -> (i % 17 + 1))
    val a = sample(rows, 20, "s3").select("id").as[Long].collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = sample(rows, 20, "s3").select("id").as[Long].collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
