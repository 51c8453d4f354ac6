package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Sampling.rendezvousShard]] — HRW placement. Pins: shards are in
  * [0, n); assignment is deterministic; growing n→n+1 moves keys ONLY
  * to the new shard (the minimal-disruption contract) at roughly the
  * expected 1/(n+1) rate; and the placement matches an independent
  * Scala argmax over the same md5 weights (the engine-portability
  * claim).
  */
class RendezvousShardSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val n = 2000
  private def frame = (1L to n.toLong).toDF("k")

  test("range, determinism, and agreement with an independent argmax") {
    val got = frame.select($"k", Sampling.rendezvousShard($"k", 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(s => s >= 0 && s < 8))
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(k: Long, s: Int): String =
      md.digest(s"$k:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
    got.foreach { case (k, s) =>
      val expect = (0 until 8).maxBy(i => (w(k, i), i))
      assert(s === expect, s"key $k")
    }
    val again = frame.select(Sampling.rendezvousShard($"k", 8).as("s"))
      .collect().map(_.getInt(0)).toSeq
    assert(again === (1L to n.toLong).map(got(_)))
  }

  test("adding a shard moves keys only TO the new shard, ~1/(n+1) of them") {
    val both = frame.select(
        Sampling.rendezvousShard($"k", 8).as("s8"),
        Sampling.rendezvousShard($"k", 9).as("s9"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val moved = both.filter { case (a, b) => a != b }
    assert(moved.forall(_._2 == 8), "every mover must land on the new shard")
    val frac = moved.length.toDouble / both.length
    assert(frac > 0.05 && frac < 0.18, s"moved fraction $frac far from 1/9")
  }

  test("balance: no shard holds more than 2x the fair share at n=2000, 8 shards") {
    val counts = frame.select(Sampling.rendezvousShard($"k", 8).as("s"))
      .groupBy($"s").count().collect().map(_.getLong(1))
    assert(counts.length === 8)
    assert(counts.max < 2L * n / 8)
  }
}
