package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** [[VpinStream]] — live equal-volume VPIN buckets. Pins: the
  * tick-rule classification against the carried last close (including
  * the integer-exact even split of zero-change flows), exact bucket
  * cuts with flows SPLIT buy-first across bucket boundaries, one-row
  * state chaining across micro-batches, shuffled in-batch arrival,
  * volume conservation, and batch/stream cut equivalence on a
  * hand-traced fixture.
  */
class VpinStreamSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._
  import VpinStream.{Flow, VpinBucket}

  private def withRocksDb[A](f: => A): A = {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prior match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def run(name: String, batches: Seq[Seq[Flow]],
                  bucketSize2: Long): Seq[VpinBucket] = withRocksDb {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Flow]
    val q = VpinStream.buckets(in.toDS(), bucketSize2)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[VpinBucket].collect().toSeq
    } finally q.stop()
  }

  test("hand-traced cuts: tick rule, zero-change split, buy-first boundary split") {
    // series k, bucketSize2 = 20 (10 raw units per bucket).
    // flow 1 @100: seeds last close, counts nothing.
    // flow 2 qty 4, close 110 (up)  → v2=8,  buy2=8
    // flow 3 qty 3, close 110 (flat)→ v2=6,  buy2=3 (even split, exact)
    // flow 4 qty 5, close 105 (down)→ v2=10, buy2=0 — bucket hits 20
    //   after taking 6 of the 10: bucket0 = (v2=20, buy2=11);
    //   remainder v2=4 opens bucket1.
    val flows = Seq(
      Flow("k", 1000L, 10000L, 7L),
      Flow("k", 2000L, 11000L, 4L),
      Flow("k", 3000L, 11000L, 3L),
      Flow("k", 4000L, 10500L, 5L))
    val out = run("vpin_hand", Seq(flows), 20L)
    assert(out === Seq(VpinBucket("k", 0L, 20L, 11L,
      math.abs(2L * 11L - 20L).toDouble / 20.0)))
  }

  test("cross-batch chaining matches the single-batch cut exactly") {
    val flows = (0 until 40).map { i =>
      // alternating up/down closes, varying volume
      Flow("s", 1000L * (i + 1), 10000L + (if (i % 2 == 0) 50L else -50L) * (i % 5 + 1),
        (i % 7 + 1).toLong)
    }
    val one = run("vpin_one", Seq(flows), 30L)
    val two = run("vpin_two", Seq(flows.take(13), flows.slice(13, 29),
      flows.drop(29)), 30L)
    assert(one === two, "bucket stream must be batch-cut invariant")
    // every completed bucket is exactly full
    one.foreach(b => assert(b.v2 === 30L))
    // volume conservation: completed + implied open tail = total after seed
    val total2 = flows.drop(1).map(_.qty * 2L).sum
    assert(one.map(_.v2).sum <= total2 && total2 - one.map(_.v2).sum < 30L)
  }

  test("shuffled in-batch arrival folds in bus order; series are isolated") {
    val a = Seq(Flow("a", 1000L, 100L, 5L), Flow("a", 2000L, 200L, 5L),
      Flow("a", 3000L, 100L, 5L))
    val b = Seq(Flow("b", 1000L, 100L, 5L), Flow("b", 2000L, 50L, 5L),
      Flow("b", 3000L, 75L, 5L))
    val shuffled = Seq(a(2), b(1), a(0), b(2), a(1), b(0))
    val out = run("vpin_shuf", Seq(shuffled), 20L)
    val expected = run("vpin_ord", Seq(a ++ b), 20L)
    assert(out.toSet === expected.toSet)
    // series a: flows 2,3 count (up 5→buy2=10, down 5→buy2=0): one full
    // bucket of 20 with buy2=10
    assert(out.filter(_.series == "a") ===
      Seq(VpinBucket("a", 0L, 20L, 10L, 0.0)))
  }
}
