package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

class QueryCacheSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def df(tag: Int) = spark.range(5).select(col("id"), lit(tag).as("tag"))

  test("same-key racers compute once; the stripe is per key") {
    val cache = new QueryCache(ttlSeconds = 3600L, clock = () => 0L)
    val computes = new AtomicInteger(0)
    val go = new CountDownLatch(1)
    val done = new CountDownLatch(8)
    (1 to 8).foreach { _ =>
      new Thread(() => {
        go.await()
        cache.getOrCompute("k") { computes.incrementAndGet(); df(1) }.count()
        done.countDown()
      }).start()
    }
    go.countDown()
    assert(done.await(60, TimeUnit.SECONDS))
    assert(computes.get() == 1, "same key must compute exactly once")
    assert(cache.size == 1)
  }

  test("distinct keys never serialize behind one slow compute") {
    val cache = new QueryCache(ttlSeconds = 3600L, clock = () => 0L)
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() => {
      cache.getOrCompute("slow") {
        slowStarted.countDown(); release.await(); df(1)
      }.count()
      ()
    })
    slow.start()
    assert(slowStarted.await(30, TimeUnit.SECONDS))
    // while "slow" holds its per-key stripe, another key must proceed
    val fastDone = new CountDownLatch(1)
    new Thread(() => { cache.getOrCompute("fast")(df(2)).count(); fastDone.countDown() }).start()
    assert(fastDone.await(30, TimeUnit.SECONDS),
      "a different key must not wait behind an in-flight compute")
    release.countDown()
    slow.join(30000)
  }

  test("bounded LRU evicts the least-recently-used entry and unpersists it") {
    val cache = new QueryCache(ttlSeconds = 3600L, clock = () => 0L, maxEntries = 2)
    val computes = new AtomicInteger(0)
    def get(k: String) = cache.getOrCompute(k) { computes.incrementAndGet(); df(k.hashCode) }
    val a = get("a"); val b = get("b")
    a.count(); b.count()
    get("a") // touch: "b" becomes least-recently-used
    val c = get("c") // evicts "b"
    c.count()
    assert(cache.size == 2)
    assert(computes.get() == 3)
    assert(get("a") eq a, "survivor must still be cached")
    // storageLevel matches by plan equivalence, so check before the
    // recompute below re-persists an identical plan
    assert(b.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "evicted entry must be unpersisted")
    get("b") // recompute proves eviction
    assert(computes.get() == 4)
  }

  test("refresh jobs invalidate wired caches") {
    val cache = new QueryCache(ttlSeconds = 3600L, clock = () => 0L)
    cache.getOrCompute("k")(df(1)).count()
    assert(cache.size == 1)
    val dir = java.nio.file.Files.createTempDirectory("qcref").toString
    val table = new graft.storage.TxTable(spark, s"$dir/t")
    val rows = Seq(("2021-01-01 00:00:00", "bitfinex", "BTC", "USD", 1d, 1d, 1d, 1d, 1d))
      .toDF("bucket", "exchange", "base_id", "quote_id", "open", "high", "low", "close", "volume")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    graft.maintenance.AggregateMaintenance.writePartitionedTx(
      rows, table, invalidate = Seq(cache))
    assert(cache.size == 0, "refresh must invalidate the reader cache")
    // and again on the partition-REWRITE branch (table now has a version)
    cache.getOrCompute("k2")(df(2)).count()
    assert(cache.size == 1)
    graft.maintenance.AggregateMaintenance.writePartitionedTx(
      rows, table, invalidate = Seq(cache))
    assert(cache.size == 0, "rewrite-path refresh must invalidate too")
  }

  test("cacheKey distinguishes source snapshots with identical params (ADVICE #2)") {
    import graft.api.OhlcvReader
    val mk = (tag: Double) => Seq(
      ("2021-08-18 13:00:00", "bitfinex", "BTC", "USD", tag, tag, tag, tag, 1d))
      .toDF("time", "exchange", "base_id", "quote_id", "open", "high", "low", "close", "volume")
      .withColumn("time", col("time").cast("timestamp"))
    val p = OhlcvReader.Params("bitfinex", "BTC", "USD", "1m", limit = 10,
      asOf = java.sql.Timestamp.valueOf("2021-08-18 14:00:00"))
    val k1 = OhlcvReader.cacheKey(p, mk(1.0), Map.empty)
    val k2 = OhlcvReader.cacheKey(p, mk(2.0), Map.empty)
    assert(k1 != k2, "different source plans must not share a cache slot")
    // and the same source twice gives a stable key
    val base = mk(3.0)
    assert(OhlcvReader.cacheKey(p, base, Map.empty) ==
      OhlcvReader.cacheKey(p, base, Map.empty))
    // readCached serves the right data for each snapshot
    val cache = new QueryCache(ttlSeconds = 3600L, clock = () => 0L)
    val r1 = OhlcvReader.readCached(cache, mk(1.0), Map.empty, p)
    val r2 = OhlcvReader.readCached(cache, mk(2.0), Map.empty, p)
    assert(r1.first().getAs[Double]("open") == 1.0)
    assert(r2.first().getAs[Double]("open") == 2.0)
    assert(cache.size == 2)
  }
}
