package graft.streaming

import graft.SparkSpec
import graft.catalog.SimGraphQueries
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[GiniStream]] — the live per-user-totals map must yield the SAME
  * Gini coefficient as the batch ts_gini query on the same rows:
  * totals are commutative sums and the tie-block algebra is exact
  * integers, so arrival order and batching cannot move the result.
  */
class GiniStreamSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._
  import GiniStream.{GiniRow, Spend}

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("streaming gini ≡ batch ts_gini, exactly, across split batches") {
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
        col("user_id"),
        floor(col("value") * 100d + 0.5d).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
      .map { case (g, u, c) => Spend(g, u, c) }
    assert(rows.length > 100)

    val in = MemoryStream[Spend]
    val q = GiniStream.giniOf(in.toDS())
      .writeStream.format("memory").queryName("gini_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 3)
      in.addData(b1); q.processAllAvailable()
      // The memory sink appends batch-by-batch, so the row count at
      // this boundary splits batch-1 snapshots from batch-2 ones —
      // robust even if a batch's spends net to zero cents (maxBy on
      // sum_cents would tie and could pick the stale snapshot).
      val nBatch1 = spark.table("gini_stream").count()
      in.addData(b2); q.processAllAvailable()

      val all = spark.table("gini_stream").as[GiniRow].collect()
      val (snap1, snap2) = all.splitAt(nBatch1.toInt)
      // latest snapshot per key = batch-2 row if the key appeared in
      // batch 2, else its batch-1 row
      val streamed = (snap1.map(r => r.group -> r).toMap ++
          snap2.map(r => r.group -> r).toMap)
        .map { case (g, fin) =>
          g -> ((fin.n_users, fin.sum_cents, r4(fin.gini)))
        }

      val batch = SimGraphQueries.queries("ts_gini")(spark, sfDir)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

      assert(streamed == batch,
        s"streaming vs batch gini mismatch:\n$streamed\n$batch")
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("mid-stream snapshots are the gini of what has arrived") {
    val (n, s, g) = GiniStream.giniOfTotals(Iterator(10L, 10L, 10L, 10L))
    assert(n === 4L && s === 40L && g === 0.0d)   // perfect equality
    val (_, _, g2) = GiniStream.giniOfTotals(Iterator(0L, 0L, 0L, 100L))
    assert(g2 === 0.75d)                          // concentrated: (n-1)/n
  }
}
