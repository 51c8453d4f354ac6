package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TransitionStream]] — live journey edges. Pins: one-row-per-user
  * state chains ACROSS micro-batches (the cross-batch edge emits);
  * within a batch rows fold in (tus, event_id) order whatever the
  * arrival order; per-user isolation; a user's first event emits
  * nothing; and an in-order feed reproduces the batch ts_markov
  * transition multiset exactly.
  */
class TransitionStreamSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._
  import TransitionStream.{Ev, Transition}

  private def withRocksDb[A](f: => A): A = {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prior match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("cross-batch chaining, in-batch ordering, per-user isolation") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = TransitionStream.transitions(in.toDS())
        .writeStream.format("memory").queryName("trans_out")
        .outputMode("append").start()
      try {
        // batch 1: user 1 shuffled arrival (view@1, click@2 arrive
        // reversed), user 2's lone first event
        in.addData(Ev(1L, 12L, 2000L, "click"), Ev(1L, 11L, 1000L, "view"),
          Ev(2L, 21L, 1000L, "view"))
        q.processAllAvailable()
        val b1 = spark.table("trans_out").as[Transition].collect().toSet
        assert(b1 === Set(Transition(1L, "view", "click", 2000L)))
        // batch 2: user 1 continues (cross-batch edge click->purchase),
        // user 2 gets its first edge
        in.addData(Ev(1L, 13L, 3000L, "purchase"), Ev(2L, 22L, 5000L, "click"))
        q.processAllAvailable()
        val b2 = spark.table("trans_out").as[Transition].collect().toSet
        assert(b2 === Set(
          Transition(1L, "view", "click", 2000L),
          Transition(1L, "click", "purchase", 3000L),
          Transition(2L, "view", "click", 5000L)))
      } finally q.stop()
    }
  }

  test("in-order feed reproduces the batch transition multiset on the fixture") {
    withRocksDb {
      val ev = graft.core.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("tus"), col("event_type"))
        .as[Ev].orderBy($"tus", $"event_id").collect().toSeq
      implicit val sc = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = TransitionStream.transitions(in.toDS())
        .writeStream.format("memory").queryName("trans_parity")
        .outputMode("append").start()
      try {
        // two in-order batches split mid-stream: the chain must survive
        val (a, b) = ev.splitAt(ev.length / 2)
        in.addData(a: _*); q.processAllAvailable()
        in.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("trans_parity")
        .groupBy($"from_event", $"to_event").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"tus", $"event_id")
      val batch = graft.core.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("tus"), col("event_type"))
        .withColumn("next", lead($"event_type", 1).over(w))
        .filter($"next".isNotNull)
        .groupBy($"event_type".as("from_event"), $"next".as("to_event")).count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    }
  }
}
