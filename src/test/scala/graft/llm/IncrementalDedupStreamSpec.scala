package graft.llm

import graft.SparkSpec
import graft.storage.TxTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[IncrementalDedup.admitStream]] — streaming admission with
  * exactly-once delivery across micro-batch redelivery, including the
  * case the naive `sink.write(admit(...))` composition gets wrong: a
  * crash BETWEEN the state fold and the sink write, where the
  * redelivered batch admits nothing yet the sink must still receive
  * the crashed attempt's admissions.
  */
class IncrementalDedupStreamSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def table() = new TxTable(spark,
    java.nio.file.Files.createTempDirectory("incstream").toString)

  private val longA  = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
  private val longB  = ("one two three four five six seven eight nine ten " * 4).trim
  private val freshC = "completely different words about ships and storms and salt"

  test("streaming admission dedups each micro-batch against accumulated state") {
    implicit val sc = spark.sqlContext
    val state = table(); val sink = table()
    val ckpt = java.nio.file.Files.createTempDirectory("incstream_ck").toString
    val in = MemoryStream[(Long, String)]
    val q = IncrementalDedup.admitStream(state, sink, in.toDF().toDF("id", "text"),
      col("id"), col("text"), ckpt, dateOf = b => s"2021-01-0${b + 1}")
    try {
      in.addData((1L, longA), (2L, longB))
      q.processAllAvailable()
      assert(sink.read().select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))

      val nearA = longA.split(" ").dropRight(3).mkString(" ")
      in.addData((10L, longA), (11L, nearA), (12L, freshC))
      q.processAllAvailable()
      assert(sink.read().select("doc_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 12L), "exact+near history dups rejected, fresh admitted")
      assert(sink.read().filter(col("p_date") === "2021-01-02")
        .select("doc_id").as[Long].collect().toSeq === Seq(12L),
        "admissions land in their batch's date partition")
    } finally q.stop()
  }

  test("crash between state fold and sink write: redelivery recovers the admissions") {
    val state = table(); val sink = table()
    val b1 = Seq((1L, longA), (2L, longB)).toDF("id", "text")
    IncrementalDedup.admitBatch(state, sink, b1, col("id"), col("text"),
      "2021-01-01", 8, 2, 0.5)

    val b2 = Seq((10L, longA), (12L, freshC)).toDF("id", "text")
    // crashed attempt: the state fold ran, the sink write never did
    IncrementalDedup.admit(state, b2, col("id"), col("text"), "2021-01-02")
    assert(sink.read().count() === 2, "crash before delivery: sink unchanged")

    // redelivery: admit itself re-admits nothing (same state version),
    // but the batch ⋈ state delivery still carries doc 12 to the sink
    val sv = state.version
    IncrementalDedup.admitBatch(state, sink, b2, col("id"), col("text"),
      "2021-01-02", 8, 2, 0.5)
    assert(state.version === sv, "state fold idempotent on redelivery")
    assert(sink.read().select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 12L), "crashed attempt's admission recovered")

    // full redelivery after a complete batch: both tables no-op
    val (sv2, kv2) = (state.version, sink.version)
    IncrementalDedup.admitBatch(state, sink, b2, col("id"), col("text"),
      "2021-01-02", 8, 2, 0.5)
    assert(state.version === sv2 && sink.version === kv2,
      "complete-batch redelivery must not commit anywhere")
    assert(sink.read().count() === 3)
  }

  test("checkpoint reset: data-derived sink partition keeps delivery exactly-once") {
    // a checkpoint RESET reprocesses data under NEW batchIds, so the
    // batch-date default would land redeliveries in a fresh partition
    // where the partition-scoped insertIgnore cannot see the first
    // delivery. A sinkPartOf derived from the DATA is reset-proof:
    // same doc ⇒ same partition, whatever the scheduler calls the batch.
    val byId = Some(concat(lit("b"), pmod(col("id"), lit(2))))
    val state = table(); val sink = table()
    val b = Seq((1L, longA), (2L, longB)).toDF("id", "text")
    IncrementalDedup.admitBatch(state, sink, b, col("id"), col("text"),
      "2021-01-01", 8, 2, 0.5, sinkPartOf = byId)
    assert(sink.read().count() === 2)
    // simulated reset: identical data, brand-new batch date
    IncrementalDedup.admitBatch(state, sink, b, col("id"), col("text"),
      "2021-03-07", 8, 2, 0.5, sinkPartOf = byId)
    assert(sink.read().select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L), "reset redelivery lands in the same partitions and no-ops")

    // contrast — the DEFAULT batch-date partitioning duplicates across
    // a reset; this pins the documented caveat as observed behavior
    val state2 = table(); val sink2 = table()
    IncrementalDedup.admitBatch(state2, sink2, b, col("id"), col("text"),
      "2021-01-01", 8, 2, 0.5)
    IncrementalDedup.admitBatch(state2, sink2, b, col("id"), col("text"),
      "2021-03-07", 8, 2, 0.5)
    assert(sink2.read().count() === 4,
      "batch-date partitioning is NOT reset-proof (the documented caveat)")
  }
}
