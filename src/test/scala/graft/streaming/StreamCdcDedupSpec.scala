package graft.streaming

import graft.SparkSpec
import graft.functions.CdcGearChunks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming chunk-level dedup: [[CdcGearChunks]] composed into a
  * Structured Streaming pipeline — the live form of `llm_cdc_dedup`'s
  * audit. Each arriving document explodes into content-defined
  * chunks; `dropDuplicatesWithinWatermark` on the chunk digest keeps
  * the FIRST copy of every chunk across the stream (storage-dedup
  * ingest: repeated boilerplate spans transfer once), with dedup
  * state bounded by the watermark delay, not stream history. The
  * native expression needs no special streaming treatment — it is a
  * deterministic scan-local kernel, so the explode stays inside the
  * micro-batch's narrow stage and only the digest-keyed dedup holds
  * state.
  */
class StreamCdcDedupSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val t0 = 1629294300000L
  private val text: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to 200).map { i =>
      md.reset()
      md.digest(s"w$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(7)
    }.mkString(" ")
  }

  test("re-sent and prefix-shifted documents transfer only novel chunks") {
    implicit val sc = graft.SparkSpec.spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = in.toDF().toDF("doc_id", "ts", "text")
      .select(col("doc_id"), col("ts"),
        explode(CdcGearChunks.cdcGearChunks(col("text"), 16, 256, 6)).as("chunk"))
      .select(col("doc_id"), col("ts"), md5(col("chunk")).as("dg"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("dg")
      .writeStream.format("memory").queryName("cdc_dedup")
      .outputMode("append").start()
    try {
      in.addData((1L, new java.sql.Timestamp(t0), text))
      q.processAllAvailable()
      val afterFirst = graft.SparkSpec.spark.table("cdc_dedup").count()
      assert(afterFirst > 3, "fixture long enough to actually chunk")

      // exact re-send: zero new chunks survive the dedup
      in.addData((2L, new java.sql.Timestamp(t0 + 1000), text))
      q.processAllAvailable()
      assert(graft.SparkSpec.spark.table("cdc_dedup").count() === afterFirst)

      // prefix-shifted copy: only the chunks the insertion touches
      // are novel — content-defined boundaries resynchronize
      in.addData((3L, new java.sql.Timestamp(t0 + 2000), "XYZ " + text))
      q.processAllAvailable()
      val afterShift = graft.SparkSpec.spark.table("cdc_dedup").count()
      assert(afterShift - afterFirst <= 3,
        s"insertion leaked ${afterShift - afterFirst} novel chunks")
    } finally q.stop()
  }
}
