package graft.tools

import graft.core.Tables
import graft.llm.{BandIndex, DigestIndex, IncrementalDedup, TextOps}
import graft.storage.TxTable
import org.apache.spark.sql.functions._

/** Wall-clock of the round-15 prepared-pipeline form of
  * llm_incremental_dedup, at its sync points, plus an A/B against
  * late-prepare (= the round-14 scheduling with the fused verify).
  */
object IncDedupProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val d = "/root/testdata/sf0.1"
    val docs = Tables.fanOut(Tables.documents(spark, d)).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val ws = TextOps.words(col("text"))
    val pert = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"),
        array_join(slice(ws, lit(1), greatest(size(ws) - 3, lit(0))), " ").as("text"))
    val b2 = docs.filter(col("doc_id") % 3 =!= 0).unionByName(pert)

    (0 until 6).foreach { round =>
      val early = round % 2 == 0
      val t = new TxTable(spark,
        java.nio.file.Files.createTempDirectory("inc_probe3").toString)
      val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val bi = new BandIndex(spark, s"ip3_b_$run")
      val di = new DigestIndex(spark, s"ip3_d_$run")
      val tag = if (early) "early" else "late "
      val tAll = System.nanoTime()
      val p1 = IncrementalDedup.prepare(b1, col("doc_id"), col("text"))
      val p2 = if (early) Some(IncrementalDedup.prepare(b2, col("doc_id"), col("text"))) else None
      time(s"[$round $tag] admit1") {
        IncrementalDedup.admitPrepared(t, p1, "2021-01-01",
          bands = Some(bi), digests = Some(di))
      }
      val pp2 = p2.getOrElse(IncrementalDedup.prepare(b2, col("doc_id"), col("text")))
      val out = time(s"[$round $tag] admit2") {
        IncrementalDedup.admitPrepared(t, pp2, "2021-01-02",
          bands = Some(bi), digests = Some(di))
      }
      time(s"[$round $tag] final select+sort+write") {
        out.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[probe] [$round $tag] TOTAL ${(System.nanoTime() - tAll) / 1e9}%7.2f s")
      spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
      spark.sql(s"DROP TABLE IF EXISTS ${di.table}")
    }
    spark.stop()
  }
}
