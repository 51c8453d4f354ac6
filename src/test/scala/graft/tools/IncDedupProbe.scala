package graft.tools

import graft.core.Tables
import graft.llm.{BandIndex, DigestIndex, IncrementalDedup, TextOps}
import graft.storage.TxTable
import org.apache.spark.sql.functions._

/** Phase timing for the `llm_incremental_dedup` catalog query — the
  * heaviest bench entry. Breaks the two admits and the final read
  * apart, with and without the bucketed indexes, so optimization
  * effort lands on the phase that actually owns the time.
  */
object IncDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
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

    (0 until 2).foreach { round =>
      Seq(true, false).foreach { withIdx =>
        val t = new TxTable(spark,
          java.nio.file.Files.createTempDirectory("inc_probe").toString)
        val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        val bi = if (withIdx) Some(new BandIndex(spark, s"ip_b_$run")) else None
        val di = if (withIdx) Some(new DigestIndex(spark, s"ip_d_$run")) else None
        val tag = if (withIdx) "idx" else "raw"
        time(s"[$round/$tag] admit1 (seed)") {
          IncrementalDedup.admit(t, b1, col("doc_id"), col("text"), "2021-01-01",
            bands = bi, digests = di)
        }
        val admitted = time(s"[$round/$tag] admit2 (vs history)") {
          IncrementalDedup.admit(t, b2, col("doc_id"), col("text"), "2021-01-02",
            bands = bi, digests = di)
        }
        time(s"[$round/$tag] final fingerprint+sort+count") {
          admitted.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
            .orderBy(col("doc_id")).count()
        }
        bi.foreach(b => spark.sql(s"DROP TABLE IF EXISTS ${b.table}"))
        di.foreach(x => spark.sql(s"DROP TABLE IF EXISTS ${x.table}"))
      }
    }
    spark.stop()
  }
}
