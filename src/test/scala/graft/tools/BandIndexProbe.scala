package graft.tools

import graft.core.Tables
import graft.llm.{BandIndex, IncrementalDedup}
import graft.storage.TxTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The band index's money measurement — the daily-crawl regime the
  * feature exists for: a LARGE accumulated state (the 10x ScaleBench
  * corpus, minus the batch) and a SMALL increment (the sf0.1 docs,
  * Caesar-rotated so they're genuinely new). Measures admit() with
  * the derive-from-state path (re-bands the whole state per
  * increment) vs the bucketed BandIndex path (catch-up O(new rows),
  * candidate join bucket-local), plus the one-time index
  * backfill each path's first increment pays.
  */
object BandIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
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
    // history: replicas 1..9 of the 10x corpus (45k docs); increment:
    // replica 0 (5k docs) — disjoint rotations, so near-zero true dups
    val big = ScaleBench.replicateDocs(Tables.documents(spark, d), 10)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val history = big.filter(col("doc_id") >= 1000000L)
    val batch = big.filter(col("doc_id") < 1000000L)
    println(s"[probe] history=${history.count()} docs, batch=${batch.count()} docs")

    def freshState(tag: String, seed: org.apache.spark.sql.DataFrame,
                   bands: Option[BandIndex]): TxTable = {
      val t = new TxTable(spark,
        java.nio.file.Files.createTempDirectory(s"bandprobe_$tag").toString)
      time(s"$tag seed state (${if (bands.isDefined) "with" else "no"} index)")(
        IncrementalDedup.admit(t, seed, col("doc_id"), col("text"), "2021-01-01",
          bands = bands).count())
      t
    }

    // A: derive-from-state (no index)
    val tA = freshState("A", history, None)
    (1 to 3).foreach { i =>
      time(s"A increment $i (derive bands from FULL state)")(
        IncrementalDedup.admit(tA, batch, col("doc_id"), col("text"), s"2021-01-0${i + 1}")
          .count())
    }

    // B: band index — first increment pays the one-time backfill of
    // history's bands, later increments are catch-up O(new rows)
    val bi = new BandIndex(spark, s"bandprobe_idx_${System.nanoTime()}")
    val tB = freshState("B", history, Some(bi))
    (1 to 3).foreach { i =>
      time(s"B increment $i (bucket-local via BandIndex)")(
        IncrementalDedup.admit(tB, batch, col("doc_id"), col("text"), s"2021-01-0${i + 1}",
          bands = Some(bi)).count())
    }
    println(s"[probe] band index rows: ${bi.read().count()}")
    spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
    spark.stop()
  }
}
