package graft.tools

import graft.core.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** A/B: sharedSpanPairs joining on the gram TEXT vs on its md5 digest,
  * 10x corpus, same session, interleaved rounds — decides whether the
  * digest's narrower shuffle repays the per-row hash at scale.
  */
object SpanAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = ScaleBench.replicateDocs(
        Tables.documents(spark, "/root/testdata/sf0.1"), 10)
      .filter(col("text").isNotNull)
    val grams = docs.select(col("doc_id"),
        explode(array_distinct(
          TextOps.wordNgrams(TextOps.words(col("text")), 10))).as("g"))
      .localCheckpoint()

    def textForm(): Long = {
      val g = grams.select(col("doc_id").as("id"), col("g"))
      val keep = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 32).select(col("g"))
      val pruned = g.join(keep, Seq("g"))
      pruned.select(col("g"), col("id").as("id_a"))
        .join(pruned.select(col("g"), col("id").as("id_b")), Seq("g"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"), min(col("g")).as("span"))
        .count()
    }
    def digestForm(): Long =
      Dedup.sharedSpanPairs(grams, col("doc_id"), col("g"),
        assumeDistinct = true).count()

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    time(textForm _); time(digestForm _) // warmup
    val txt = (0 until 3).map(_ => time(textForm _))
    val dig = (0 until 3).map(_ => time(digestForm _))
    println(f"[ab] text   ${txt.map(t => f"$t%.2f").mkString(" ")} min=${txt.min}%.2f")
    println(f"[ab] digest ${dig.map(t => f"$t%.2f").mkString(" ")} min=${dig.min}%.2f")
    spark.stop()
  }
}
