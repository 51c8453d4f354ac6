package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.llm.{NgramLm, TextOps}

/** Interleaved A/B for llm_kn_lm: the grouped bigram frame `c` inside
  * knModel feeds FOUR consumers (byW1, byW2, T, and the model join) —
  * ReuseExchange shares its exchange only where the subtrees match
  * exactly, so this probes localCheckpointing c (vocab-sized, smaller
  * than the instance frame the query already checkpoints).
  */
object KnAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def bg() = NgramLm.wordBigrams(
      Tables.fanOut(Tables.documents(spark, dir)), col("doc_id"),
      TextOps.words(col("text"))).localCheckpoint(false)

    def modelOf(b: DataFrame, ckpt: Boolean): DataFrame = {
      val c0 = b.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      val c = if (ckpt) c0.localCheckpoint(false) else c0
      val byW1 = c.groupBy(col("w1"))
        .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n1f"))
      val byW2 = c.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
      val t = c.agg(count(lit(1)).as("t"))
      c.join(byW1, Seq("w1")).join(byW2, Seq("w2")).crossJoin(broadcast(t))
    }

    def run(ckpt: Boolean): Double = {
      val b = bg()
      val t0 = System.nanoTime()
      NgramLm.knScore(b, modelOf(b, ckpt))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(false); run(true)
    val ta = (0 until 5).map(_ => run(false))
    val tb = (0 until 5).map(_ => run(true))
    println(f"[knab] plain: ${ta.map(t => f"$t%.2f").mkString(" ")} median=${ta.sorted.apply(2)}%.2f")
    println(f"[knab] ckptC: ${tb.map(t => f"$t%.2f").mkString(" ")} median=${tb.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
