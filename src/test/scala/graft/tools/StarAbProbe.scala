package graft.tools

import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** A/B: componentsStar with vs without the localContract pre-pass on
  * the 10x chain graph (the llm_components_chain shape), same session,
  * interleaved rounds — isolates the contraction's scale behavior
  * from session-to-session ScaleBench noise.
  */
object StarAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = 50000L * 10L
    val ids = spark.range(n).select(col("id").as("vec_id"))
    val edges = ids.filter(col("vec_id") % 50 =!= 49)
      .select(col("vec_id").as("src"), (col("vec_id") + 1L).as("dst"))
      .localCheckpoint()

    def run(contract: Boolean): Double = {
      val t0 = System.nanoTime()
      Dedup.componentsStar(edges, col("src"), col("dst"), contract = contract)
        .agg(count(lit(1)), sum(col("label"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup
    run(contract = true); run(contract = false)
    val on  = (0 until 3).map(_ => run(contract = true))
    val off = (0 until 3).map(_ => run(contract = false))
    println(f"[ab] contract=on  ${on.map(t => f"$t%.2f").mkString(" ")} min=${on.min}%.2f")
    println(f"[ab] contract=off ${off.map(t => f"$t%.2f").mkString(" ")} min=${off.min}%.2f")
    spark.stop()
  }
}
