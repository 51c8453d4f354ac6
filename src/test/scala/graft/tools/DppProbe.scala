package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: does a broadcast left-semi join on the partition
  * column trigger dynamic partition pruning on a parquet scan? Decides
  * whether CandleStream.runPipeline can drop its per-trigger min-date
  * `.first()` in favour of a DPP semi join without risking a full scan.
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .appName("dpp-probe").getOrCreate()
    import spark.implicits._

    val dir = "/tmp/dpp_probe_table"
    (1 to 1000).map(i => (i, f"2024-01-${i % 28 + 1}%02d"))
      .toDF("id", "p_date")
      .withColumn("p_date", to_date($"p_date"))
      .write.mode("overwrite").partitionBy("p_date").parquet(dir)

    val touched = Seq("2024-01-03", "2024-01-05").toDF("d")
      .withColumn("p_date", to_date($"d")).select("p_date").distinct()

    val joined = spark.read.parquet(dir)
      .join(broadcast(touched), Seq("p_date"), "left_semi")

    val plan = joined.queryExecution.executedPlan.toString
    println("=== PLAN ===")
    println(plan)
    println("DPP in plan: " + plan.toLowerCase.contains("dynamicpruning"))
    joined.collect()
    // after execution, AQE final plan shows actual partition count read
    println("=== FINAL ===")
    println(joined.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
