package graft.tools
import org.apache.spark.sql.SparkSession
object JaccardProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.catalog.LlmQueries.queries("llm_char_jaccard")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      println(f"[p2] run$i ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    spark.stop()
  }
}
