package graft.tools
import graft.catalog.LlmQueries
import org.apache.spark.sql.SparkSession
object ExplainEdit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("explain-edit").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = LlmQueries.queries("llm_edit_neardup")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    println("LEVENSHTEIN-COUNT: " + "levenshtein".r.findAllIn(plan.toLowerCase).length)
    spark.stop()
  }
}
