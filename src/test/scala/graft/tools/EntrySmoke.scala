package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-style smoke: builds a plain session (no special confs, like
  * the driver would) and checks SparkEntry.entry returns rows.
  * Run: sbt "Test/runMain graft.tools.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry-smoke] rows=$n schema=${df.schema.simpleString}")
    df.show(5, truncate = false)
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
