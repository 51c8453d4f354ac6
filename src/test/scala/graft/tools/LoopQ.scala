package graft.tools
import org.apache.spark.sql.SparkSession
object LoopQ {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(sys.env("LOOPQ_NAME"))
    for (_ <- 1 to sys.env.getOrElse("LOOPQ_N", "12").toInt)
      fn(s, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    s.stop()
  }
}
