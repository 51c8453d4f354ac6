package graft.tools
import org.apache.spark.sql.SparkSession
object LoopQ {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val name = sys.env.getOrElse("LOOPQ_NAME", {
      System.err.println(
        "usage: LOOPQ_NAME=<query> [LOOPQ_N=12] [LOOPQ_DIR=...] " +
          "sbt 'Test/runMain graft.tools.LoopQ'")
      sys.exit(2)
    })
    val fn = graft.SparkEntry.queries(name)
    val dir = sys.env.getOrElse("LOOPQ_DIR", "/root/testdata/sf0.1")
    for (_ <- 1 to sys.env.getOrElse("LOOPQ_N", "12").toInt)
      fn(s, dir).write.format("noop").mode("overwrite").save()
    s.stop()
  }
}
