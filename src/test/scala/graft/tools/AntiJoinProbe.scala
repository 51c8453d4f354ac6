package graft.tools

import org.apache.spark.sql.functions._

/** A/B for VERDICT r12 #2: rel_anti_join regressed 0.337→0.503 s
  * r11→r12 with NO code change to the query (the only >30% move among
  * 145 common queries). Same-session interleaved rounds against
  * rel_semi_join (same tables, same shape, did not move r11→r12) to
  * decide noise vs real. Run:
  *   sbt "Test/runMain graft.tools.AntiJoinProbe"
  */
object AntiJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up (codegen + file-listing caches)
    time("rel_anti_join"); time("rel_semi_join")
    val anti = collection.mutable.ArrayBuffer[Double]()
    val semi = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until 7) { anti += time("rel_anti_join"); semi += time("rel_semi_join") }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[ab] anti ${anti.map(t => f"$t%.3f").mkString(" ")} median=${med(anti.toSeq)}%.3f")
    println(f"[ab] semi ${semi.map(t => f"$t%.3f").mkString(" ")} median=${med(semi.toSeq)}%.3f")
    spark.stop()
  }
}
