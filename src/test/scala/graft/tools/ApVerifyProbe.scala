package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for llm_allpairs_sim's candidate-verify stage
  * (r17 verdict item 7): numbered repartition of the candidate frame
  * before the SortedDot broadcast joins vs AQE's size-based
  * coalescing. Alternates arms per round in one session, median of
  * AP_N (default 7).
  */
object ApVerifyProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("AP_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("AP_N", "7").toInt
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("llm_allpairs_sim")(s, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(); once() // warm both codegen paths
    val walls = Map("aqe" -> scala.collection.mutable.Buffer[Double](),
                    "repart" -> scala.collection.mutable.Buffer[Double]())
    for (r <- 1 to n; arm <- Seq("repart", "aqe")) {
      if (arm == "repart")
        sys.props("graft.probe.apRepart") =
          s.sparkContext.defaultParallelism.toString
      else sys.props.remove("graft.probe.apRepart")
      val w = once()
      walls(arm) += w
      println(f"[ap] round $r $arm $w%6.2f s")
    }
    walls.foreach { case (arm, b) =>
      val v = b.sorted
      println(f"[ap] MEDIAN $arm ${v(v.size / 2)}%6.2f s over $n rounds")
    }
    s.stop()
  }
}
