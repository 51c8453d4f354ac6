package graft.tools

/** Ad-hoc timing of named catalog queries at sf0.1 (warm, median of 3):
  *   sbt "Test/runMain graft.tools.HotQueriesProbe q1,q2,..."
  */
object HotQueriesProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("ts_quantiles", "ts_mad_outliers", "llm_quality_filter"))
    for (q <- names) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, d).collect() // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, d).collect(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[hot] $q%-24s median=${ts(1)}%.3f  (${ts.map(t => f"$t%.3f").mkString(" ")})")
    }
    spark.stop()
  }
}
