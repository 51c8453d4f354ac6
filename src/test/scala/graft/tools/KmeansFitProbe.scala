package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity

/** Breakdown probe for VERDICT r12 #3: where does the kMeansFit
  * driver floor go? Times the whole family at sf0.1 plus a fit-only
  * breakdown (init action + per-iteration assign+centroid+collect).
  * Run: sbt "Test/runMain graft.tools.KmeansFitProbe"
  */
object KmeansFitProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[kmfit] $label%-28s $s%.3f s")
      s
    }

    val family = Seq("llm_kmeans_ivf", "llm_semantic_dedup", "llm_semantic_pack", "llm_embed_outliers")
    // warm-up round
    family.foreach(q => graft.SparkEntry.queries(q)(spark, d).collect())
    var tot = 0.0
    for (q <- family) tot += time(q) { graft.SparkEntry.queries(q)(spark, d).collect() }
    println(f"[kmfit] family total            $tot%.3f s")

    // fit-only breakdown on the same inputs the family uses
    val emb = Tables.embeddings(spark, d)
    time("fit k=8 iters=5 (whole)") {
      Similarity.kMeansFit(emb, col("vec_id"), col("embedding"), 8, 5).collect()
    }
    time("fit k=8 iters=5 (again)") {
      Similarity.kMeansFit(emb, col("vec_id"), col("embedding"), 8, 5).collect()
    }
    spark.stop()
  }
}
