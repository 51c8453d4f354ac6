package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity

/** Probe: kmeans-IVF recall@10 vs brute force per scale factor.
  * Run: sbt "Test/runMain graft.tools.KmeansProbe"
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      val bf = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, 10).collect().map(_.getLong(0)).toSet
      val km = Similarity.ivfKMeansTopK(emb, col("vec_id"), col("embedding"),
        col("vec_id") === 0L, 10, cells = 8, iters = 5).collect().map(_.getLong(0)).toSet
      println(s"PROBE $sf recall@10 = ${(bf & km).size}/10 missing=${(bf -- km).mkString(",")}")
    }
    spark.stop()
  }
}
