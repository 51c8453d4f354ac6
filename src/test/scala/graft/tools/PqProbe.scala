package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity

/** Probe: IVF-PQ recall decomposition — how much loss is the coarse
  * probe (cells without the true neighbors) vs PQ ordering (true
  * neighbor in a probed cell but outside the rerank set).
  * Run: sbt "Test/runMain graft.tools.PqProbe"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    val brute = ids(Similarity.bruteForceTopK(emb, col("vec_id"),
      col("embedding"), col("vec_id") === 0L, 10))
    val np = 3
    val probeExact = ids(Similarity.ivfTopKMultiProbe(emb, col("vec_id"),
      col("label"), col("embedding"), col("vec_id") === 0L, 10, np))
    println(s"nprobe=$np exact-in-probe vs brute: ${(probeExact intersect brute).size}/10")
    for ((m, ks) <- Seq((4, 8), (8, 16), (16, 16), (8, 32)); rr <- Seq(40, 80)) {
      val p = ids(Similarity.ivfPqTopK(emb, col("vec_id"), col("label"),
        col("embedding"), col("vec_id") === 0L, 10, np, rr, mSub = m, ksub = ks))
      println(s"  pq M=$m ksub=$ks rerank=$rr: vs brute ${(p intersect brute).size}/10," +
        s" vs probe-exact ${(p intersect probeExact).size}/10")
    }
    spark.stop()
  }
}
