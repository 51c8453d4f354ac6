package graft.tools

import graft.core.Tables
import graft.llm.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Times char-jaccard implementation variants at sf0.1. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val g = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(TextOps.charNgrams(col("text"), 5)).as("gs"))

    def pairs(base: DataFrame, bcast: Boolean): DataFrame = {
      val a = base.select(col("lang"), col("source"), col("doc_id").as("id_a"), col("gs").as("ga"))
      val b0 = base.select(col("lang"), col("source"), col("doc_id").as("id_b"), col("gs").as("gb"))
      val b = if (bcast) broadcast(b0) else b0
      a.join(b, Seq("lang", "source")).filter(col("id_a") < col("id_b"))
        .withColumn("na", size(col("ga"))).withColumn("nb", size(col("gb")))
        .filter(greatest(col("na"), col("nb")) <= least(col("na"), col("nb")) * 2)
        .withColumn("ninter", size(array_intersect(col("ga"), col("gb"))))
        .withColumn("j", col("ninter") * lit(1.0d) / (col("na") + col("nb") - col("ninter")))
        .filter(col("j") >= 0.5d)
    }

    time("ngrams only")(g)
    val cached = g.cache(); cached.count()
    time("smj, precomputed")(pairs(cached, bcast = false))
    time("bhj, precomputed")(pairs(cached, bcast = true))
    time("smj, inline")(pairs(g, bcast = false))
    time("bhj, inline")(pairs(g, bcast = true))
    // exploded-join variant
    val e = cached.select(col("lang"), col("source"), col("doc_id"), explode(col("gs")).as("s"))
    val sizes = cached.select(col("doc_id"), size(col("gs")).as("n"))
    time("exploded join") {
      val inter = e.select(col("lang"), col("source"), col("doc_id").as("id_a"), col("s"))
        .join(e.select(col("lang"), col("source"), col("doc_id").as("id_b"), col("s")),
          Seq("lang", "source", "s"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ninter"))
      inter.join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .withColumn("j", col("ninter") * lit(1.0d) / (col("na") + col("nb") - col("ninter")))
        .filter(col("j") >= 0.5d)
    }
    spark.stop()
  }
}
