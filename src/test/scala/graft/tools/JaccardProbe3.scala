package graft.tools

import graft.core.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the current charJaccard pipeline at sf0.1
  * to locate the 9.5 s: shingling, signature agg, candidate join,
  * hydration, full query.
  */
object JaccardProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val g = Tables.documents(spark, d)
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(TextOps.charNgrams(col("text"), 5)).as("gs"))
    val exploded = g.select(col("doc_id").as("id"), explode(col("gs")).as("s"))

    time("warmup g")(g)
    time("g (ngrams+distinct)")(g)
    time("exploded")(exploded)
    val sig = {
      val aggs = (0 until 24).map { s =>
        min(xxhash64(lit(s), col("s"))).cast("string").as(s"m$s") }
      exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    }
    time("signature (24 aggs)")(sig)
    val cand = Dedup.minHashCandidates(exploded, 24, 3)
    time("candidates")(cand)
    val a = g.select(col("doc_id").as("id_a"), col("lang").as("lang_a"),
      col("source").as("source_a"), col("gs").as("ga"))
    val b = g.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
      col("source").as("source_b"), col("gs").as("gb"))
    val full = cand.join(a, "id_a").join(b, "id_b")
      .filter(col("lang_a") === col("lang_b") && col("source_a") === col("source_b"))
      .withColumn("na", size(col("ga"))).withColumn("nb", size(col("gb")))
      .filter(greatest(col("na"), col("nb")) <= least(col("na"), col("nb")) * 2)
      .withColumn("ninter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("j", col("ninter") * lit(1.0d) / (col("na") + col("nb") - col("ninter")))
      .filter(col("j") >= 0.5d)
    time("full (hydrate+verify)")(full)
    time("full again")(full)
    spark.stop()
  }
}
