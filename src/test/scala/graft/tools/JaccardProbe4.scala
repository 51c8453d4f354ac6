package graft.tools

import graft.core.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate rewrite of charJaccard: codegen shingle explode (no HOF),
  * combined sig+size agg, candidate-only hydration. Checks time AND
  * that the result matches the current implementation.
  */
object JaccardProbe4 {
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

    val docs = Tables.documents(spark, d).filter(length(col("text")) >= 5)

    // codegen path: explode offsets, substr, distinct — no HOF, no array
    val exploded = docs
      .select(col("doc_id").as("id"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("i"),
        col("text"))
      .select(col("id"), col("text").substr(col("i"), lit(5)).as("s"))
      .distinct()
    time("warmup")(exploded)
    time("exploded v2 (codegen)")(exploded)

    val cand = Dedup.minHashCandidates(exploded, 24, 3)
    time("candidates v2")(cand)

    // hydrate shingle arrays ONLY for candidate docs
    val candIds = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b"))).distinct()
    val gc = docs.join(candIds, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(TextOps.charNgrams(col("text"), 5)).as("gs"))
    val a = gc.select(col("doc_id").as("id_a"), col("lang").as("lang_a"),
      col("source").as("source_a"), col("gs").as("ga"))
    val b = gc.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
      col("source").as("source_b"), col("gs").as("gb"))
    val full = cand.join(a, "id_a").join(b, "id_b")
      .filter(col("lang_a") === col("lang_b") && col("source_a") === col("source_b"))
      .withColumn("na", size(col("ga"))).withColumn("nb", size(col("gb")))
      .filter(greatest(col("na"), col("nb")) <= least(col("na"), col("nb")) * 2)
      .withColumn("ninter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("j", col("ninter") * lit(1.0d) / (col("na") + col("nb") - col("ninter")))
      .filter(col("j") >= 0.5d)
      .select(col("id_a"), col("id_b"), bround(col("j"), 4).as("jaccard"))
    time("full v2")(full)
    time("full v2 again")(full)
    println("[probe] result: " + full.collect().toList.sortBy(_.getLong(0)))
    spark.stop()
  }
}
