package graft.tools

import graft.llm.Dedup
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-aggregation charJaccard: one groupBy(doc) computes gram set +
  * 24 minhashes; bands, candidate join and hydration all reuse that one
  * exchange. Times it and checks ReusedExchange fires.
  */
object JaccardProbe5 {
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
    val grams = docs
      .select(col("doc_id").as("id"), col("lang"), col("source"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("i"), col("text"))
      .select(col("id"), col("lang"), col("source"),
        col("text").substr(col("i"), lit(5)).as("s"))
    val sigAggs = (0 until 24).map { s =>
      min(xxhash64(lit(s), col("s"))).cast("string").as(s"m$s") }
    val docsig = grams.groupBy(col("id"), col("lang"), col("source"))
      .agg(collect_set(col("s")).as("gs"), sigAggs: _*)

    time("warmup")(docsig)
    time("docsig (one agg)")(docsig)

    val cand = Dedup.lshCandidates(Dedup.lshBands(docsig, 24, 3))
    time("cand")(cand)

    val a = docsig.select(col("id").as("id_a"), col("lang").as("lang_a"),
      col("source").as("source_a"), col("gs").as("ga"))
    val b = docsig.select(col("id").as("id_b"), col("lang").as("lang_b"),
      col("source").as("source_b"), col("gs").as("gb"))
    val full = cand.join(a, "id_a").join(b, "id_b")
      .filter(col("lang_a") === col("lang_b") && col("source_a") === col("source_b"))
      .withColumn("na", size(col("ga"))).withColumn("nb", size(col("gb")))
      .filter(greatest(col("na"), col("nb")) <= least(col("na"), col("nb")) * 2)
      .withColumn("ninter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("j", col("ninter") * lit(1.0d) / (col("na") + col("nb") - col("ninter")))
      .filter(col("j") >= 0.5d)
      .select(col("id_a"), col("id_b"), bround(col("j"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
    time("full v3")(full)
    time("full v3 again")(full)
    val plan = full.queryExecution.executedPlan.toString
    println("[probe] ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(plan).size)
    println("[probe] result: " + full.collect().toList)
    spark.stop()
  }
}
