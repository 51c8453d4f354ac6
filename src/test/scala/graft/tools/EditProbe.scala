package graft.tools

import graft.core.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage ablation for `llm_edit_neardup` (sf0.1): times (1) the LSH
  * candidate pairs alone, (2) candidates + text hydration joins,
  * (3) the full pipeline with the banded Levenshtein verify, so the
  * expensive stage is measured, not guessed.
  */
object EditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("edit-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base(): DataFrame = {
      val docs = Tables.fanOut(Tables.documents(spark, sfDir))
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val pert = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 25, lit(0))).as("text"))
      docs.unionByName(pert)
        .withColumn("sh", TextOps.wordNgrams(TextOps.words(col("text")), 3))
        .select(col("doc_id").as("id"), col("text").as("t"), col("sh"))
    }

    def time(tag: String)(df: => DataFrame): Unit = {
      val rounds = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (n, dt)
      }
      val med = rounds.map(_._2).sorted.apply(1)
      println(f"$tag%-28s rows=${rounds.head._1}%8d median=${med}%6.2f s")
    }

    def sig(b: DataFrame): DataFrame = {
      val exploded = b.select(col("id"), explode(array_distinct(col("sh"))).as("s"))
      val aggs = (0 until 8).map { sd =>
        min(md5(concat(lit(sd.toString), lit("|"), col("s")))).as(s"m$sd")
      }
      exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    }

    time("1-candidates") {
      Dedup.lshCandidates(Dedup.lshBands(sig(base()), 8, 2))
    }
    time("2-hydrated") {
      val b = base()
      val cand = Dedup.lshCandidates(Dedup.lshBands(sig(b), 8, 2))
      cand.join(b.select(col("id").as("id_a"), col("t").as("ta")), "id_a")
        .join(b.select(col("id").as("id_b"), col("t").as("tb")), "id_b")
    }
    time("3-full") {
      val b = base()
      Dedup.editNearDups(b, col("id"), col("t"), col("sh"), 8, 2, 0.75d)
    }
    spark.stop()
  }
}
