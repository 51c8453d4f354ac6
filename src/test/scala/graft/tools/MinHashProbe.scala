package graft.tools

import graft.core.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B bench: fused (array-carrying) vs factored (join-count)
  * minHashNearDups, each with and without a fanOut of the scan —
  * 5 interleaved rounds, per-variant median, sf0.1.
  */
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def base(fan: Boolean): DataFrame = {
      val raw = Tables.documents(spark, sfDir)
      val docs = (if (fan) Tables.fanOut(raw) else raw)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      val pert = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w"))
      docs.unionByName(pert).withColumn("sh", TextOps.wordNgrams(col("w"), 3))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "fused" -> (() =>
        Dedup.minHashNearDups(base(fan = false), col("doc_id"), col("sh"), 8, 2, 0.5d)),
      "fused_fan" -> (() =>
        Dedup.minHashNearDups(base(fan = true), col("doc_id"), col("sh"), 8, 2, 0.5d)),
      "factored" -> (() =>
        Dedup.minHashNearDupsFactored(base(fan = false), col("doc_id"), col("sh"), 8, 2, 0.5d)),
      "factored_fan" -> (() =>
        Dedup.minHashNearDupsFactored(base(fan = true), col("doc_id"), col("sh"), 8, 2, 0.5d)))

    // correctness cross-check once before timing
    val ref = variants.head._2().orderBy("id_a", "id_b").collect().toSeq
    for ((n, f) <- variants.tail) {
      val got = f().orderBy("id_a", "id_b").collect().toSeq
      require(got == ref, s"$n disagrees with fused: ${got.size} vs ${ref.size}")
    }

    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to 5; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      samples.updateWith(name)(s => Some((System.nanoTime() - t0) / 1e9 :: s.getOrElse(Nil)))
    }
    for ((name, xs) <- samples.toSeq.sortBy(_._1)) {
      val s = xs.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      println(f"[minhash-ab] $name%-14s median=$med%6.3f s  all=${s.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
