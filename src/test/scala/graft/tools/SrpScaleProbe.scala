package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Probe: llm_embed_neardup scaling exponent vs SRP band geometry.
  * The r7 ScaleBench exponent (0.82) is candidate growth: random
  * (cosine≈0) pairs collide in an 8-bit band at 2⁻⁸, so bands·2⁻⁸ of
  * ALL pairs become candidates — an O(N²) term. Wider bands suppress
  * it exponentially; more bands restore the recall the widening
  * costs. This measures time + candidate-pair volume at sf0.1 and at
  * the 10x replica corpus for each geometry.
  * Run after ScaleBench has built /tmp/graft_sfx10:
  *   sbt "Test/runMain graft.tools.SrpScaleProbe"
  */
object SrpScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(dir: String) = {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val pert = base.filter(col("id") % 10 === 0)
        .select((col("id") + 10000000L).as("id"),
          transform(col("v"), x => x * 2.0d).as("v"))
      base.unionByName(pert)
    }
    val dirs = Seq("/root/testdata/sf0.1" -> "sf0.1", "/tmp/graft_sfx10" -> "10x")
    for ((nbits, bandsOf) <- Seq((64, 8), (128, 16), (192, 12), (256, 16))) {
      val times = dirs.map { case (dir, tag) =>
        val all = corpus(dir)
        // time the full detector (median of 3)
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Similarity.nearDupPairs(all, col("id"), col("v"), 0.9d,
              dim = 64, nbits = nbits, bandsOf = bandsOf)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
        // candidate volume = rows entering the exact verify
        val prepared = all.withColumn("n", lit(1))
        val cand = graft.llm.Dedup.lshCandidates(graft.llm.Dedup.lshBands(
          Similarity.srpSignature(all.select(col("id"), col("v")), nbits, 64),
          nbits, bandsOf)).count()
        println(s"nbits=$nbits bandsOf=$bandsOf $tag: t=${"%.2f".format(ts)}s candidates=$cand")
        ts
      }
      val expo = math.log(times(1) / times(0)) / math.log(10.0)
      println(s"nbits=$nbits bandsOf=$bandsOf exponent=${"%.2f".format(expo)}")
    }
    spark.stop()
  }
}
