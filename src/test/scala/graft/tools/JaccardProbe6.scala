package graft.tools

import graft.llm.Dedup
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 charJaccard scale probe: WHERE does the 10x time go —
  * band-collision candidate growth or intersect cost — and what do
  * the two candidate levers buy:
  *   (a) bandsOf 3 -> 4 (6 bands of 4: J=0.3 junk passes a band at
  *       0.008 vs 0.027 — ~4x fewer junk candidates; recall at
  *       J>=0.85 drops 0.9995 -> 0.988),
  *   (b) a sketch prefilter BEFORE hydration: estimate J from the 24
  *       minhash components already in hand and drop candidates whose
  *       estimate can't plausibly reach 0.5 (est >= 8/24) — exactness
  *       note: est is 24 Bernoulli(J) trials, so a TRUE J=0.5 pair
  *       fails est>=1/3 with prob ~5% — NOT hash-safe in general; the
  *       probe measures what it WOULD buy to decide if the recall
  *       math is worth documenting vs keeping the exact path.
  * Runs at sf0.1 and at the ScaleBench 10x replica corpus.
  */
object JaccardProbe6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    def run(tag: String, docsRaw: DataFrame): Unit = {
      val docs = Tables.fanOut(docsRaw).filter(length(col("text")) >= 5)
      val grams = docs.select(col("doc_id").as("id"), col("lang"), col("source"),
        explode(graft.functions.CharNgramSet.charNgramSet(col("text"), 5)).as("s"))
      val sigAggs = (0 until 24).map { k =>
        min(xxhash64(lit(k), col("s"))).cast("string").as(s"m$k") }
      val docsig = grams.groupBy(col("id"), col("lang"), col("source"))
        .agg(collect_list(col("s")).as("gs"), sigAggs: _*)
        .localCheckpoint() // isolate stage costs from the shared agg

      time(s"$tag docsig materialize")(docsig.count())

      for (bandsOf <- Seq(3, 4)) {
        val cand = Dedup.lshCandidates(
          Dedup.lshBands(docsig, 24, bandsOf, Seq(col("lang"), col("source"))))
          .localCheckpoint()
        val nCand = time(s"$tag bandsOf=$bandsOf candidates")(cand.count())
        println(s"[probe] $tag bandsOf=$bandsOf candidate pairs: $nCand")

        // sketch prefilter: fraction of equal minhash components
        val sa = docsig.select((col("id").as("id_a") +:
          (0 until 24).map(k => col(s"m$k").as(s"a$k"))): _*)
        val sb = docsig.select((col("id").as("id_b") +:
          (0 until 24).map(k => col(s"m$k").as(s"b$k"))): _*)
        val est = (0 until 24).map(k =>
          when(col(s"a$k") === col(s"b$k"), 1).otherwise(0)).reduce(_ + _)
        val kept = cand.join(sa, "id_a").join(sb, "id_b")
          .withColumn("est", est).filter(col("est") >= 8)
          .select("id_a", "id_b").localCheckpoint()
        val nKept = time(s"$tag bandsOf=$bandsOf sketch-prefilter")(kept.count())
        println(s"[probe] $tag bandsOf=$bandsOf kept after est>=8/24: $nKept")

        def verify(c: DataFrame, label: String): Unit = {
          val a = docsig.select(col("id").as("id_a"), col("gs").as("ga"))
          val b = docsig.select(col("id").as("id_b"), col("gs").as("gb"))
          val out = c.join(a, "id_a").join(b, "id_b")
            .withColumn("na", size(col("ga"))).withColumn("nb", size(col("gb")))
            .filter(greatest(col("na"), col("nb")) <= least(col("na"), col("nb")) * 2)
            .withColumn("ninter", size(array_intersect(col("ga"), col("gb"))))
            .withColumn("j", col("ninter") * lit(1.0d) /
              (col("na") + col("nb") - col("ninter")))
            .filter(col("j") >= 0.5d)
          val n = time(s"$tag bandsOf=$bandsOf verify($label)")(out.count())
          println(s"[probe] $tag bandsOf=$bandsOf verified($label): $n")
        }
        verify(cand, "all-cand")
        verify(kept, "prefiltered")
      }
    }

    val d = "/root/testdata/sf0.1"
    run("1x ", Tables.documents(spark, d))

    val big = ScaleBench.replicateDocs(Tables.documents(spark, d), 10)
      .localCheckpoint()
    println(s"[probe] 10x corpus rows: ${big.count()}")
    run("10x", big)
    spark.stop()
  }
}
