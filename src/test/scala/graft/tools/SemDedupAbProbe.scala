package graft.tools

import graft.core.Tables
import graft.functions.VecExprs
import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the llm_semantic_dedup r9→r10 +35% bench regression (the
  * round-10 verdict's only real shared-catalog regression): same
  * session, interleaved rounds, the exact catalog query shape at
  * sf0.1.
  *
  *  - A = HEAD: [[Similarity.semanticDedup]] (projection assignment,
  *    centroids inlined as literals);
  *  - B = r9 shape: identical pipeline but the POST-FIT assignment is
  *    the old crossJoin+min_by regroup (the fit is shared HEAD code in
  *    both, so A−B isolates the post-fit assignment form);
  *  - fit = [[Similarity.kMeansFit]] alone, to bound how much of the
  *    total the shared Lloyd loop explains.
  *
  * Run: sbt "Test/runMain graft.tools.SemDedupAbProbe"
  */
object SemDedupAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def pts: DataFrame = {
      val base = Tables.embeddings(spark, d)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val copies = base.filter(col("id") % 10 === 0)
        .select((col("id") + 10000000L).as("id"), col("v"))
      base.unionByName(copies)
    }

    // r9-style post-fit assignment: crossJoin + map-side min_by regroup
    def assignJoin(p: DataFrame, cents: DataFrame): DataFrame =
      p.crossJoin(broadcast(cents))
        .groupBy(col("id"))
        .agg(min_by(struct(col("cell"), col("v")),
          struct(VecExprs.vecL2Sq(col("v"), col("centroid")), col("cell"))).as("w"))
        .select(col("id"), col("w.cell").as("cell"), col("w.v").as("v"))

    def dedupB(df: DataFrame): DataFrame = {
      val p = df.select(col("id").cast("long").as("id"), col("v"))
      val cents = Similarity.kMeansFit(p, col("id"), col("v"), 8, 5)
      val ranked = assignJoin(p, cents)
        .join(broadcast(cents), "cell")
        .select(col("id"), col("cell"), col("v"),
          Similarity.cosine(col("v"), col("centroid")).as("csim"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("cell")).orderBy(col("csim").desc, col("id"))))
      val a = ranked.select(col("cell"), col("id").as("id_a"),
        col("v").as("va"), col("rk").as("rk_a"))
      val b = ranked.select(col("cell").as("cell_b"), col("id").as("id_b"),
        col("v").as("vb"), col("rk").as("rk_b"))
      val dropped = a.join(b,
          col("cell") === col("cell_b") && col("rk_a") < col("rk_b"))
        .filter(Similarity.cosine(col("va"), col("vb")) >= 0.9d)
        .select(col("id_b").as("id")).distinct()
        .withColumn("dup", lit(true))
      ranked.join(dropped, Seq("id"), "left")
        .select(col("id"), col("cell"), col("dup").isNull.as("keep"))
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def sinkA(): Double = time {
      Similarity.semanticDedup(pts, col("id"), col("v"), 8, 5, 0.9d)
        .write.format("noop").mode("overwrite").save()
    }
    def sinkB(): Double = time {
      dedupB(pts).write.format("noop").mode("overwrite").save()
    }
    def fit(): Double = time {
      Similarity.kMeansFit(pts.select(col("id").cast("long").as("id"), col("v")),
        col("id"), col("v"), 8, 5).write.format("noop").mode("overwrite").save()
    }

    sinkA(); sinkB(); fit() // warmup
    val rounds = 5
    val as = Array.fill(rounds)(0.0); val bs = Array.fill(rounds)(0.0)
    val fs = Array.fill(rounds)(0.0)
    for (r <- 0 until rounds) { as(r) = sinkA(); bs(r) = sinkB(); fs(r) = fit() }
    def stats(xs: Array[Double]) =
      f"${xs.map(t => f"$t%.2f").mkString(" ")} med=${xs.sorted.apply(rounds / 2)}%.2f"
    println(s"[ab] A head-projection : ${stats(as)}")
    println(s"[ab] B r9-join-assign  : ${stats(bs)}")
    println(s"[ab] fit alone         : ${stats(fs)}")
    spark.stop()
  }
}
