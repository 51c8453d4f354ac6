package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of llm_rrf_fusion's fusion tail: OLD arm = the
  * pre-r18 frame fold (union + aggregate + global sort over the two
  * ranked lists, copied verbatim), NEW arm = Retrieval.rrf (r18:
  * concurrent list collects + driver fusion). Both arms run the FULL
  * catalog query shape (tf kernel → bm25 top-30 ⊕ brute-force top-30
  * → fusion → noop) so the wall prices what the bench prices.
  * Value equality is asserted before timing. Arms alternate per
  * round; report medians of the post-JIT rounds.
  */
object RrfAbProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("AB_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("AB_ROUNDS", "10").toInt
    import graft.core.Tables
    import graft.llm.{Retrieval, Similarity, TextOps, TfIdf}

    def lists(): (DataFrame, DataFrame) = {
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      val tf = TfIdf.termFreq(docs, col("doc_id"), col("ws")).localCheckpoint(false)
      val q = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("w")).limit(5).select(col("w"), col("df"))
      val textList = TfIdf.bm25(tf, q, precomputedDf = true)
        .orderBy(col("score").desc, col("id")).limit(30)
      val vecList = Similarity.bruteForceTopK(Tables.embeddings(s, dir),
        col("vec_id"), col("embedding"), col("vec_id") === 0L, 30)
      (Retrieval.ranked(textList, col("id"), col("score")),
        Retrieval.ranked(vecList, col("id"), col("sim")))
    }

    // OLD fusion shape, copied verbatim from pre-r18 Retrieval.rrf
    def oldRrf(ls: Seq[DataFrame], topK: Int, k: Int = 60): DataFrame =
      ls.map(_.select(col("id"),
          (lit(1.0d) / (lit(k.toDouble) + col("rank").cast("double")))
            .as("contrib")))
        .reduce(_ unionByName _)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrf"))
        .orderBy(col("rrf").desc, col("id").asc)
        .limit(topK)

    def finish(f: DataFrame): DataFrame = {
      import graft.catalog.Oracle.r4
      f.select(col("id").as("doc_id"), col("n_lists"), r4(col("rrf")).as("rrf"))
        .orderBy(r4(col("rrf")).desc, col("doc_id"))
    }

    def runOld(): DataFrame = { val (a, b) = lists(); finish(oldRrf(Seq(a, b), 10)) }
    def runNew(): DataFrame = { val (a, b) = lists(); finish(Retrieval.rrf(Seq(a, b), 10)) }

    // value equality gate
    val ov = runOld().collect().map(_.toString).toSeq
    val nv = runNew().collect().map(_.toString).toSeq
    require(ov == nv, s"arms disagree:\nold=$ov\nnew=$nv")
    println(s"[rrf-ab] equality OK over ${ov.size} rows")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val olds = scala.collection.mutable.Buffer[Double]()
    val news = scala.collection.mutable.Buffer[Double]()
    for (r <- 1 to rounds) {
      if (r % 2 == 1) { olds += time(runOld _); news += time(runNew _) }
      else { news += time(runNew _); olds += time(runOld _) }
      println(f"[rrf-ab] round $r old=${olds.last}%.3f new=${news.last}%.3f")
    }
    def med(xs: Seq[Double]): Double = {
      val t = xs.drop(2) // drop the two chronologically-cold rounds
      t.sorted.apply(t.size / 2)
    }
    println(f"[rrf-ab] MEDIAN(post-cold) old=${med(olds.toSeq)}%.3f new=${med(news.toSeq)}%.3f n=$rounds")
    s.stop()
  }
}
