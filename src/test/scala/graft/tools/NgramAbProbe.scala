package graft.tools

import graft.core.Tables
import graft.catalog.Oracle.r4
import graft.llm.{NgramLm, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B (r17): eager-checkpoint the vocab-bounded bigram
  * model frame so NgramLm.score's three broadcast builds (model,
  * prefix, vocab) stop re-running the bigram explode kernel each —
  * QProfile r17 on llm_ccnet_buckets showed three concurrent
  * kernel-class broadcast-build jobs (8.3 + 5.5 + 3.3 s CPU for one
  * 8.3 s kernel). OLD arms are the live catalog entries; NEW arms
  * add `.localCheckpoint(true)` on the model.
  */
object NgramAbProbe {
  private def lmNew(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("text"))
    val bg = NgramLm.bigrams(docs, col("doc_id"), col("text"))
    val m = NgramLm.model(bg).localCheckpoint(true)
    val p = NgramLm.prefixCounts(m)
    NgramLm.score(bg, m, p)
      .select(col("id").as("doc_id"), col("n_bigrams"), col("q_sum"),
        r4(col("q_sum").cast("double") / col("n_bigrams").cast("double") / 1e6)
          .as("avg_logp"))
      .orderBy(col("doc_id"))
  }

  private def ccnetNew(s: SparkSession, d: String): DataFrame = {
    val docsFull = Tables.fanOut(Tables.documents(s, d))
    val docs = docsFull.select(col("doc_id"), col("text"))
    val bg = NgramLm.bigrams(docs, col("doc_id"), col("text"))
    val m = NgramLm.model(bg).localCheckpoint(true)
    val p = NgramLm.prefixCounts(m)
    val scored = NgramLm.score(bg, m, p)
      .select(col("id").as("doc_id"),
        floor(col("q_sum").cast("double") / col("n_bigrams").cast("double"))
          .cast("long").as("score_micro"))
    val withLang = scored
      .join(docsFull.select(col("doc_id"), col("lang")), "doc_id")
      .localCheckpoint(false)
    Sampling.quantileBuckets(withLang, "lang", "score_micro", 3)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        r4(sum(col("score_micro")).cast("double")
          / count(lit(1)).cast("double") / 1e6).as("avg_logp"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Pre-r17opt llm_stupid_backoff: nTot and c1 each re-scan the
    * (checkpointed) trigram frame instead of deriving from c3.
    */
  private def sboOld(s: SparkSession, d: String): DataFrame = {
    import graft.llm.{Lexical, TextOps}
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    val tri = Lexical.trigrams(docs, col("doc_id"), col("ws"))
      .localCheckpoint(false)
    val train = tri.filter(col("id") % 2 === 0)
      .select(col("u"), col("v"), col("w"))
    val eval = tri.filter(col("id") % 2 =!= 0)
    val nTot = train.agg(count(lit(1))).head().getLong(0)
    val c3 = train.groupBy(col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("c3"))
      .localCheckpoint(false)
    val c2uv = c3.groupBy(col("u"), col("v")).agg(sum(col("c3")).as("c2uv"))
    val c2vw = c3.groupBy(col("v"), col("w")).agg(sum(col("c3")).as("c2vw"))
    val c1 = train.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val a = lit(0.4d)
    val sc = coalesce(
      when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2uv").cast("double")),
      when(col("c2vw").isNotNull,
        a * col("c2vw").cast("double") / col("c1v").cast("double")),
      a * a * col("c1w").cast("double") / lit(nTot).cast("double"))
    eval
      .join(c3, Seq("u", "v", "w"), "left")
      .join(c2uv, Seq("u", "v"), "left")
      .join(c2vw.withColumnRenamed("w", "__w2")
        .withColumnRenamed("v", "__v2"),
        col("v") === col("__v2") && col("w") === col("__w2"), "left")
      .join(c1.select(col("w").as("__wv"), col("c1").as("c1v")),
        col("v") === col("__wv"), "left")
      .join(c1.select(col("w").as("__ww"), col("c1").as("c1w")),
        col("w") === col("__ww"), "left")
      .withColumn("__q",
        when(col("c1w").isNotNull,
          floor(log(sc) * lit(1000000.0d)).cast("long")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("__q").isNull, 1L).otherwise(0L)).as("n_oov"),
        coalesce(sum(col("__q")), lit(0L)).as("q_sum"))
      .select(col("id").as("doc_id"), col("n_tri"), col("n_oov"),
        col("q_sum"),
        r4(when(col("n_tri") > col("n_oov"),
          col("q_sum").cast("double")
            / (col("n_tri") - col("n_oov")).cast("double")
            / lit(1000000.0d))).as("avg_logs"))
      .orderBy(col("doc_id"))
  }

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
    val dir = sys.env.getOrElse("NAB_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("NAB_N", "7").toInt
    val arms: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "sbo_old" -> (sboOld _),
      "sbo_new" -> graft.SparkEntry.queries("llm_stupid_backoff"),
    )
    def once(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, fn) => once(fn) }
    val walls = arms.map { case (k, _) => k -> scala.collection.mutable.Buffer[Double]() }.toMap
    for (r <- 1 to n) arms.foreach { case (k, fn) =>
      val w = once(fn); walls(k) += w
      println(f"[nab] round $r $k%-10s $w%6.2f s")
    }
    arms.foreach { case (k, _) =>
      val b = walls(k).sorted
      println(f"[nab] MEDIAN $k%-10s ${b(b.size / 2)}%6.2f s over $n rounds")
    }
    s.stop()
  }
}
