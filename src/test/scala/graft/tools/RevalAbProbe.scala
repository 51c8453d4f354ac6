package graft.tools

import graft.core.Tables
import graft.llm.{TextOps, TfIdf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B for llm_retrieval_eval's query-term subtree: arm A
  * = the live shape (df ⋈ broadcast(top3) built as broadcast waves
  * inside the main action); arm B = collect the ≤3·|langs|-row qTerms
  * at build time (ONE collect whose independent df/langDf subtrees
  * AQE still overlaps) and embed (w, df, lang) as a literal inline
  * table, so the action's plan drops the vocabulary aggregation +
  * window subtree. The r16 probe rejected a driver top3 collect
  * (0.81x) — this arm differs by collecting the JOINED frame (one
  * action instead of an extra serialized job) — measured rather than
  * assumed. Equality-gated; arms alternate.
  */
object RevalAbProbe {
  import graft.catalog.Oracle.r4

  private val discountQ: Seq[Long] = Seq(
    1000000000L, 630929754L, 500000000L, 430676558L, 386852807L,
    356207187L, 333333333L, 315464877L, 301029996L, 289064826L)
  private val idcgPrefix: Seq[Long] = discountQ.scanLeft(0L)(_ + _).tail

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
    val rounds = sys.env.getOrElse("AB_ROUNDS", "8").toInt

    def build(literalQ: Boolean): DataFrame = {
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"), TextOps.words(col("text")).as("ws"))
      val tf = TfIdf.termFreq(docs.select(col("doc_id"), col("ws")),
        col("doc_id"), col("ws")).localCheckpoint(false)
      val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
      val totR = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
      val nDocs = totR.getLong(0)
      val sumdl = if (totR.isNullAt(1)) 0L else totR.getLong(1)
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val docLang = Tables.documents(s, dir)
        .select(col("doc_id").as("id"), col("lang"))
      val langDf = tf.select(col("id"), col("w")).join(docLang, "id")
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("ldf"))
      val top3 = langDf
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("ldf").desc, col("w"))))
        .filter(col("__rk") <= 3).select(col("lang"), col("w"))
      val qTerms =
        if (!literalQ) df.join(broadcast(top3), "w")
        else {
          val rows = df.join(broadcast(top3), "w")
            .select(col("w"), col("df"), col("lang")).collect()
          val arr = array(rows.toSeq.map(r =>
            struct(lit(r.getString(0)).as("w"), lit(r.getLong(1)).as("df"),
              lit(r.getString(2)).as("lang"))): _*)
          s.range(1).select(explode(arr).as("q")).select(col("q.*"))
        }
      val perTerm = tf.join(broadcast(qTerms), "w")
        .join(dl, "id")
        .withColumn("__qs", floor(
          log(lit(1.0d) + (lit(nDocs) - col("df") + lit(0.5d))
            / (col("df") + lit(0.5d)))
            * (col("tf") * (lit(1.2d) + lit(1.0d)))
            / (col("tf") + lit(1.2d) * (lit(1.0d) - lit(0.75d)
              + lit(0.75d) * col("dl")
              / (lit(sumdl).cast("double") / lit(nDocs).cast("double"))))
            * lit(1000000.0d)).cast("long"))
        .groupBy(col("lang"), col("id"))
        .agg(sum(col("__qs")).as("score"))
      val top10 = perTerm
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("score").desc, col("id"))))
        .filter(col("rank") <= 10)
        .join(docLang.select(col("id"), col("lang").as("__dlang")), "id")
        .withColumn("rel", (col("__dlang") === col("lang")).cast("long"))
      val relTotal = docLang.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rel_corpus"))
      val dArr = array(discountQ.map(lit): _*)
      val pArr = array(idcgPrefix.map(lit): _*)
      top10.groupBy(col("lang"))
        .agg(sum(col("rel")).as("__nrel"),
          min(when(col("rel") === 1L, col("rank"))).as("__firstrel"),
          sum(when(col("rel") === 1L,
            element_at(dArr, col("rank").cast("int"))).otherwise(0L)).as("__dcgq"))
        .join(broadcast(relTotal), "lang")
        .select(col("lang"), col("n_rel_corpus"),
          r4(col("__nrel").cast("double") / lit(10.0d)).as("p_at_10"),
          r4(when(col("__firstrel").isNotNull,
            lit(1.0d) / col("__firstrel").cast("double"))).as("mrr_at_10"),
          r4(col("__dcgq").cast("double")
            / element_at(pArr, least(col("n_rel_corpus"), lit(10L)).cast("int"))
              .cast("double")).as("ndcg_at_10"))
        .orderBy(col("lang"))
    }

    val av = build(false).collect().map(_.toString).toSeq
    val bv = build(true).collect().map(_.toString).toSeq
    require(av == bv, s"arms disagree:\nA=$av\nB=$bv")
    println(s"[reval-ab] equality OK over ${av.size} rows")

    def time(lq: Boolean): Double = {
      val t0 = System.nanoTime()
      build(lq).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val as = scala.collection.mutable.Buffer[Double]()
    val bs = scala.collection.mutable.Buffer[Double]()
    for (r <- 1 to rounds) {
      if (r % 2 == 1) { as += time(false); bs += time(true) }
      else { bs += time(true); as += time(false) }
      println(f"[reval-ab] round $r A=${as.last}%.3f B=${bs.last}%.3f d=${bs.last - as.last}%+.3f")
    }
    def med(xs: Seq[Double]): Double = { val t = xs.drop(2); t.sorted.apply(t.size / 2) }
    val deltas = as.indices.map(i => bs(i) - as(i)).drop(2).sorted
    println(f"[reval-ab] MEDIAN(post-cold) A=${med(as.toSeq)}%.3f B=${med(bs.toSeq)}%.3f pairedDelta=${deltas(deltas.size / 2)}%+.3f")
    s.stop()
  }
}
