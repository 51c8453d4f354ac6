package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.llm.{CorpusStats, TextOps}

/** Same-session interleaved A/B for llm_log_odds (r13 verdict item 2):
  * (A) the current CorpusStats.logOdds — ysw aggregate feeding a yw
  * aggregate join, a broadcast ns aggregate, and a crossJoined global
  * total; (B) a variant that localCheckpoints ysw once and resolves
  * the MODEL-SIZED ns/ntot (|groups| rows — already assumed
  * broadcastable) on the driver as literals, removing two broadcast
  * subtrees and the crossJoin from the plan.
  */
object LogOddsAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def current(): DataFrame =
      CorpusStats.logOdds(Tables.fanOut(Tables.documents(spark, dir)),
        col("source"), col("text"), minCount = 5L, k = 5)

    def variant(): DataFrame = {
      val docs = Tables.fanOut(Tables.documents(spark, dir))
      val ysw = docs.select(col("source").as("g"),
          explode(CorpusStats.alphaTokens(col("text"))).as("w"))
        .groupBy(col("g"), col("w")).agg(count(lit(1)).as("ysw"))
        .localCheckpoint(false)
      val nsRows = ysw.groupBy(col("g")).agg(sum(col("ysw")).as("ns")).collect()
      val nsMap = nsRows.map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = nsMap.values.sum
      val yw = ysw.groupBy(col("w")).agg(sum(col("ysw")).as("yw"))
      val nsC = element_at(typedLit(nsMap), col("g"))
      val nC = lit(n)
      val yrw = (col("yw") - col("ysw")).cast("double")
      val nr = (nC - nsC).cast("double")
      val delta =
        log((col("ysw") + col("yw")).cast("double") /
            (nsC + nC - col("ysw") - col("yw")).cast("double")) -
        log((yrw + col("yw")) / (nr + nC - yrw - col("yw")))
      val variance = lit(1.0d) / (col("ysw") + col("yw")).cast("double") +
        lit(1.0d) / (yrw + col("yw"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("z").desc, col("w").asc)
      ysw.filter(col("ysw") >= 5L)
        .join(yw, Seq("w"))
        .select(col("g"), col("w"), col("ysw"), (delta / sqrt(variance)).as("z"))
        .withColumn("rank", row_number().over(win))
        .filter(col("rank") <= 5).drop("rank")
    }

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // equality first (values, sorted)
    val a = current().orderBy(col("g"), col("z").desc, col("w")).collect()
    val b = variant().orderBy(col("g"), col("z").desc, col("w")).collect()
    assert(a.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      math.round(r.getDouble(3) * 1e4))).toSeq ==
      b.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e4))).toSeq,
      "variant diverges from current")
    run(() => current()); run(() => variant()) // warm
    val ta = (0 until 5).map(_ => run(() => current()))
    val tb = (0 until 5).map(_ => run(() => variant()))
    println(f"[loab] current: ${ta.map(t => f"$t%.2f").mkString(" ")} median=${ta.sorted.apply(2)}%.2f")
    println(f"[loab] literal: ${tb.map(t => f"$t%.2f").mkString(" ")} median=${tb.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
