package graft.tools

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B for the r18 ts_sliding_heavy_ss candidate: the
  * QProfile shows the candidate-merge folds (cand aggregate, lb3
  * window, final top-3 window) running as AQE-coalesced SINGLE tasks
  * of 0.4-0.5 s each on the near-uniform fixture (byte-small,
  * CPU-dense — the llm_allpairs_sim r17 class), while the summary
  * window and the recount explode burn 7-8.5 s CPU at full width.
  * Arm A = the live catalog shape; arm B = the same pipeline with
  * scale-adaptive numbered repartitions pinning those three folds to
  * defaultParallelism. Equality-gated, arms alternate per round.
  */
object SsTuneProbe {
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
    val m = 64

    def exh(): DataFrame = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy(col("h"), col("user_id")).agg(count(lit(1)).as("nh"))
      .repartition(s.sparkContext.defaultParallelism, col("user_id"))
      .localCheckpoint(false)

    // shared pipeline with optional pinning of the three merge folds
    def pipeline(exh: DataFrame, pin: Set[String]): DataFrame = {
      val p = s.sparkContext.defaultParallelism
      def pinIf(tag: String)(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
        if (pin(tag)) df.repartition(p, cols: _*) else df
      val wSpec = Window.partitionBy(col("h")).orderBy(col("nh").desc, col("user_id"))
      val ranked = (if (pin("nu")) {
        // arm: rank-only window (streaming frame, no unbounded count
        // buffering); "anything dropped?" = does row m+1 exist, read
        // off an orderless same-key window over the m+1-filtered rows
        exh.select(col("h"), col("user_id"), col("nh"),
            row_number().over(wSpec).as("srk"))
          .filter(col("srk") <= m + 1)
          .withColumn("mx", max(col("srk")).over(Window.partitionBy(col("h"))))
          .filter(col("srk") <= m)
          .withColumn("bound",
            when(col("srk") === m && col("mx") === m + 1, col("nh")).otherwise(lit(0L)))
          .select(col("h"), col("user_id"), col("nh"), col("srk"), col("bound"))
      } else {
        exh.select(col("h"), col("user_id"), col("nh"),
          row_number().over(wSpec).as("srk"),
          count(lit(1)).over(wSpec.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)).as("nu"))
        .filter(col("srk") <= m)
        .withColumn("bound",
          when(col("srk") === m && col("nu") > m, col("nh")).otherwise(lit(0L)))
        .select(col("h"), col("user_id"), col("nh"), col("srk"), col("bound"))
      }).localCheckpoint(false)
      val summ = ranked.select(col("h"), col("user_id"), col("nh"))
      val bounds = ranked.filter(col("srk") === m)
        .select(col("h"), col("bound"))
      val hours = ranked.select(col("h").as("h2")).distinct()
      val bWin = bounds
        .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"), col("bound"))
        .groupBy(col("h2")).agg(sum(col("bound")).as("btot"))
      val cand = pinIf("agg")(summ.join(bounds, Seq("h"), "left")
          .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"),
            col("user_id"), col("nh"), coalesce(col("bound"), lit(0L)).as("bound")),
          col("h2"), col("user_id"))
        .groupBy(col("h2"), col("user_id"))
        .agg(sum(col("nh")).as("lb"), sum(col("bound")).as("sb"))
      val wub = cand.join(bWin, Seq("h2"), "left").join(hours, "h2")
        .select(col("h2"), col("user_id"), col("lb"),
          (col("lb") + coalesce(col("btot"), lit(0L)) - col("sb")).as("ub"))
      val thr = pinIf("win")(wub, col("h2"))
        .withColumn("lrk", row_number().over(
          Window.partitionBy(col("h2")).orderBy(col("lb").desc, col("user_id"))))
        .filter(col("lrk") === 3).select(col("h2"), col("lb").as("lb3"))
      val kept = wub.join(thr, Seq("h2"), "left")
        .filter(col("lb3").isNull || col("ub") >= col("lb3"))
        .select(col("h2"), col("user_id"), col("lb"), col("ub"))
      val candUsers = kept.select(col("user_id")).distinct()
      val wex = pinIf("wex")(exh.join(broadcast(candUsers), Seq("user_id"))
          .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"),
            col("user_id"), col("nh")),
          col("h2"), col("user_id"))
        .groupBy(col("h2"), col("user_id")).agg(sum(col("nh")).as("n_exact"))
      val nEx = kept.join(wex, Seq("h2", "user_id"))
        .select(col("h2"), col("user_id"), col("lb"), col("ub"), col("n_exact"))
      pinIf("fin")(nEx, col("h2"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("h2")).orderBy(col("n_exact").desc, col("user_id"))))
        .filter(col("rk") <= 3)
        .select(col("h2").as("hour"), col("rk").cast("long").as("rk"),
          col("user_id"), col("n_exact"), col("lb"), col("ub"))
        .orderBy(col("hour"), col("rk"))
    }

    val pinSet = sys.env.getOrElse("AB_PIN", "win,fin").split(",").map(_.trim).filter(_.nonEmpty).toSet
    def runA(): DataFrame = pipeline(exh(), pin = Set.empty)
    def runB(): DataFrame = pipeline(exh(), pin = pinSet)

    val av = runA().collect().map(_.toString).toSeq
    val bv = runB().collect().map(_.toString).toSeq
    require(av == bv, s"arms disagree: ${av.size} vs ${bv.size} rows")
    println(s"[ss-ab] equality OK over ${av.size} rows")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val as = scala.collection.mutable.Buffer[Double]()
    val bs = scala.collection.mutable.Buffer[Double]()
    for (r <- 1 to rounds) {
      if (r % 2 == 1) { as += time(runA _); bs += time(runB _) }
      else { bs += time(runB _); as += time(runA _) }
      println(f"[ss-ab] round $r A=${as.last}%.3f B=${bs.last}%.3f")
    }
    def med(xs: Seq[Double]): Double = {
      val t = xs.drop(2); t.sorted.apply(t.size / 2)
    }
    println(f"[ss-ab] MEDIAN(post-cold) A=${med(as.toSeq)}%.3f B=${med(bs.toSeq)}%.3f")
    s.stop()
  }
}
