package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skewed-fixture A/B for the sliding heavy-hitter family (r14
  * verdict item 6): the catalog's events fixture is near-uniform
  * (SpaceSaving's worst case), so this probe synthesizes the regime
  * the bounded summaries are DESIGNED for — users ≫ m·24 with a hot
  * head — and measures the exact (user,hour)×24 fold against the
  * summary-driven candidate pipeline (both replicated from
  * TimeSeriesQueries.slidingHeavy*Q shapes), asserting identical
  * top-3 output.
  *
  * Fixture (deterministic, no RNG): 72 hours; 600 head users appear
  * every hour with count 50 + (user+h) % 7; 200_000 tail users
  * appear in exactly 2 hours with count 1 — so distinct (user,hour)
  * ≈ 443k, m·hours = 4.6k.
  */
object SkewSsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val hoursN = 72
    // exh: per (h, user) counts, synthesized directly (both pipelines
    // start from this aggregate, so the synthesis favors neither)
    val head = spark.range(600).select(col("id").as("user_id"))
      .crossJoin(spark.range(hoursN).select(col("id").as("h")))
      .select(col("h"), col("user_id"),
        (lit(50L) + (col("user_id") + col("h")) % 7).as("nh"))
    val tail = spark.range(200000).select((col("id") + 1000L).as("user_id"))
      .select(col("user_id"), (col("user_id") % hoursN).as("h1"),
        ((col("user_id") * 31L) % hoursN).as("h2x"))
      .select(col("user_id"), explode(array(col("h1"), col("h2x"))).as("h"))
      .distinct()
      .select(col("h"), col("user_id"), lit(1L).as("nh"))
    val exh0 = head.unionByName(tail)
      .groupBy(col("h"), col("user_id")).agg(sum(col("nh")).as("nh"))
      .localCheckpoint(true)

    def exactTop3(exh: DataFrame): DataFrame = {
      val win = exh
        .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"),
          col("user_id"), col("nh"))
        .groupBy(col("h2"), col("user_id")).agg(sum(col("nh")).as("n_exact"))
      val hours = exh.select(col("h").as("h2")).distinct()
      win.join(hours, "h2")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("h2"))
            .orderBy(col("n_exact").desc, col("user_id"))))
        .filter(col("rk") <= 3)
        .select(col("h2").as("hour"), col("rk"), col("user_id"), col("n_exact"))
    }

    def ssTop3(exh: DataFrame, m: Int): DataFrame = {
      val wSpec = Window.partitionBy(col("h")).orderBy(col("nh").desc, col("user_id"))
      val ranked = exh.select(col("h"), col("user_id"), col("nh"),
        row_number().over(wSpec).as("srk"),
        count(lit(1)).over(wSpec.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("nu"))
        .filter(col("srk") <= m)
        .withColumn("bound",
          when(col("srk") === m && col("nu") > m, col("nh")).otherwise(lit(0L)))
        .localCheckpoint(false)
      val summ = ranked.select(col("h"), col("user_id"), col("nh"))
      val bounds = ranked.filter(col("srk") === m).select(col("h"), col("bound"))
      val hours = ranked.select(col("h").as("h2")).distinct()
      val bWin = bounds
        .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"), col("bound"))
        .groupBy(col("h2")).agg(sum(col("bound")).as("btot"))
      val cand = summ.join(bounds, Seq("h"), "left")
        .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"),
          col("user_id"), col("nh"), coalesce(col("bound"), lit(0L)).as("bound"))
        .groupBy(col("h2"), col("user_id"))
        .agg(sum(col("nh")).as("lb"), sum(col("bound")).as("sb"))
      val wub = cand.join(bWin, Seq("h2"), "left").join(hours, "h2")
        .select(col("h2"), col("user_id"), col("lb"),
          (col("lb") + coalesce(col("btot"), lit(0L)) - col("sb")).as("ub"))
      val thr = wub
        .withColumn("lrk", row_number().over(
          Window.partitionBy(col("h2")).orderBy(col("lb").desc, col("user_id"))))
        .filter(col("lrk") === 3).select(col("h2"), col("lb").as("lb3"))
      val kept = wub.join(thr, Seq("h2"), "left")
        .filter(col("lb3").isNull || col("ub") >= col("lb3"))
        .select(col("h2"), col("user_id"))
      val candUsers = kept.select(col("user_id")).distinct()
      val wex = exh.join(broadcast(candUsers), Seq("user_id"))
        .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"),
          col("user_id"), col("nh"))
        .groupBy(col("h2"), col("user_id")).agg(sum(col("nh")).as("n_exact"))
      kept.join(wex, Seq("h2", "user_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("h2")).orderBy(col("n_exact").desc, col("user_id"))))
        .filter(col("rk") <= 3)
        .select(col("h2").as("hour"), col("rk"), col("user_id"), col("n_exact"))
    }

    // correctness: identical top-3 under the skew
    val a = exactTop3(exh0).orderBy("hour", "rk").collect().toSeq
    val b = ssTop3(exh0, 64).orderBy("hour", "rk").collect().toSeq
    require(a == b, s"top-3 mismatch: exact ${a.take(3)} vs ss ${b.take(3)}")
    println(s"[skew] top-3 identical (${a.size} rows)")

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val (te, ts) = (collection.mutable.Buffer[Double](), collection.mutable.Buffer[Double]())
    (0 until 5).foreach { r =>
      var t0 = System.nanoTime()
      exactTop3(exh0).write.format("noop").mode("overwrite").save()
      te += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      ssTop3(exh0, 64).write.format("noop").mode("overwrite").save()
      ts += (System.nanoTime() - t0) / 1e9
      println(f"[skew] round $r exact ${te.last}%6.2f s  ss ${ts.last}%6.2f s")
    }
    println(f"[skew] MEDIANS (5 interleaved): exact ${med(te.toSeq)}%6.2f s  ss ${med(ts.toSeq)}%6.2f s  (200k users, m*24 = 1536)")
    spark.stop()
  }
}
