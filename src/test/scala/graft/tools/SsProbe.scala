package graft.tools
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object SsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-34s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val m = 64
    val dir = "/root/testdata/sf0.1"
    (0 until 2).foreach { round =>
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
      val exh = ev.groupBy(col("h"), col("user_id")).agg(count(lit(1)).as("nh"))
      val wSpec = Window.partitionBy(col("h")).orderBy(col("nh").desc, col("user_id"))
      val ranked0 = exh.select(col("h"), col("user_id"), col("nh"),
        row_number().over(wSpec).as("srk"),
        count(lit(1)).over(wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("nu"))
        .filter(col("srk") <= m)
        .withColumn("bound", when(col("srk") === m && col("nu") > m, col("nh")).otherwise(lit(0L)))
      val ranked = time(s"[$round] ranked ckpt")(ranked0.localCheckpoint(true))
      val summ = ranked.select(col("h"), col("user_id"), col("nh"))
      val bounds = ranked.filter(col("srk") === m).select(col("h"), col("bound"))
      val hours = ranked.select(col("h").as("h2")).distinct()
      val bWin = bounds.select(explode(sequence(col("h"), col("h") + 23L)).as("h2"), col("bound"))
        .groupBy(col("h2")).agg(sum(col("bound")).as("btot"))
      val cand = summ.join(bounds, Seq("h"), "left")
        .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"),
          col("user_id"), col("nh"), coalesce(col("bound"), lit(0L)).as("bound"))
        .groupBy(col("h2"), col("user_id"))
        .agg(sum(col("nh")).as("lb"), sum(col("bound")).as("sb"))
      val wub = cand.join(bWin, Seq("h2"), "left").join(hours, "h2")
        .select(col("h2"), col("user_id"), col("lb"),
          (col("lb") + coalesce(col("btot"), lit(0L)) - col("sb")).as("ub"))
      val wubC = time(s"[$round] cand+wub ckpt")(wub.localCheckpoint(true))
      val thr = wubC.withColumn("lrk", row_number().over(
          Window.partitionBy(col("h2")).orderBy(col("lb").desc, col("user_id"))))
        .filter(col("lrk") === 3).select(col("h2"), col("lb").as("lb3"))
      val kept = wubC.join(thr, Seq("h2"), "left")
        .filter(col("lb3").isNull || col("ub") >= col("lb3"))
        .select(col("h2"), col("user_id"), col("lb"), col("ub"))
      val keptC = time(s"[$round] thr+kept ckpt")(kept.localCheckpoint(true))
      println(s"[probe] [$round] kept rows = ${keptC.count()}")
      val candUsers = keptC.select(col("user_id")).distinct()
      val wex = exh.join(broadcast(candUsers), Seq("user_id"))
        .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"), col("user_id"), col("nh"))
        .groupBy(col("h2"), col("user_id")).agg(sum(col("nh")).as("n_exact"))
      val nEx = keptC.join(wex, Seq("h2", "user_id"))
        .select(col("h2"), col("user_id"), col("lb"), col("ub"), col("n_exact"))
      val out = nEx.withColumn("rk", row_number().over(
          Window.partitionBy(col("h2")).orderBy(col("n_exact").desc, col("user_id"))))
        .filter(col("rk") <= 3)
        .select(col("h2").as("hour"), col("rk").cast("long").as("rk"),
          col("user_id"), col("n_exact"), col("lb"), col("ub"))
        .orderBy(col("hour"), col("rk"))
      time(s"[$round] wex+final")(out.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
