package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.llm.Sketches

/** Interleaved A/B for ts_sliding_distinct's exact audit leg:
  * (A) countDistinct(user) per trailing window (Spark plans one
  * distinct-aggregate whose exchange keys on the window alone);
  * (B) explicit pair distinct() then a plain count (the r7 hot-key
  * discipline: the exchange keys on the (window, user) pair and the
  * count map-side combines). Also A/Bs localCheckpointing the shared
  * (user, hour) distinct frame versus trusting ReuseExchange.
  */
object SdAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def ev() = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
      .distinct()

    def query(distinctPair: Boolean, ckpt: Boolean): DataFrame = {
      val e = if (ckpt) ev().localCheckpoint(false) else ev()
      val contrib = Sketches.hllRegisters(e, col("h"), col("user_id"))
        .select(explode(sequence(col("g"), col("g") + 23L)).as("g"),
          col("bucket"), col("m"))
        .groupBy(col("g"), col("bucket")).agg(max(col("m")).as("m"))
      val est = Sketches.hllFromRegisters(contrib)
      val exploded = e
        .select(explode(sequence(col("h"), col("h") + 23L)).as("g"), col("user_id"))
      val exact =
        if (distinctPair) exploded.distinct().groupBy(col("g"))
          .agg(count(lit(1)).as("n_exact"))
        else exploded.groupBy(col("g"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
      val hours = e.select(col("h").as("g")).distinct()
      est.join(exact, "g").join(hours, "g")
        .select(col("g").as("hour"), col("n_exact"), col("est"))
    }

    def run(dp: Boolean, ck: Boolean): Double = {
      val t0 = System.nanoTime()
      query(dp, ck).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(dp = false, ck = false); run(dp = true, ck = false)
    for ((dp, ck) <- Seq((false, false), (true, false), (false, true), (true, true))) {
      val ts = (0 until 4).map(_ => run(dp, ck))
      println(f"[sdab] distinctPair=$dp ckpt=$ck ${ts.map(t => f"$t%.2f").mkString(" ")} " +
        f"median=${ts.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
