package graft.tools

import graft.core.Tables
import graft.catalog.{Oracle, TimeSeriesQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B of the r17 sliding-family restructure (user-keyed
  * single exchange + checkpoint) vs the r16 shapes, alternating arms
  * within each round in one session — the only fair instrument on a
  * box whose sustained-load throttling moves the canary 2x between
  * back-to-back runs. OLD arms are verbatim copies of the pre-r17opt
  * builders (git a1c03d4); NEW arms are the live catalog entries.
  * SAB_N rounds (default 5), warmup pass untimed.
  */
object SlidingAbProbe {
  import Oracle.r4

  private def oldDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.Sketches
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
      .distinct()
    val contrib = Sketches.hllRegisters(ev, col("h"), col("user_id"))
      .select(explode(sequence(col("g"), col("g") + 23L)).as("g"),
        col("bucket"), col("m"))
      .groupBy(col("g"), col("bucket")).agg(max(col("m")).as("m"))
    val est = Sketches.hllFromRegisters(contrib)
    val exact = ev
      .select(explode(sequence(col("h"), col("h") + 23L)).as("g"), col("user_id"))
      .groupBy(col("g")).agg(countDistinct(col("user_id")).as("n_exact"))
    val hours = ev.select(col("h").as("g")).distinct()
    est.join(exact, "g").join(hours, "g")
      .select(col("g").as("hour"), col("n_exact"), r4(col("est")).as("est"),
        r4(abs(col("est") - col("n_exact")) / col("n_exact").cast("double"))
          .as("rel_err"))
      .orderBy(col("hour"))
  }

  private def oldHeavy(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.Sketches
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
    val cmHourly = Sketches.countMin(ev, col("h"), col("user_id"))
    val exact = ev.groupBy(col("h"), col("user_id")).agg(count(lit(1)).as("nh"))
      .select(explode(sequence(col("h"), col("h") + 23L)).as("h2"),
        col("user_id"), col("nh"))
      .groupBy(col("h2"), col("user_id")).agg(sum(col("nh")).as("n_exact"))
    val hours = ev.select(col("h").as("h2")).distinct()
    val top = exact.join(hours, "h2")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("h2"))
          .orderBy(col("n_exact").desc, col("user_id"))))
      .filter(col("rk") <= 3)
      .localCheckpoint(false)
    val needed = top
      .select(col("h2"), col("user_id"),
        explode(Sketches.cmProbes(col("user_id"))).as("rb"))
      .select(col("h2"), col("user_id"), col("rb.r").as("r"), col("rb.b").as("b"))
    val srcKeys = needed.select(col("h2"), col("r"), col("b")).distinct()
      .select(col("h2"), col("r"), col("b"),
        explode(sequence(col("h2") - 23L, col("h2"))).as("g"))
    val winCells = cmHourly.join(broadcast(srcKeys), Seq("g", "r", "b"))
      .groupBy(col("h2"), col("r"), col("b")).agg(sum(col("c")).as("c"))
    val est = needed.join(winCells, Seq("h2", "r", "b"), "left")
      .groupBy(col("h2"), col("user_id"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
    top.join(est, Seq("h2", "user_id"))
      .select(col("h2").as("hour"), col("rk").cast("long").as("rk"),
        col("user_id"), col("n_exact"), col("est").as("n_est"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("hour"), col("rk"))
  }

  private def oldSs(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
    val exh = ev.groupBy(col("h"), col("user_id")).agg(count(lit(1)).as("nh"))
    TimeSeriesQueries.slidingHeavySsOver(exh, m = 64)
  }

  private def oldSkew(s: SparkSession, dir: String): DataFrame =
    TimeSeriesQueries.slidingHeavySsOver(TimeSeriesQueries.skewExh(s, dir), m = 64)

  private def oldSkewExact(s: SparkSession, dir: String): DataFrame = {
    val exh = TimeSeriesQueries.skewExh(s, dir)
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
      .select(col("h2").as("hour"), col("rk").cast("long").as("rk"),
        col("user_id"), col("n_exact"))
      .orderBy(col("hour"), col("rk"))
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
    val dir = sys.env.getOrElse("SAB_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SAB_N", "5").toInt
    val arms: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "distinct_old" -> (oldDistinct _),
      "distinct_new" -> graft.SparkEntry.queries("ts_sliding_distinct"),
      "heavy_old" -> (oldHeavy _),
      "heavy_new" -> graft.SparkEntry.queries("ts_sliding_heavy"),
      "ss_old" -> (oldSs _),
      "ss_new" -> graft.SparkEntry.queries("ts_sliding_heavy_ss"),
      "skew_old" -> (oldSkew _),
      "skew_new" -> graft.SparkEntry.queries("ts_sliding_heavy_skew"),
      "skewexact_old" -> (oldSkewExact _),
      "skewexact_new" -> graft.SparkEntry.queries("ts_sliding_heavy_skew_exact"),
    )
    def once(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, fn) => once(fn) } // warmup
    val walls = arms.map { case (k, _) => k -> scala.collection.mutable.Buffer[Double]() }.toMap
    for (r <- 1 to n) {
      arms.foreach { case (k, fn) =>
        val w = once(fn); walls(k) += w
        println(f"[sab] round $r $k%-14s $w%6.2f s")
      }
    }
    arms.foreach { case (k, _) =>
      val b = walls(k).sorted
      println(f"[sab] MEDIAN $k%-14s ${b(b.size / 2)}%6.2f s over $n rounds")
    }
    s.stop()
  }
}
