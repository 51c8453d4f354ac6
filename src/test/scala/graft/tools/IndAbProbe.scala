package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.catalog.IndicatorQueries

/** Interleaved A/B for the two slowest indicator queries (r14 bench:
  * ts_vpoc 1.44 s, ts_hurst 1.44 s vs a 0.5 s family floor at sf0.1).
  * Both re-derive the whole events→hourly pipeline for every consumer:
  * vpoc consumes `banded` twice (total/argmax agg, then the value-area
  * join) and joins the per-key singleton `tot` without a broadcast
  * hint; hurst unions three rsOf(n) passes that each replay
  * events→hourly→window. B-variants localCheckpoint the shared small
  * frame once (banded: series×bands rows; ret: hourly rows) so the
  * scan+dedup+rollup runs once, and broadcast the singleton join side.
  */
object IndAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ------------------------------------------------------- ts_vpoc
    def vpocA(): DataFrame = IndicatorQueries.queries("ts_vpoc")(spark, dir)

    def vpocB(): DataFrame = {
      val banded = IndicatorQueries.hourlyOhlcQty(spark, dir)
        .select(col("event_type"), expr("c div 100").as("band"), col("qty"))
        .groupBy(col("event_type"), col("band"))
        .agg(sum(col("qty")).as("v"))
        .localCheckpoint(false)
      val pocKey = col("v") * lit(1000000000L) - col("band")
      val tot = banded.groupBy(col("event_type"))
        .agg(sum(col("v")).as("v_total"),
          max_by(col("band"), pocKey).as("poc_band"),
          max_by(col("v"), pocKey).as("poc_volume"))
      banded.join(broadcast(tot), "event_type")
        .filter(col("band") >= col("poc_band") - 1L &&
          col("band") <= col("poc_band") + 1L)
        .groupBy(col("event_type"), col("poc_band"), col("poc_volume"),
          col("v_total"))
        .agg(sum(col("v")).as("__area"))
        .select(col("event_type"), col("poc_band"), col("poc_volume"),
          col("v_total"),
          graft.catalog.Oracle.r4(
            col("__area").cast("double") / col("v_total").cast("double"))
            .as("area_share"))
        .orderBy(col("event_type"))
    }

    // ------------------------------------------------------ ts_hurst
    def hurstA(): DataFrame = IndicatorQueries.queries("ts_hurst")(spark, dir)

    def hurstB(): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
      val ret = IndicatorQueries.hourly(spark, dir)
        .withColumn("__p", lag(col("c"), 1).over(w))
        .filter(col("__p").isNotNull && col("__p") > 0L && col("c") > 0L)
        .withColumn("r", floor(
          log(col("c").cast("double") / col("__p").cast("double"))
            * lit(1000000.0d)).cast("long"))
        .withColumn("rn", row_number().over(w))
        .select(col("event_type"), col("r"), col("rn"))
        .localCheckpoint(false)
      def rsOf(n: Int): DataFrame = {
        val chunkW = Window.partitionBy(col("event_type"), col("ck"))
        val prefW = chunkW.orderBy(col("rn"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ret
          .withColumn("ck", expr(s"(rn - 1) div $n"))
          .withColumn("k", expr(s"(rn - 1) % $n + 1"))
          .withColumn("cn", count(lit(1)).over(chunkW))
          .filter(col("cn") === n.toLong)
          .withColumn("pk", sum(col("r")).over(prefW))
          .withColumn("sc", sum(col("r")).over(chunkW))
          .withColumn("s2", sum(col("r").cast("decimal(19,0)")
            * col("r").cast("decimal(19,0)")).over(chunkW))
          .withColumn("dev", lit(n.toLong) * col("pk") - col("k") * col("sc"))
          .groupBy(col("event_type"), col("ck"))
          .agg(max(col("dev")).as("dmax"), min(col("dev")).as("dmin"),
            first(col("sc")).as("sc"), first(col("s2")).as("s2"))
          .withColumn("rad",
            (lit(n).cast("decimal(10,0)") * col("s2")
              - col("sc").cast("decimal(19,0)") * col("sc").cast("decimal(19,0)"))
              .cast("double"))
          .filter(col("rad") > 0.0d)
          .withColumn("rsq", floor(
            (col("dmax") - col("dmin")).cast("double") / sqrt(col("rad"))
              * lit(1000000.0d)).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("nch"), sum(col("rsq")).as("srs"))
          .select(col("event_type"), lit(n).as("n"),
            (col("srs").cast("double") / col("nch").cast("double")
              / lit(1000000.0d)).as("rs"))
      }
      val all = rsOf(16).unionByName(rsOf(32)).unionByName(rsOf(64))
      val byN = all.groupBy(col("event_type"))
        .agg(count(lit(1)).as("np"),
          max(when(col("n") === 16, col("rs"))).as("rs16"),
          max(when(col("n") === 32, col("rs"))).as("rs32"),
          max(when(col("n") === 64, col("rs"))).as("rs64"))
        .filter(col("np") === 3L)
      val x1 = log(lit(16.0d)); val x2 = log(lit(32.0d)); val x3 = log(lit(64.0d))
      val sx = x1 + x2 + x3
      val sxx = x1 * x1 + x2 * x2 + x3 * x3
      val sy = log(col("rs16")) + log(col("rs32")) + log(col("rs64"))
      val sxy = x1 * log(col("rs16")) + x2 * log(col("rs32")) + x3 * log(col("rs64"))
      import graft.catalog.Oracle.r4
      byN.select(col("event_type"),
          r4(col("rs16")).as("rs16"), r4(col("rs32")).as("rs32"),
          r4(col("rs64")).as("rs64"),
          r4((lit(3.0d) * sxy - sx * sy) / (lit(3.0d) * sxx - sx * sx)).as("hurst"))
        .orderBy(col("event_type"))
    }

    // C: one window pass over an exploded size column n ∈ {16,32,64}
    // (3× rows through ONE pair of window stages instead of 3 pipeline
    // legs), same arithmetic with n as a column.
    def hurstC(): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
      val ret = IndicatorQueries.hourly(spark, dir)
        .withColumn("__p", lag(col("c"), 1).over(w))
        .filter(col("__p").isNotNull && col("__p") > 0L && col("c") > 0L)
        .withColumn("r", floor(
          log(col("c").cast("double") / col("__p").cast("double"))
            * lit(1000000.0d)).cast("long"))
        .withColumn("rn", row_number().over(w))
        .select(col("event_type"), col("r"), col("rn"))
        .localCheckpoint(false)
      val ex = ret.withColumn("n", explode(array(lit(16L), lit(32L), lit(64L))))
        .withColumn("ck", expr("(rn - 1) div n"))
        .withColumn("k", expr("(rn - 1) % n + 1"))
      val chunkW = Window.partitionBy(col("event_type"), col("n"), col("ck"))
      val prefW = chunkW.orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rs = ex
        .withColumn("cn", count(lit(1)).over(chunkW))
        .filter(col("cn") === col("n"))
        .withColumn("pk", sum(col("r")).over(prefW))
        .withColumn("sc", sum(col("r")).over(chunkW))
        .withColumn("s2", sum(col("r").cast("decimal(19,0)")
          * col("r").cast("decimal(19,0)")).over(chunkW))
        .withColumn("dev", col("n") * col("pk") - col("k") * col("sc"))
        .groupBy(col("event_type"), col("n"), col("ck"))
        .agg(max(col("dev")).as("dmax"), min(col("dev")).as("dmin"),
          first(col("sc")).as("sc"), first(col("s2")).as("s2"))
        .withColumn("rad",
          (col("n").cast("decimal(10,0)") * col("s2")
            - col("sc").cast("decimal(19,0)") * col("sc").cast("decimal(19,0)"))
            .cast("double"))
        .filter(col("rad") > 0.0d)
        .withColumn("rsq", floor(
          (col("dmax") - col("dmin")).cast("double") / sqrt(col("rad"))
            * lit(1000000.0d)).cast("long"))
        .groupBy(col("event_type"), col("n"))
        .agg(count(lit(1)).as("nch"), sum(col("rsq")).as("srs"))
        .select(col("event_type"), col("n"),
          (col("srs").cast("double") / col("nch").cast("double")
            / lit(1000000.0d)).as("rs"))
      val byN = rs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("np"),
          max(when(col("n") === 16, col("rs"))).as("rs16"),
          max(when(col("n") === 32, col("rs"))).as("rs32"),
          max(when(col("n") === 64, col("rs"))).as("rs64"))
        .filter(col("np") === 3L)
      val x1 = log(lit(16.0d)); val x2 = log(lit(32.0d)); val x3 = log(lit(64.0d))
      val sx = x1 + x2 + x3
      val sxx = x1 * x1 + x2 * x2 + x3 * x3
      val sy = log(col("rs16")) + log(col("rs32")) + log(col("rs64"))
      val sxy = x1 * log(col("rs16")) + x2 * log(col("rs32")) + x3 * log(col("rs64"))
      import graft.catalog.Oracle.r4
      byN.select(col("event_type"),
          r4(col("rs16")).as("rs16"), r4(col("rs32")).as("rs32"),
          r4(col("rs64")).as("rs64"),
          r4((lit(3.0d) * sxy - sx * sy) / (lit(3.0d) * sxx - sx * sx)).as("hurst"))
        .orderBy(col("event_type"))
    }

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // parity check first — B must return identical rows
    for ((name, a, b) <- Seq(
        ("vpoc", vpocA _, vpocB _), ("hurst", hurstA _, hurstB _),
        ("hurstC", hurstA _, hurstC _))) {
      val d1 = a().collect().map(_.toString).sorted
      val d2 = b().collect().map(_.toString).sorted
      require(d1.sameElements(d2), s"$name A/B rows differ")
      println(s"[indab] $name parity OK (${d1.length} rows)")
    }
    for ((name, f) <- Seq("vpocA" -> vpocA _, "vpocB" -> vpocB _)) run(f)
    for ((name, f) <- Seq(
        "vpocA" -> vpocA _, "vpocB" -> vpocB _,
        "hurstA" -> hurstA _, "hurstB" -> hurstB _,
        "hurstC" -> hurstC _)) {
      val ts = (0 until 4).map(_ => run(f))
      println(f"[indab] $name ${ts.map(t => f"$t%.2f").mkString(" ")} " +
        f"median=${ts.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
