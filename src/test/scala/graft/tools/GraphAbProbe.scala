package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B (r17): keyed edge materialization for the
  * iterative graph loops — OLD arms are verbatim pre-r17opt copies of
  * Dedup.components / GraphOps.pageRank / GraphOps.hits (git 6ded0a9)
  * whose per-round joins re-exchanged the checkpointed edge set; NEW
  * arms are the live code with the edge checkpoint pre-partitioned on
  * the round-join key. Same pair input (the MinHash near-dup graph
  * the catalog queries use), alternating arms, warm medians.
  */
object GraphAbProbe {

  private def oldComponents(pairs: DataFrame, idA: Column, idB: Column,
                            iters: Int): DataFrame = {
    val e0 = pairs.select(idA.as("src"), idB.as("dst"))
    val edges = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val viaNbr = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nl"))
      labels = labels.join(viaNbr, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  private def oldPageRank(pairs: DataFrame, a: Column, b: Column, iters: Int,
                          d: Double = 0.85d): DataFrame = {
    val e0 = pairs.select(a.cast("long").as("src"), b.cast("long").as("dst"))
    val edges = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val n = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.select(col("src").as("id"))
      .crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0d) / col("n").cast("double")).as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          floor(col("rank") / col("deg").cast("double") * lit(1e12d))
            .cast("long").as("q"))
        .groupBy(col("dst")).agg(sum(col("q")).as("sq"))
      ranks = deg.select(col("src").as("id"))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          (lit(1.0d - d) / col("n").cast("double") +
            lit(d) * (coalesce(col("sq"), lit(0L)).cast("double") / lit(1e12d)))
            .as("rank"))
        .localCheckpoint(false)
    }
    deg.select(col("src").as("id"), col("deg")).join(ranks, Seq("id"))
  }

  private def oldHits(pairs: DataFrame, srcC: Column, dstC: Column,
                      iters: Int): DataFrame = {
    val edges = pairs
      .select(srcC.cast("long").as("src"), dstC.cast("long").as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("_d")).drop("_d")
      .localCheckpoint(false)
    var hub = nodes.withColumn("h", lit(1.0d))
    var auth = nodes.withColumn("a", lit(1.0d))
    for (_ <- 1 to iters) {
      val aq = edges
        .join(hub.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          floor(col("h") * lit(1e12d)).cast("long").as("q"))
        .groupBy(col("dst")).agg(sum(col("q")).as("sq"))
        .localCheckpoint(false)
      val asum = aq.agg(sum(col("sq")).as("s"))
      auth = nodes
        .join(aq.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(asum))
        .select(col("id"),
          (coalesce(col("sq"), lit(0L)).cast("double")
            / col("s").cast("double")).as("a"))
        .localCheckpoint(false)
      val hq = edges
        .join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src"),
          floor(col("a") * lit(1e12d)).cast("long").as("q"))
        .groupBy(col("src")).agg(sum(col("q")).as("sq"))
        .localCheckpoint(false)
      val hsum = hq.agg(sum(col("sq")).as("s"))
      hub = nodes
        .join(hq.withColumnRenamed("src", "id"), Seq("id"), "left")
        .crossJoin(broadcast(hsum))
        .select(col("id"),
          (coalesce(col("sq"), lit(0L)).cast("double")
            / col("s").cast("double")).as("h"))
        .localCheckpoint(false)
    }
    val outDeg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_deg"))
    val inDeg = edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_deg"))
    nodes
      .join(outDeg, Seq("id"), "left")
      .join(inDeg, Seq("id"), "left")
      .join(hub, Seq("id"))
      .join(auth, Seq("id"))
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        col("h"), col("a"))
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
    val dir = sys.env.getOrElse("GAB_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("GAB_N", "7").toInt
    def pairs() = graft.catalog.LlmQueries.minhashPairs(s, dir)
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cc_old" -> (() => oldComponents(pairs(), col("id_a"), col("id_b"), 4)),
      "cc_new" -> (() => graft.llm.Dedup.components(pairs(), col("id_a"), col("id_b"), 4)),
      "pr_old" -> (() => oldPageRank(pairs(), col("id_a"), col("id_b"), 3)),
      "pr_new" -> (() => graft.llm.GraphOps.pageRank(pairs(), col("id_a"), col("id_b"), 3)),
      "hits_old" -> (() => oldHits(pairs(), col("id_b"), col("id_a"), 3)),
      "hits_new" -> (() => graft.llm.GraphOps.hits(pairs(), col("id_b"), col("id_a"), 3)),
    )
    def once(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, fn) => once(fn) }
    val walls = arms.map { case (k, _) => k -> scala.collection.mutable.Buffer[Double]() }.toMap
    for (r <- 1 to n) arms.foreach { case (k, fn) =>
      val w = once(fn); walls(k) += w
      println(f"[gab] round $r $k%-10s $w%6.2f s")
    }
    arms.foreach { case (k, _) =>
      val b = walls(k).sorted
      println(f"[gab] MEDIAN $k%-10s ${b(b.size / 2)}%6.2f s over $n rounds")
    }
    s.stop()
  }
}
