package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-regime gate for the iterative-graph keyed-edge decision
  * (r17 verdict item 7): GraphAbProbe rejected pre-partitioning the
  * edge checkpoint on the round-join key at sf0.1 (the catalog's
  * MinHash graph is a few thousand edges — the repartition costs more
  * than the per-round exchanges it removes), but that is an sf0.1
  * decision. This probe synthesizes DETERMINISTIC edge-heavy graphs
  * (no RNG: dst_j = (src·p_j + j) mod N over fixed odd multipliers,
  * plus a hot head so degree skew is present) at several sizes and
  * runs BOTH pageRank forms — the live plain edges (per-round join
  * re-exchanges the checkpoint) and the keyed form (edges
  * repartitioned on src before the checkpoint, so the three round
  * joins ride one partitioning) — to record where the keyed form
  * breaks even. Equality-gated per size via the exact integer
  * checksum Σ floor(rank·10¹²) and node/deg counts (the quantized
  * iteration is engine/partitioning-exact by design).
  *
  * GSP_SIZES="100000x8,400000x8,1600000x8" (NxavgDeg), GSP_ROUNDS=3.
  */
object GraphScaleProbe {
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
    val sizes = sys.env.getOrElse("GSP_SIZES", "100000x8,400000x8,1600000x8")
      .split(",").map { t => val Array(n, k) = t.trim.split("x"); (n.toLong, k.toInt) }
    val rounds = sys.env.getOrElse("GSP_ROUNDS", "3").toInt
    val iters = 3

    val mult = Seq(3L, 7L, 11L, 17L, 23L, 31L, 43L, 59L, 71L, 89L)
    def pairs(n: Long, k: Int): DataFrame = {
      val js = array((0 until k).map(j =>
        struct(lit(mult(j % mult.length)).as("p"), lit(j.toLong).as("j"))): _*)
      s.range(0, n, 1, s.sparkContext.defaultParallelism)
        .select(col("id").as("id_a"), explode(js).as("e"))
        // hot head: the j=0 edge lands in a 1024-node core, the rest
        // spread by the odd multiplier — deterministic skew
        .select(col("id_a"),
          when(col("e.j") === 0L, pmod(col("id_a"), lit(1024L)))
            .otherwise(pmod(col("id_a") * col("e.p") + col("e.j"), lit(n)))
            .as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
    }

    /** The keyed-edge arm: verbatim live pageRank except the edge
      * checkpoint is pre-partitioned on the round-join key (src), the
      * form GraphAbProbe rejected at sf0.1.
      */
    def keyedPageRank(pr: DataFrame, iters: Int, d: Double = 0.85d): DataFrame = {
      val e0 = pr.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      val edges = e0
        .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .repartition(s.sparkContext.defaultParallelism, col("src"))
        .localCheckpoint(false)
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

    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("deg")),
        sum(floor(col("rank") * lit(1e12d)).cast("long"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for ((n, k) <- sizes) {
      val p = pairs(n, k)
      val plainCk = checksum(graft.llm.GraphOps.pageRank(p, col("id_a"), col("id_b"), iters))
      val keyedCk = checksum(keyedPageRank(p, iters))
      require(plainCk == keyedCk, s"arms disagree at ${n}x$k: $plainCk vs $keyedCk")
      println(s"[gsp] ${n}x$k equality OK: checksum $plainCk")
      val pw = scala.collection.mutable.Buffer[Double]()
      val kw = scala.collection.mutable.Buffer[Double]()
      for (r <- 1 to rounds) {
        if (r % 2 == 1) {
          pw += time(graft.llm.GraphOps.pageRank(pairs(n, k), col("id_a"), col("id_b"), iters))
          kw += time(keyedPageRank(pairs(n, k), iters))
        } else {
          kw += time(keyedPageRank(pairs(n, k), iters))
          pw += time(graft.llm.GraphOps.pageRank(pairs(n, k), col("id_a"), col("id_b"), iters))
        }
        println(f"[gsp] ${n}x$k round $r plain=${pw.last}%.2f keyed=${kw.last}%.2f")
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[gsp] ${n}x$k MEDIAN plain=${med(pw.toSeq)}%.2f keyed=${med(kw.toSeq)}%.2f ratio=${med(kw.toSeq) / med(pw.toSeq)}%.2f")
    }
    s.stop()
  }
}
