package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Sketches, TextOps}

/** Interleaved A/B of `llm_bloom_filter`'s probe stage: the pre-r17
  * shape (explode(h) → shuffle join on (g,w) → regroup by
  * (g,key,source)) vs the r17 map-side packed-sketch `forall`
  * (`Sketches.bloomMightContain`). Both arms run the FULL query
  * (kernel + sketch build + probe + verdict aggregate) through the
  * noop sink so the walls are catalog-comparable; the two arms'
  * outputs are asserted value-identical once before timing (sorted
  * collect compare — the oracle-equivalence proof for the rewrite).
  * Env: BAB_N rounds (default 7), BAB_DIR (default sf0.1).
  */
object BloomAbProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("BAB_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("BAB_N", "7").toInt

    // sourceGrams + bloomFilterQ body (CurationQueries), with the
    // probe stage switchable. Kept in lockstep with the catalog query
    // by the value-identity assert below.
    def query(oldProbe: Boolean): DataFrame = {
      val grams = Tables.fanOut(Tables.documents(s, dir))
        .select(col("source"),
          explode_outer(TextOps.wordNgrams(TextOps.words(col("text")), 5)).as("g"))
        .filter(col("g").isNotNull)
        .select(col("source"), col("g")).distinct()
        .localCheckpoint(false)
      val refS = grams.groupBy().agg(min(col("source")).as("source"))
      val refGrams = grams.join(broadcast(refS), "source").select(col("g"))
      val bloom = Sketches.bloomBuild(refGrams, lit(0L), col("g"))
      val probes = grams.join(broadcast(refS), Seq("source"), "left_anti")
        .select(col("source"), col("g"))
      val maybe =
        if (oldProbe) oldMightContain(bloom, probes, lit(0L), col("g"),
          carry = Seq(col("source")))
        else Sketches.bloomMightContain(bloom, probes, lit(0L), col("g"),
          carry = Seq(col("source")))
      val refSet = refGrams.select(col("g"), lit(1L).as("in_ref"))
      maybe.select(col("source"), col("key").as("g"), col("maybe"))
        .join(refSet, Seq("g"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
          sum(when(col("in_ref").isNotNull, 1L).otherwise(0L)).as("n_true"))
        .select(col("source"), col("n_probes"), col("n_maybe"), col("n_true"),
          (col("n_maybe") - col("n_true")).as("n_fp"))
        .orderBy(col("source"))
    }

    // equivalence gate before any timing
    val a = query(oldProbe = true).collect().map(_.toString).sorted
    val b = query(oldProbe = false).collect().map(_.toString).sorted
    require(a.sameElements(b),
      s"ARMS DIVERGE: old=${a.mkString(";")} new=${b.mkString(";")}")
    println(s"[bab] arms value-identical over ${a.length} rows")

    def once(oldProbe: Boolean): Double = {
      val t0 = System.nanoTime()
      query(oldProbe).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(true); once(false) // warmup, untimed
    val walls = Map(true -> scala.collection.mutable.Buffer[Double](),
      false -> scala.collection.mutable.Buffer[Double]())
    for (r <- 1 to n; arm <- Seq(true, false)) {
      val w = once(arm)
      walls(arm) += w
      println(f"[bab] round $r ${if (arm) "old" else "new"} $w%6.2f s")
    }
    Seq(true, false).foreach { arm =>
      val sorted = walls(arm).sorted
      println(f"[bab] MEDIAN ${if (arm) "old" else "new"} ${sorted(sorted.size / 2)}%6.2f s over $n warm rounds")
    }
    s.stop()
  }

  /** The pre-r17 probe, verbatim, as the A arm. */
  private def oldMightContain(sketch: DataFrame, keys: DataFrame,
                              group: Column, key: Column,
                              carry: Seq[Column]): DataFrame =
    keys.select((group.as("g") +: key.as("key") +: carry) :+
        explode(Sketches.bloomProbes(key, 4, 18)).as("p"): _*)
      .select((col("g") +: col("key") +: carry) :+
        expr("p div 32").as("w") :+
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("m"): _*)
      .join(sketch, Seq("g", "w"), "left")
      .groupBy((col("g") +: col("key") +: carry): _*)
      .agg((min(when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("m")) =!= 0L,
        1L).otherwise(0L)) === 1L).as("maybe"))
}
