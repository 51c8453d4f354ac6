package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Dedup, TextOps}

/** A/B: does checkpointing the df-pruned posting frame inside the
  * containment pipeline beat re-derivation (ReuseExchange already
  * shares the distinct's exchange across consumers)? Mirrors the
  * marginScore measurement discipline — same session, interleaved.
  * Run: sbt "Test/runMain graft.tools.ContainProbe"
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def grams() = {
      val docs = Tables.fanOut(Tables.documents(spark, d))
        .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
      val exc = docs
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
        .filter(col("doc_id") % 10 === 0 && size(col("ws")) >= 15)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          expr("array_join(slice(ws, size(ws) div 3 + 1, size(ws) div 3), ' ')").as("text"))
      docs.unionByName(exc).select(col("doc_id"),
        explode(array_distinct(TextOps.wordNgrams(TextOps.words(col("text")), 5))).as("g"))
    }

    // variant B: the shipped op (which materializes `informative`)
    def withCkpt(): Long =
      Dedup.containmentPairs(grams(), col("doc_id"), col("g"),
        assumeDistinct = true).count()
    // the PRE-change pipeline, inlined WITHOUT the checkpoint: the op
    // itself now materializes `informative`, so calling it would
    // compare checkpoint vs checkpoint and always print a wash
    def plain(): Long = {
      val raw = grams().select(col("doc_id").as("id"), md5(col("g").cast("string")).as("d"))
      val dfs = raw.groupBy(col("d")).agg(count(lit(1)).as("__df"))
      val informative = raw.join(dfs.filter(col("__df") <= 32L), Seq("d"))
      val nA = informative.groupBy(col("id")).agg(count(lit(1)).as("n_a"))
      val pruned = informative.filter(col("__df") >= 2L)
      pruned.select(col("d"), col("id").as("id_a"))
        .join(pruned.select(col("d"), col("id").as("id_b")), Seq("d"))
        .filter(col("id_a") =!= col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
        .join(nA.select(col("id").as("id_a"), col("n_a")), "id_a")
        .filter(col("shared") * lit(100L) >= lit(80L) * col("n_a"))
        .count()
    }

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    plain(); withCkpt() // warm
    val a = (0 until 3).map(_ => time(plain _))
    val b = (0 until 3).map(_ => time(withCkpt _))
    println(f"[contain] plain ${a.map(t => f"$t%.2f").mkString(" ")} median=${a.sorted.apply(1)}%.2f")
    println(f"[contain] ckpt  ${b.map(t => f"$t%.2f").mkString(" ")} median=${b.sorted.apply(1)}%.2f")
    spark.stop()
  }
}
