package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** Interleaved A/B for scrubFrequentLines' join key (r13 item 4):
  * (A) raw line text as the frequency/verdict key (the pre-r14 form);
  * (B) unhex(md5(line)) 16-byte digests (the current form). The
  * digest buys fixed-width exchange keys (the 100 TB rationale: a
  * boilerplate line is routinely hundreds of bytes) at the cost of
  * one md5 per exploded line on this short-line fixture.
  */
object LsAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), "\\. ").as("lines"))

    def scrub(useDigest: Boolean, ckpt: Boolean = false): DataFrame = {
      val minDocs = 10L
      val ex0 = docs
        .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
        .filter(col("line").isNotNull)
      val (exRaw, key) =
        if (useDigest) (ex0.withColumn("dg", unhex(md5(col("line")))), "dg")
        else (ex0, "line")
      val ex = if (ckpt) exRaw.localCheckpoint(false) else exRaw
      val freq = ex.select(col(key), col("doc_id")).distinct()
        .groupBy(col(key)).agg(count(lit(1)).as("df"))
      val keep = col("df") < minDocs
      ex.join(freq, Seq(key))
        .groupBy(col("doc_id"))
        .agg(
          array_join(transform(
            array_sort(collect_list(when(keep, struct(col("pos"), col("line"))))),
            x => x.getField("line")), "\n").as("clean_text"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, 0L).otherwise(1L)).as("n_dropped"))
    }

    def run(d: Boolean, ck: Boolean): Double = {
      val t0 = System.nanoTime()
      scrub(d, ck).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(true, false); run(false, false); run(true, true)
    val td = (0 until 5).map(_ => run(true, false))
    val tl = (0 until 5).map(_ => run(false, false))
    val tc = (0 until 5).map(_ => run(true, true))
    println(f"[lsab] digest:      ${td.map(t => f"$t%.2f").mkString(" ")} median=${td.sorted.apply(2)}%.2f")
    println(f"[lsab] line:        ${tl.map(t => f"$t%.2f").mkString(" ")} median=${tl.sorted.apply(2)}%.2f")
    println(f"[lsab] digest+ckpt: ${tc.map(t => f"$t%.2f").mkString(" ")} median=${tc.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
