package graft.tools

import graft.functions.CdcGearChunks
import graft.llm.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: md5-window CDC boundary predicate (the oracle-portable form,
  * [[TextOps.cdcChunks]]) vs the native gear-hash kernel
  * ([[CdcGearChunks]]) on the same synthetic corpus. Run:
  * Test/runMain graft.tools.CdcGearProbe [docs] [charsPerDoc]
  */
object CdcGearProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(10000)
    val chars = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.range(nDocs.toLong).select(col("id"),
        // deterministic pseudo-text, distinct per doc
        concat_ws(" ", (0 until chars / 8).map(i =>
          substring(md5(concat(col("id"), lit(i))), 1, 7)): _*).as("t"))
      .localCheckpoint(true)
    val total = nDocs.toLong * chars

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-12s $s%8.2f s   ${s * 1e9 / total}%6.1f ns/char")
      s
    }
    // warmup
    docs.select(size(CdcGearChunks.cdcGearChunks(col("t"), 16, 256, 6)))
      .write.format("noop").mode("overwrite").save()

    val tG = time("gear") {
      docs.select(size(CdcGearChunks.cdcGearChunks(col("t"), 16, 256, 6)))
        .write.format("noop").mode("overwrite").save()
    }
    val tM = time("md5-window") {
      docs.select(size(TextOps.cdcChunks(col("t"), 16, "03")))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"speedup ${tM / tG}%.1fx on ${total / 1e6}%.0f M chars")
    spark.stop()
  }
}
