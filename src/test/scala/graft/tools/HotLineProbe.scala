package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: document-frequency aggregation under a mega-frequent line
  * (the r7 verdict's scrubFrequentLines hot-key scenario — one
  * boilerplate line in 50%+ of all documents).
  *
  * A: groupBy(line).agg(countDistinct(doc_id)) — Spark's one-distinct
  *    plan exchanges on `line`, so the hot line's pairs hit 1 reducer.
  * B: select(line, doc_id).distinct().groupBy(line).count() — the
  *    dedup exchange keys the full pair (spread by doc_id) and the
  *    count map-side-combines before the line exchange.
  * Run: sbt "Test/runMain graft.tools.HotLineProbe [nDocs]"
  */
object HotLineProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // every doc carries the boilerplate line + 2 unique lines
    val ex = spark.range(n).select(col("id").as("doc_id"),
        explode(array(lit("COPYRIGHT FOOTER"),
          concat(lit("body-"), col("id")),
          concat(lit("tail-"), col("id")))).as("line"))
      .persist()
    ex.count()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
      println(s"$tag: ${"%.2f".format(ts)}s")
    }
    time("A countDistinct      ")(ex.groupBy(col("line")).agg(countDistinct(col("doc_id")).as("df")))
    time("B distinct-then-count")(ex.select(col("line"), col("doc_id")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df")))
    spark.stop()
  }
}
