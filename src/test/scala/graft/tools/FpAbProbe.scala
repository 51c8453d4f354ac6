package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables


/** Interleaved A/B for IncrementalDedup.fingerprints (r13 verdict
  * item 5): (A) the current doc-sized digest JOIN onto the minhash
  * aggregate; (B) digest carried through the explode as a first()
  * PAYLOAD of the same aggregation (NOT a group key — the r12
  * counter-measurement rejected the key form because it widened the
  * exchange hash key; a payload column is map-side combined to one
  * row per (partition, doc) before the exchange). Null-marker row
  * keeps sub-3-word docs alive like the left join does.
  */
object FpAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 8
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.fanOut(Tables.documents(spark, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))

    def joined(): DataFrame = {
      val sh = docs.select(col("doc_id"),
        explode(TextOps.wordNgrams(TextOps.words(col("text")), 3)).as("sh"))
      val sig = Dedup.minHashSignature(sh, col("doc_id"), col("sh"), k)
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("digest"))
        .join(sig, Seq("doc_id"), "left")
    }

    def payload(): DataFrame = {
      val pre = docs.select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("digest"),
        concat(
          TextOps.wordNgrams(TextOps.words(col("text")), 3),
          array(lit(null).cast("string"))).as("shs"))
      val exploded = pre.select(col("doc_id"), col("digest"),
        explode(col("shs")).as("sh"))
      val hashed = exploded.select(col("doc_id") +: col("digest") +:
        Dedup.minHashDigests(col("sh")): _*)
      hashed.groupBy(col("doc_id"))
        .agg(first(col("digest")).as("digest"),
          Dedup.minHashAggs(k): _*)
    }

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // value equality
    val a = joined().orderBy(col("doc_id")).collect()
    val b = payload().select(a.head.schema.fieldNames.map(col): _*)
      .orderBy(col("doc_id")).collect()
    assert(a.length == b.length, s"${a.length} vs ${b.length}")
    assert(a.zip(b).forall { case (x, y) => x == y }, "rows diverge")
    run(() => joined()); run(() => payload())
    val ta = (0 until 5).map(_ => run(() => joined()))
    val tb = (0 until 5).map(_ => run(() => payload()))
    println(f"[fpab] join:    ${ta.map(t => f"$t%.2f").mkString(" ")} median=${ta.sorted.apply(2)}%.2f")
    println(f"[fpab] payload: ${tb.map(t => f"$t%.2f").mkString(" ")} median=${tb.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
