package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.llm.Similarity

/** Same-session A/B for the r13 verdict item 3: the incremental
  * running-min kCenterSample (O(k) distance evaluations per point)
  * vs the textbook re-scan form (least() over ALL selected centers
  * per step, O(k²)) at k=64 on the 10× embeddings fixture — the
  * regime where the quadratic term shows. The textbook form is
  * inlined here verbatim from the pre-r14 implementation; both must
  * select the SAME ids in the SAME order (the running min is exactly
  * the batch least — asserted, not assumed).
  */
object KCenterAbProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(64)
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = ScaleBench.replicateEmbeddings(
      spark.read.parquet(s"$dir/embeddings.parquet"), factor)
      .localCheckpoint(true)
    println(s"[kcab] n=${emb.count()} k=$k")

    // ---- textbook form: re-derive least() over all centers per step
    def textbook(df: DataFrame, k: Int): DataFrame = {
      val pts = df.select(col("vec_id").cast("long").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seed = pts.filter(col("id").isNotNull).orderBy(col("id")).limit(1)
        .collect().head
      var selected = Vector[(Long, Seq[Double], java.lang.Double)](
        (seed.getLong(0), seed.getSeq[Double](1), null))
      var done = false
      while (selected.size < k && !done) {
        val dmin = {
          val ds = selected.map { case (_, c, _) =>
            graft.functions.VecExprs.vecL2Sq(col("v"), typedLit(c)) }
          if (ds.size == 1) ds.head else least(ds: _*)
        }
        val next = pts
          .filter(!col("id").isInCollection(selected.map(_._1)))
          .select(col("id"), col("v"), dmin.as("d"))
          .orderBy(col("d").desc, col("id").asc)
          .limit(1).collect()
        if (next.isEmpty) done = true
        else selected :+= ((next.head.getLong(0), next.head.getSeq[Double](1),
          java.lang.Double.valueOf(next.head.getDouble(2))))
      }
      pts.unpersist(false)
      selected.zipWithIndex
        .map { case ((i, _, d), r) => (r + 1, i, Option(d).map(_.doubleValue)) }
        .toDF("rank", "id", "d")
    }

    def time(f: => Array[org.apache.spark.sql.Row]): (Double, Array[org.apache.spark.sql.Row]) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    // one warm pass of each, then alternate
    val (tInc0, rInc) = time(
      Similarity.kCenterSample(emb, col("vec_id"), col("embedding"), k)
        .orderBy(col("rank")).collect())
    val (tOld0, rOld) = time(textbook(emb, k).orderBy(col("rank")).collect())
    assert(rInc.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      rOld.map(r => (r.getInt(0), r.getLong(1))).toSeq,
      "incremental and textbook selections diverge")
    val inc = (0 until 2).map(_ => time(
      Similarity.kCenterSample(emb, col("vec_id"), col("embedding"), k)
        .collect())._1)
    val old = (0 until 2).map(_ => time(textbook(emb, k).collect())._1)
    println(f"[kcab] incremental: first=$tInc0%.1f then ${inc.map(t => f"$t%.1f").mkString(" ")}")
    println(f"[kcab] textbook:    first=$tOld0%.1f then ${old.map(t => f"$t%.1f").mkString(" ")}")
    spark.stop()
  }
}
