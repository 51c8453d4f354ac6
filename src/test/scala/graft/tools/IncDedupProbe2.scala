package graft.tools

import graft.core.Tables
import graft.llm.{BandIndex, Dedup, DigestIndex, IncrementalDedup, TextOps}
import graft.storage.TxTable
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of admit2's internals (replicated inline) —
  * finds which of the ~8 sub-DAGs owns `llm_incremental_dedup`'s 6 s.
  */
object IncDedupProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val k = 8
    val sigCols = (0 until k).map(s => s"m$s")
    def fingerprints(docs: org.apache.spark.sql.DataFrame) = {
      val sh = docs.select(col("doc_id"),
        explode(TextOps.wordNgrams(TextOps.words(col("text")), 3)).as("sh"))
      val sig = Dedup.minHashSignature(sh, col("doc_id"), col("sh"), k)
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("digest"))
        .join(sig, Seq("doc_id"), "left")
    }

    val d = "/root/testdata/sf0.1"
    val docs = Tables.fanOut(Tables.documents(spark, d)).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val ws = TextOps.words(col("text"))
    val pert = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"),
        array_join(slice(ws, lit(1), greatest(size(ws) - 3, lit(0))), " ").as("text"))
    val b2 = docs.filter(col("doc_id") % 3 =!= 0).unionByName(pert)

    (0 until 2).foreach { round =>
      val t = new TxTable(spark,
        java.nio.file.Files.createTempDirectory("inc_probe2").toString)
      val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val bi = new BandIndex(spark, s"ip2_b_$run")
      val di = new DigestIndex(spark, s"ip2_d_$run")
      time(s"[$round] admit1 (seed)") {
        IncrementalDedup.admit(t, b1, col("doc_id"), col("text"), "2021-01-01",
          bands = Some(bi), digests = Some(di))
      }
      // ----- admit2 internals -----
      val fp = time(s"[$round] a. fingerprints(b2) materialize") {
        fingerprints(b2).localCheckpoint(true)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("digest")).orderBy(col("doc_id"))
      val batchUnique = time(s"[$round] b. in-batch window dedup") {
        fp.withColumn("__r", row_number().over(w))
          .filter(col("__r") === 1).drop("__r").localCheckpoint(true)
      }
      val dv = time(s"[$round] c. digest index view (backfill)") {
        val v = di.view(t); v.main.count(); v
      }
      val noExact = time(s"[$round] d. exact anti-joins") {
        val afterMain = batchUnique.join(dv.main, Seq("digest"), "left_anti")
        (dv.tail match {
          case Some(tl) => afterMain.join(tl, Seq("digest"), "left_anti")
          case None => afterMain
        }).localCheckpoint(true)
      }
      val bv = time(s"[$round] e. band index view (backfill)") {
        val v = bi.view(t, k, 2); v.main.count(); v
      }
      val newSig = noExact.filter(col("m0").isNotNull)
        .select((col("doc_id").as("id") +: sigCols.map(col)): _*)
      val newBands = Dedup.lshBands(newSig, k, 2)
      val candSig = time(s"[$round] f. candidate band join") {
        val nb = newBands.select(
          concat_ws("|", col("band"), col("bk")).as("bkey"), col("id").as("new_id"))
        def leg(stored: org.apache.spark.sql.DataFrame) = stored.join(nb, Seq("bkey"))
          .select((col("new_id") +: col("old_id") +: sigCols.map(col)): _*)
        (bv.tail match {
          case Some(tl) => leg(bv.main).unionByName(leg(tl))
          case None => leg(bv.main)
        }).distinct().localCheckpoint(true)
      }
      val admitted = time(s"[$round] g. verify + suppress") {
        val est = sigCols.map(m =>
          when(col(s"n.$m") === col(s"c.$m"), 1.0d).otherwise(0.0d))
          .reduce(_ + _) / k.toDouble
        val suppressed = candSig.as("c")
          .join(newSig.as("n"), col("c.new_id") === col("n.id"))
          .filter(est >= 0.5)
          .select(col("c.new_id").as("doc_id")).distinct()
        noExact.join(suppressed, Seq("doc_id"), "left_anti").localCheckpoint(true)
      }
      time(s"[$round] h. state fold (insertIgnore)") {
        val folded = admitted.select(
          (col("doc_id") +: col("digest") +: sigCols.map(col)) :+ lit("2021-01-02").as("p_date"): _*)
        t.insertIgnore(folded, Seq("doc_id"))
      }
      time(s"[$round] i. final join + sort + count") {
        docs.unionByName(pert).join(admitted.select(col("doc_id")), Seq("doc_id"))
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id")).count()
      }
      spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
      spark.sql(s"DROP TABLE IF EXISTS ${di.table}")
    }
    spark.stop()
  }
}
