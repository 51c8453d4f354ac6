package graft.tools

import graft.core.Tables
import graft.llm.{BandIndex, DigestIndex, IncrementalDedup, TextOps}
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Phase-stamped replay of the `llm_incremental_dedup` catalog body:
  * each pipeline step sets a job description before it runs, so the
  * job listener attributes every Spark job to a phase and the driver
  * gaps between phases become visible — the commit-protocol-floor
  * microscope the round-16 verdict asked for (IncDedupProbe4 shows
  * the jobs, not WHO issued them).
  */
object IncDedupProbe6 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("IP6_DIR", "/root/testdata/sf0.1")

    case class J(id: Int, start: Long, var end: Long = 0L, var tasks: Int = 0,
                 desc: String)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val stageJob = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("?")
        jobs.synchronized { jobs(e.jobId) = J(e.jobId, e.time, desc = desc) }
        e.stageIds.foreach(s => stageJob.synchronized { stageJob(s) = e.jobId })
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageJob.synchronized { stageJob.get(e.stageInfo.stageId) }
        j.foreach(jid => jobs.synchronized {
          jobs.get(jid).foreach(_.tasks += e.stageInfo.numTasks) })
      }
    })

    def phase[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[ip6] phase $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s (driver-blocking)")
      r
    }

    def run(tag: String): Unit = {
      jobs.synchronized(jobs.clear())
      val w0 = System.nanoTime()
      val docs = Tables.fanOut(Tables.documents(spark, d)).filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val b1 = docs.filter(col("doc_id") % 3 === 0)
      val ws = TextOps.words(col("text"))
      val pert = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"),
          array_join(slice(ws, lit(1), greatest(size(ws) - 3, lit(0))), " ").as("text"))
      val b2 = docs.filter(col("doc_id") % 3 =!= 0).unionByName(pert)
      val t = new graft.storage.TxTable(spark,
        java.nio.file.Files.createTempDirectory("inc_dedup_p6").toString)
      val run = java.util.UUID.randomUUID().toString.replace("-", "")
      val bi = new BandIndex(spark, s"inc_bands_p6_$run")
      val di = new DigestIndex(spark, s"inc_digests_p6_$run")
      val out = try {
        val p1 = phase("prepare1")(IncrementalDedup.prepare(b1, col("doc_id"), col("text")))
        val p2 = phase("prepare2")(IncrementalDedup.prepare(b2, col("doc_id"), col("text")))
        phase("admit1")(IncrementalDedup.admitPrepared(t, p1, "2021-01-01",
          bands = Some(bi), digests = Some(di)))
        phase("admit2")(IncrementalDedup.admitPrepared(t, p2, "2021-01-02",
          bands = Some(bi), digests = Some(di), withDigest = true)
          .select(col("doc_id"), col("digest").as("fp"))
          .orderBy(col("doc_id")))
      } finally phase("dropIndexes") {
        spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
        spark.sql(s"DROP TABLE IF EXISTS ${di.table}")
      }
      phase("finalAction")(out.write.format("noop").mode("overwrite").save())
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(400)
      println(f"[ip6] $tag TOTAL wall $wall%6.2f s, ${jobs.size} jobs")
      val snap = jobs.synchronized(jobs.values.toList)
      snap.sortBy(_.start).foreach { j =>
        println(f"[ip6]  + ${(j.start - snap.map(_.start).min) / 1e3}%6.2f job ${j.id}%3d " +
          f"${(j.end - j.start) / 1e3}%5.2f s ${j.tasks}%4d tasks  ${j.desc.take(60)}")
      }
    }
    run("warm0")
    if (sys.env.contains("IP6_N")) {
      // warm-floor measurement: N further rounds, median printed
      // (pair with a sys-prop toggle in the library for interleaved
      // A/Bs — the r17 commit-shape A/B ran exactly that way)
      val n = sys.env("IP6_N").toInt
      val walls = mutable.Buffer[Double]()
      for (r <- 1 to n) {
        val t0 = System.nanoTime()
        run(s"warm-$r")
        walls += (System.nanoTime() - t0) / 1e9
      }
      println(f"[ip6] warm median: ${walls.sorted.apply(walls.size / 2)}%6.2f s over $n rounds")
    } else run("warm1")
    spark.stop()
  }
}
