package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job wall/CPU profile of llm_incremental_dedup (or any query
  * via IP4_QUERY): runs warm rounds and prints every Spark job with
  * its wall time, task count, and executor CPU — the protocol-floor
  * microscope for multi-job queries.
  */
object IncDedupProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qname = sys.env.getOrElse("IP4_QUERY", "llm_incremental_dedup")
    val d = sys.env.getOrElse("IP4_DIR", "/root/testdata/sf0.1")

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   var tasks: Int = 0, var cpuMs: Long = 0L, desc: String)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageJob = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          .mkString(" | ")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, e.time, desc = desc.take(90))
        }
        e.stageIds.foreach(s => stageJob.synchronized { stageJob(s) = e.jobId })
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageJob.synchronized { stageJob.get(e.stageInfo.stageId) }
        j.foreach { jid => jobs.synchronized {
          jobs.get(jid).foreach { job =>
            job.tasks += e.stageInfo.numTasks
            job.cpuMs += e.stageInfo.taskMetrics.executorCpuTime / 1000000
          }
        }}
      }
    })

    val fn = graft.SparkEntry.queries(qname)
    fn(spark, d).write.format("noop").mode("overwrite").save()  // warm
    Thread.sleep(300)
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[ip4] $qname total wall ${wall}%6.2f s, ${jobs.size} jobs")
    var covered = 0L
    jobs.synchronized {
      val js = jobs.values.toSeq.sortBy(_.start)
      val qStart = js.headOption.map(_.start).getOrElse(0L)
      js.foreach { j =>
        val w = (j.end - j.start) / 1e3
        covered += j.end - j.start
        println(f"[ip4]  +${(j.start - qStart) / 1e3}%6.2f  job ${j.id}%3d ${w}%6.2f s ${j.tasks}%4d tasks ${j.cpuMs}%6d cpuMs  ${j.desc}")
      }
    }
    println(f"[ip4] sum of job walls ${covered / 1e3}%6.2f s (gaps = driver/metastore time)")
    spark.stop()
  }
}
