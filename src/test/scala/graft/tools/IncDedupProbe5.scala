package graft.tools

import graft.core.Tables
import graft.llm.IncrementalDedup
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Micro-bisect of the prepare() kernel: runs JUST prepare(b1) await,
  * then JUST prepare(b2) await, each with a job listener, to see how
  * many jobs/CPU one kernel materialization really costs.
  */
object IncDedupProbe5 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.LinkedHashMap[Int, (Long, Int, Long)]()
    val stageJob = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.synchronized { jobs(e.jobId) = (e.time, 0, 0L) }
        e.stageIds.foreach(s => stageJob.synchronized { stageJob(s) = e.jobId })
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageJob.synchronized { stageJob.get(e.stageInfo.stageId) }
        j.foreach { jid => jobs.synchronized {
          jobs.get(jid).foreach { case (t, n, c) =>
            jobs(jid) = (t, n + e.stageInfo.numTasks,
              c + e.stageInfo.taskMetrics.executorCpuTime / 1000000)
          }
        }}
      }
    })
    def report(tag: String): Unit = {
      Thread.sleep(300)
      jobs.synchronized {
        jobs.foreach { case (id, (_, n, c)) =>
          println(s"[ip5] $tag job $id tasks=$n cpuMs=$c")
        }
        jobs.clear()
      }
    }
    val d = "/root/testdata/sf0.1"
    val docs = Tables.fanOut(Tables.documents(spark, d)).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration

    // warm
    Await.result(IncrementalDedup.prepare(b1, col("doc_id"), col("text")).fpF, Duration.Inf)
    report("warm-p1")
    (0 until 2).foreach { r =>
      val t0 = System.nanoTime()
      Await.result(IncrementalDedup.prepare(b1, col("doc_id"), col("text")).fpF, Duration.Inf)
      println(f"[ip5] p1 round $r wall ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      report(s"p1-r$r")
    }
    spark.stop()
  }
}
