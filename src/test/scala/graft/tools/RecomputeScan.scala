package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Catalog sweep for the round-15 re-execution disease: a frame with
  * multiple consumers (broadcast subqueries, aggregation sides,
  * scoring joins) silently re-runs its CPU kernel once per consumer.
  * The signature is a query whose job list contains SEVERAL heavy-CPU
  * jobs of similar size — one per re-execution — where a healthy plan
  * has one kernel job plus cheap downstream stages.
  *
  * For each query (RS_QUERIES=a,b,c or the whole catalog), runs one
  * warm round then one measured round and prints wall, job count, and
  * every job burning > RS_MIN_CPU_MS (default 500) of executor CPU.
  * Two or more ~equal entries = go read the plan for a missing
  * checkpoint / literal-collect.
  */
object RecomputeScan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("RS_DIR", "/root/testdata/sf0.1")
    val minCpu = sys.env.getOrElse("RS_MIN_CPU_MS", "500").toLong
    val names = sys.env.get("RS_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)

    val jobCpu = mutable.LinkedHashMap[Int, (Long, Int)]()
    val stageJob = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobCpu.synchronized { jobCpu(e.jobId) = (0L, 0) }
        e.stageIds.foreach(s => stageJob.synchronized { stageJob(s) = e.jobId })
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageJob.synchronized { stageJob.get(e.stageInfo.stageId) }
        j.foreach { jid => jobCpu.synchronized {
          jobCpu.get(jid).foreach { case (c, n) =>
            jobCpu(jid) = (c + e.stageInfo.taskMetrics.executorCpuTime / 1000000,
              n + e.stageInfo.numTasks)
          }
        }}
      }
    })

    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      try {
        fn(spark, d).write.format("noop").mode("overwrite").save() // warm
        Thread.sleep(200)
        jobCpu.synchronized(jobCpu.clear())
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val heavy = jobCpu.synchronized {
          jobCpu.toSeq.collect { case (_, (c, nt)) if c >= minCpu => (c, nt) }
        }
        val tag = if (heavy.size >= 2) "SUSPECT" else "ok     "
        val desc = heavy.sortBy(-_._1)
          .map { case (c, nt) => s"${c}ms/${nt}t" }.mkString(" ")
        println(f"[rs] $tag $n%-26s ${wall}%6.2f s ${jobCpu.size}%3d jobs  heavy: $desc")
      } catch { case e: Throwable =>
        println(s"[rs] ERROR   $n ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
