package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage executor-CPU profiler shared by the lazy-checkpoint
  * recompute pins (MinHashRecomputeSpec, CheckpointRaceSpec): runs an
  * action under a stage listener and returns stage CPU millis,
  * descending. Listener events post asynchronously and the bus is
  * private, so the profile polls the event stream to quiescence
  * (no new stage for 3 consecutive 100 ms checks, bounded at 5 s)
  * instead of a fixed sleep that flakes on a loaded box.
  */
object StageCpus {
  def profile(spark: SparkSession)(action: => Unit): Seq[Long] = {
    val cpus = scala.collection.mutable.Buffer[Long]()
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        cpus.synchronized { cpus += e.stageInfo.taskMetrics.executorCpuTime / 1000000L }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      action
      var stable = 0
      var last = -1
      var waited = 0
      while (stable < 3 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val n = cpus.synchronized(cpus.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    cpus.synchronized(cpus.sortBy(-_).toList)
  }
}
