package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Catalog-wide scan for the InferFiltersFromGenerate pathology: runs
  * each query twice (warm) and reports single-task stages burning
  * >300 ms CPU — the signature of a pushed generator filter
  * re-evaluating computed arrays below the fan-out exchange.
  */
object GenFilterScan {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val hot = ArrayBuffer[(Long, Int)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val cpuMs = i.taskMetrics.executorCpuTime / 1000000
        if (i.numTasks <= 2 && cpuMs > 300) hot += ((cpuMs, i.numTasks))
      }
    })
    val d = sys.env.getOrElse("GF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("GF_QUERIES", {
      System.err.println(
        "usage: GF_QUERIES=q1,q2 [GF_DIR=/root/testdata/sf0.1] " +
          "sbt 'Test/runMain graft.tools.GenFilterScan'")
      sys.exit(2)
    }).split(",").map(_.trim).filter(_.nonEmpty)
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      try {
        fn(s, d).write.format("noop").mode("overwrite").save()  // warm
        hot.clear()
        val t0 = System.nanoTime()
        fn(s, d).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val flagged = hot.sortBy(-_._1).take(4)
          .map { case (ms, nt) => s"${ms}ms/${nt}t" }.mkString(" ")
        println(f"[scan] $n%-24s ${dt}%6.2f s  hot1task: $flagged")
      } catch { case e: Throwable =>
        println(s"[scan] $n ERROR ${e.getMessage.take(80)}")
      }
    }
    s.stop()
  }
}
