package graft.tools

import org.apache.spark.sql.SparkSession

/** Session-aging experiment (optimization r17): the full 235-query
  * bench session times queries 2-3x slower than a fresh session on
  * the same box. This probe separates the hypotheses:
  *   1. time SUBJECT queries warm in a fresh session;
  *   2. age the session by running AGE_N other catalog queries once;
  *   3. re-time the subjects (degraded?);
  *   4. System.gc() + cleaner drain; re-time (recovered?).
  * Prints BlockManager memory/disk and JVM heap at each phase.
  */
object AgingProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("AP_DIR", "/root/testdata/sf0.1")
    val subjects = sys.env.getOrElse("AP_SUBJECTS",
      "llm_edit_neardup,llm_bloom_filter,llm_kn_lm,ts_sma10").split(",").toSeq
    val ageN = sys.env.getOrElse("AP_AGE_N", "120").toInt

    def once(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(s, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def timeSubjects(tag: String): Unit = {
      val walls = subjects.map(q => q -> once(q))
      println(f"[aging] $tag: " + walls.map { case (q, w) => f"$q=$w%.2f" }.mkString(" "))
    }
    def mem(tag: String): Unit = {
      val infos = s.sparkContext.getRDDStorageInfo
      val memUsed = infos.map(_.memSize).sum / 1e9
      val diskUsed = infos.map(_.diskSize).sum / 1e9
      val rt = Runtime.getRuntime
      val heapUsed = (rt.totalMemory - rt.freeMemory) / 1e9
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => f"${p.getName}=${p.getUsage.getUsed / 1e6}%.0f/${p.getUsage.getMax / 1e6}%.0fMB")
        .mkString(" ")
      val comp = java.lang.management.ManagementFactory.getCompilationMXBean
      val meta = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .find(_.getName == "Metaspace").map(p => p.getUsage.getUsed / 1e6).getOrElse(0.0)
      println(f"[aging] $tag: cachedRdds=${infos.length} rddMem=$memUsed%.2f GB " +
        f"rddDisk=$diskUsed%.2f GB heapUsed=$heapUsed%.2f GB totalHeap=${rt.totalMemory / 1e9}%.2f GB " +
        f"meta=$meta%.0fMB jitMs=${comp.getTotalCompilationTime} $pools")
    }

    subjects.foreach(once) // warm (codegen/JIT)
    timeSubjects("fresh-warm-1")
    timeSubjects("fresh-warm-2")
    mem("after-fresh")

    val rounds = sys.env.getOrElse("AP_ROUNDS", "1").toInt
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(subjects.contains).take(ageN)
    var done = 0
    for (_ <- 1 to rounds) names.foreach { q =>
      try once(q) catch { case e: Throwable =>
        println(s"[aging] $q failed: ${e.getClass.getSimpleName}") }
      done += 1
      if (done % 60 == 0) mem(s"aged-$done")
    }
    mem("after-aging")
    timeSubjects("aged-1")
    timeSubjects("aged-2")
    mem("after-aged-timing")

    System.gc()
    Thread.sleep(3000)
    System.gc()
    Thread.sleep(3000)
    mem("after-gc")
    timeSubjects("post-gc-1")
    timeSubjects("post-gc-2")
    s.stop()
  }
}
