package graft.llm

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RUNTIME guard for the minhash docsig checkpoint (ADVICE r15): the
  * lazy `localCheckpoint(false)` in [[Dedup.minHashNearDups]] feeds
  * three subtrees, the exact shape that RACED under AQE in
  * `CorpusStats.unitNovelty` (both consumer map stages computed the
  * kernel before either materialized the checkpoint). PlanShapeSpec
  * pins the single-RDD plan, but a plan pin cannot see a runtime
  * race — this spec measures per-stage executor CPU instead.
  *
  * Protocol (box-speed independent): first run the checkpoint-free
  * pruning-split variant, whose two aggregations are KNOWN to run the
  * shingle+md5 kernel once each — its heaviest stage calibrates what
  * one kernel execution costs on this box. Then run the shipped
  * operator and assert exactly ONE stage reaches kernel-class CPU
  * (> 55% of the calibrated kernel). A returned race would show two.
  */
class MinHashRecomputeSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  /** Per-stage executor CPU (ms), descending, for the action. */
  private def stageCpus(action: => Unit): Seq[Long] = {
    val cpus = scala.collection.mutable.Buffer[Long]()
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        cpus.synchronized { cpus += e.stageInfo.taskMetrics.executorCpuTime / 1000000L }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      action
      // listener events are posted asynchronously and the bus is
      // private; a fixed sleep flakes on a loaded box (a late
      // StageCompleted can drop the kernel stage). Poll until the
      // event stream is quiescent: no new stage for 3 consecutive
      // 100 ms checks, bounded at 5 s.
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

  test("minHashNearDups: the shingle+hash kernel executes in exactly one stage") {
    // CPU concentrated in the kernel: enough docs x shingles that
    // md5-per-shingle dwarfs every downstream stage (docs are mostly
    // unique, so the candidate/verify side stays tiny).
    val docs = (1L to 600L)
      .map(i => (i, (0 until 120).map(j => s"shingle-$i-$j-padding-for-hash-cost")))
      .toDF("id", "sh")
      .localCheckpoint(true) // fixture cost must not land in either profile
    val k = 8
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // calibration: the pruning-split shape (NO docsig checkpoint) —
    // bands prune the gs payload, Catalyst plans two aggregations,
    // the kernel runs once per aggregation; max stage = one kernel
    def splitVariant(): DataFrame = {
      val exploded = docs
        .select(col("id"), explode_outer(array_distinct(col("sh"))).as("s"))
        .filter(col("s").isNotNull)
      val hashed = exploded.select(col("id") +: Dedup.minHashDigests(col("s")): _*)
      val docsig = hashed.groupBy(col("id"))
        .agg(collect_list(col("__sh")).as("gs"), Dedup.minHashAggs(k): _*)
      val cand = Dedup.lshCandidates(Dedup.lshBands(docsig, k, 2))
      val a = docsig.select(col("id").as("id_a"), col("gs").as("ga"))
      val b = docsig.select(col("id").as("id_b"), col("gs").as("gb"))
      cand.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("ga"), col("gb"))) * lit(1.0d) /
            (size(col("ga")) + size(col("gb"))
              - size(array_intersect(col("ga"), col("gb"))))).as("jaccard"))
        .filter(col("jaccard") >= 0.5d)
    }
    noop(splitVariant()) // warm codegen/classloading for both shapes
    val kernelCpu = stageCpus(noop(splitVariant())).max
    assert(kernelCpu > 200L,
      s"calibration kernel too light to discriminate ($kernelCpu ms) — " +
        "grow the fixture")

    val healthy = stageCpus(noop(
      Dedup.minHashNearDups(docs, col("id"), col("sh"), k, 2, 0.5d)))
    val kernelClass = healthy.count(_ > (kernelCpu * 55L) / 100L)
    assert(kernelClass === 1,
      s"expected exactly one kernel-class stage (>55% of the calibrated " +
        s"$kernelCpu ms); saw $kernelClass in ${healthy.take(6)} — the " +
        "docsig checkpoint race is back (or the kernel leaked past it)")
  }
}
