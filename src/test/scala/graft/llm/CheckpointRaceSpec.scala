package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RUNTIME pins for the remaining lazy-checkpoint multi-consumer
  * sites (r17 verdict item 8) — the docsig-race class: a lazy
  * `localCheckpoint(false)` feeding several subtrees can RACE under
  * AQE (both consumer map stages compute the kernel before either
  * materializes the checkpoint — `CorpusStats.unitNovelty`'s measured
  * failure, twin 14+5.6 s CPU jobs). PlanShapeSpec-style plan pins
  * cannot see a runtime race; only the minhash family carried the
  * runtime assertion until this spec.
  *
  * Protocol per site: build a KERNEL-ONCE reference — the same
  * pre-checkpoint chain INCLUDING the lazy checkpoint, with a single
  * consumer, so its stage profile is exactly "one checkpoint
  * materialization" as the shipped operator performs it — then
  * profile the shipped operator and assert it has NO MORE
  * kernel-class stages (≥ 55% of the reference's heaviest) than the
  * reference itself. A race ADDS a kernel-class stage (a second
  * scan+kernel execution in a consumer's map stage). Both paths are
  * warmed before either profile so calibration and shipped are
  * measured in the same JIT regime (a cold calibration reads ~2×
  * and wrecks any absolute bar — measured).
  */
class CheckpointRaceSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def assertNoExtraKernelStage(site: String,
                                       reference: => DataFrame,
                                       shipped: => DataFrame): Unit = {
    noop(reference); noop(shipped) // same JIT regime for both profiles
    val prof = graft.StageCpus.profile(spark)(noop(shipped))
    val ref = graft.StageCpus.profile(spark)(noop(reference))
    assert(ref.max > 200L,
      s"$site: reference kernel too light to discriminate (${ref.max} ms) — grow the fixture")
    // 70%, not 55%: a raced kernel stage carries the kernel's FULL
    // CPU on top of the consumer's own work (>= ~100% of
    // calibration), while a heavy-but-honest downstream stage
    // (verdict join shuffling text payloads, pair-distinct exchange)
    // sits well under the kernel. At 55% those IO stages crossed the
    // bar on an IDLE box (r17: kernel CPU compresses without
    // contention, shuffle stages compress less — containmentPairs
    // read 150/141 ms downstream vs thr 123, scrubFrequentLines
    // 343 ms vs thr 324) and flagged a race that was not there.
    val thr = (ref.max * 70L) / 100L
    val refHeavy = ref.count(_ > thr)
    val shippedHeavy = prof.count(_ > thr)
    assert(shippedHeavy <= refHeavy,
      s"$site: shipped run has $shippedHeavy kernel-class stages " +
        s"(>${thr} ms) vs the kernel-once reference's $refHeavy — the lazy " +
        s"checkpoint raced. shipped=${prof.take(6)} ref=${ref.take(6)}")
  }

  /** For sites whose checkpoint became EAGER (containmentPairs r17a,
    * scrubFrequentLines r17b), the complete race pin is EAGERNESS
    * itself: `localCheckpoint(true)` computes and caches the blocks
    * at CONSTRUCTION, before any consumer subtree exists, so no
    * consumer stage can recompute the kernel (absent executor loss —
    * not a single-JVM concern). Asserting "≥1 job ran while the
    * operator merely BUILT its frame" is deterministic under any
    * box/JIT regime, unlike the stage-CPU profile the lazy sites
    * need — which misread honest downstream IO stages as kernel
    * executions twice across load regimes before this split (55%→70%
    * bar retune, then a full-suite flake at 70%).
    */
  private def assertEagerBuild(site: String)(build: => DataFrame): Unit = {
    val stages = graft.StageCpus.profile(spark) { build; () }
    assert(stages.nonEmpty,
      s"$site: no job ran at construction — the kernel checkpoint is " +
        "no longer eager, so the consumer-race class is structurally " +
        "possible again (move the site back to the stage-profile pin)")
  }

  test("containmentPairs: the digest+df kernel materializes at construction") {
    val pad = "x" * 200
    val exploded = (1L to 200L)
      .flatMap(i => (0 until 30).map(j => (i, s"gram-$i-$j-$pad")))
      .toDF("id", "g")
      .localCheckpoint(true)
    assertEagerBuild("containmentPairs")(
      Dedup.containmentPairs(exploded, col("id"), col("g"), 2L, 32L, 80))
  }

  test("scrubFrequentLines: the line-digest kernel materializes at construction") {
    val docs = (1L to 200L)
      .map(i => (i, (0 until 30).map(j => s"line-$i-$j")))
      .toDF("id", "lines")
      .localCheckpoint(true)
    assertEagerBuild("scrubFrequentLines")(
      Dedup.scrubFrequentLines(docs, col("id"), col("lines"), 3L))
  }

  test("sourceOverlap: the tokenize+set kernel executes in exactly one stage") {
    val docs = (1L to 2500L)
      .map(i => (s"src${i % 5}",
        (0 until 120).map(j => s"tokenword${(i * 31 + j) % 4000}").mkString(" ")))
      .toDF("src", "text")
      .localCheckpoint(true)
    def kernelOnce: DataFrame = docs.filter(col("text").isNotNull)
      .select(col("src"),
        explode(array_distinct(TextOps.wordNgrams(TextOps.words(col("text")), 3))).as("g"))
      .groupBy("g").agg(sort_array(collect_set(col("src"))).as("ss"))
      .select(col("ss"))
      .localCheckpoint(false)
    assertNoExtraKernelStage("sourceOverlap",
      kernelOnce,
      CorpusStats.sourceOverlap(docs, col("src"), col("text"), 3))
  }

  test("dropBottomQuantile caller shape: the scoring kernel executes in exactly one stage") {
    // the ccnet/quantile-filter catalog shape: an expensive scored
    // projection, lazily checkpointed, referenced three times inside
    // dropBottomQuantile (histogram, keep-outright, tie branch)
    // 6000×200 clears the 200 ms floor on an idle box (2500 read
    // 172 ms there and tripped the too-light guard)
    val docs = (1L to 6000L)
      .map(i => (i, s"g${i % 3}",
        (0 until 200).map(j => s"shingle-$i-$j-padding-for-hash-cost")))
      .toDF("doc_id", "lang", "sh")
      .localCheckpoint(true)
    def scored: DataFrame = docs.select(col("doc_id"), col("lang"),
      (conv(substring(element_at(
          graft.functions.MinHashSig.minHashSig(col("sh"), 8), 1), 1, 6), 16, 10)
        .cast("long").cast("double") / 16777216.0d).as("q"))
    assertNoExtraKernelStage("dropBottomQuantile-caller",
      scored.localCheckpoint(false),
      Sampling.dropBottomQuantile(scored.localCheckpoint(false),
        "lang", "q", "doc_id", 1L, 4L))
  }
}
