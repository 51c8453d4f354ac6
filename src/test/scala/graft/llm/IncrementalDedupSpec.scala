package graft.llm

import graft.SparkSpec
import graft.storage.TxTable
import org.apache.spark.sql.functions._

/** [[IncrementalDedup.admit]] — increment-vs-history dedup over a
  * TxTable fingerprint state: exact and near dups against prior
  * batches are rejected, admissions fold in idempotently (a
  * redelivered batch is a version-preserving no-op), and the change
  * feed carries exactly the admitted fingerprints.
  */
class IncrementalDedupSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def table() = new TxTable(spark,
    java.nio.file.Files.createTempDirectory("incdedup").toString)

  private val longA = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
  private val longB = ("one two three four five six seven eight nine ten " * 4).trim

  test("exact and near dups vs history rejected; fresh admitted; redelivery is a no-op") {
    val t = table()
    val b1 = Seq((1L, longA), (2L, longB)).toDF("id", "text")
    val a1 = IncrementalDedup.admit(t, b1, col("id"), col("text"), "2021-01-01")
    assert(a1.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))

    val nearA = longA.split(" ").dropRight(3).mkString(" ") // minhash near-dup of doc 1
    val b2 = Seq(
      (10L, longA),                       // exact dup of history
      (11L, nearA),                       // near dup of history
      (12L, "completely different words about ships and storms and salt"),
      (13L, "completely different words about ships and storms and salt") // in-batch dup
    ).toDF("id", "text")
    val v1 = t.version
    val a2 = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02")
    assert(a2.select("doc_id").as[Long].collect().toSeq === Seq(12L),
      "only the genuinely fresh doc may be admitted")
    assert(t.read().count() === 3)

    // change feed: the increment delivered exactly doc 12's fingerprint
    val fed = t.readChangesSince(v1).select("doc_id").as[Long].collect().toSeq
    assert(fed === Seq(12L))

    // crash-redelivery of the same batch: everything already folded,
    // so NOTHING re-admits (downstream double delivery impossible)
    // and the no-op upsert does not even bump the table version
    val v2 = t.version
    val a2again = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02")
    assert(a2again.count() === 0, "redelivered batch must admit nothing")
    assert(t.version === v2, "idempotent redelivery must not commit")
    assert(t.read().count() === 3)
  }

  test("docs too short to shingle dedup exactly but never near-match") {
    val t = table()
    IncrementalDedup.admit(t, Seq((1L, "tiny doc")).toDF("id", "text"),
      col("id"), col("text"), "2021-01-01")
    val b2 = Seq((2L, "tiny doc"), (3L, "tiny document")).toDF("id", "text")
    val a = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02")
    assert(a.select("doc_id").as[Long].collect().sorted.toSeq === Seq(3L))
  }

  test("band index: identical admissions, incremental catch-up, zero-Exchange stored side") {
    val t = table()
    val bi = new BandIndex(spark, s"inc_bands_spec_${System.nanoTime()}", buckets = 8)
    try {
      val b1 = Seq((1L, longA), (2L, longB)).toDF("id", "text")
      IncrementalDedup.admit(t, b1, col("id"), col("text"), "2021-01-01",
        bands = Some(bi))
      assert(bi.coveredVersion === -1L,
        "first increment has no history — nothing to index yet")

      val nearA = longA.split(" ").dropRight(3).mkString(" ")
      val b2 = Seq(
        (10L, longA), (11L, nearA),
        (12L, "completely different words about ships and storms and salt"),
        (13L, "tiny doc") // too short to shingle: exact-only, no bands
      ).toDF("id", "text")
      val a2 = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02",
        bands = Some(bi))
      assert(a2.select("doc_id").as[Long].collect().sorted.toSeq === Seq(12L, 13L),
        "band-index path must suppress exactly what derive-from-state suppresses")
      assert(bi.coveredVersion === 0L, "index covers the pre-fold state version")
      // backfill indexed docs 1,2 — k/bandsOf = 4 bands each
      assert(bi.read().count() === 8)

      // next increment: catch-up appends ONLY the newly-folded rows
      // (doc 12's 4 bands; short doc 13 has a null signature — excluded)
      val b3 = Seq((20L, "completely different words about ships and storms and salt"))
        .toDF("id", "text")
      val a3 = IncrementalDedup.admit(t, b3, col("id"), col("text"), "2021-01-03",
        bands = Some(bi))
      assert(a3.count() === 0, "exact dup of an indexed admission rejected")
      assert(bi.coveredVersion === 1L)
      assert(bi.read().count() === 12, "catch-up is O(new rows), appended not rebuilt")

      // the candidate join's stored side must read bucket-local: one
      // Exchange total (the batch side), none above the index scan
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // a literal signature frame keeps the batch branch shuffle-free
        // upstream, so the ONLY Exchange in the plan is the join-side
        // repartition of the batch bands into the index's bucketing
        val batchBands = Dedup.lshBands(
          Seq((99L, "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7"))
            .toDF("id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7"), 8, 2)
          .select(concat_ws("|", col("band"), col("bk")).as("bkey"),
            col("id").as("new_id"))
        val joined = bi.read().join(batchBands, Seq("bkey"))
        val plan = joined.queryExecution.executedPlan.toString
        val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
        assert(exchanges === 1,
          s"stored side must join off its bucket layout (batch side only shuffles):\n$plan")
        assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

      // geometry is pinned: a mismatched catch-up fails loudly
      val bad = intercept[IllegalArgumentException] {
        IncrementalDedup.admit(t, b3, col("id"), col("text"), "2021-01-04",
          k = 8, bandsOf = 4, bands = Some(bi))
      }
      assert(bad.getMessage.contains("bandsOf"), bad.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
  }
}
