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

  test("in-batch NEAR-dups are both admitted: admit is increment-vs-history, not full dedup") {
    // the contract pinned: admit suppresses only against STORED
    // signatures (plus in-batch EXACT dups by digest). Two near-dup
    // (not byte-identical) docs arriving in the same batch are both
    // admitted — in-batch near-dedup belongs to minHashNearDups +
    // components, composed AFTER admit (the scaladoc example).
    val t = table()
    IncrementalDedup.admit(t, Seq((1L, longB)).toDF("id", "text"),
      col("id"), col("text"), "2021-01-01")

    val nearA = longA.split(" ").dropRight(3).mkString(" ")
    val batch = Seq((10L, longA), (11L, nearA)).toDF("id", "text")
    val admitted = IncrementalDedup.admit(t, batch, col("id"), col("text"), "2021-01-02")
      .localCheckpoint()
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq === Seq(10L, 11L),
      "neither near-dup is in history: BOTH admit")

    // the composed pipeline: admit → in-batch near-dedup keeps one
    // representative per near-dup cluster (lowest id)
    val docsArr = admitted.select(col("doc_id").as("id"),
      TextOps.wordNgrams(TextOps.words(col("text")), 3).as("sh"))
    val pairs = Dedup.minHashNearDups(docsArr, col("id"), col("sh"), k = 8,
      bandsOf = 2, threshold = 0.5)
    val labels = Dedup.components(pairs, col("id_a"), col("id_b"), iters = 3)
    val keep = admitted.join(
      labels.filter(col("id") =!= col("label")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(keep.select("doc_id").as[Long].collect().sorted.toSeq === Seq(10L),
      "composed near-dedup keeps the cluster's lowest id")

    // and the FOLLOWING increment is suppressed by both admissions —
    // history-vs-increment still sees everything admit folded in
    val next = IncrementalDedup.admit(t,
      Seq((20L, nearA)).toDF("id", "text"), col("id"), col("text"), "2021-01-03")
    assert(next.count() === 0)
  }

  test("band index: identical admissions, incremental catch-up, zero-Exchange stored side") {
    val t = table()
    // minFoldRows = 0: fold on every view, the always-current layout
    val bi = new BandIndex(spark, s"inc_bands_spec_${System.nanoTime()}",
      buckets = 8, minFoldRows = 0L)
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
      // the signature rides on every index row: verification joins
      // bucket-locally off the index, never re-reading the state
      assert(bi.read().columns.toSeq ===
        "bkey" +: "old_id" +: (0 until 8).map(i => s"m$i"),
        "index rows must carry the signature columns")

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

  test("digest index: identical exact suppression, incremental catch-up, zero-Exchange stored side") {
    val t = table()
    val di = new DigestIndex(spark, s"inc_digests_spec_${System.nanoTime()}",
      buckets = 8, minFoldRows = 0L)
    try {
      val b1 = Seq((1L, longA), (2L, longB)).toDF("id", "text")
      IncrementalDedup.admit(t, b1, col("id"), col("text"), "2021-01-01",
        digests = Some(di))
      assert(di.coveredVersion === -1L,
        "first increment has no history — nothing to index yet")

      val b2 = Seq(
        (10L, longA), // exact dup of doc 1 — must be rejected via the index
        (11L, "completely different words about ships and storms and salt"),
        (12L, "tiny doc")
      ).toDF("id", "text")
      val a2 = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02",
        digests = Some(di))
      assert(a2.select("doc_id").as[Long].collect().sorted.toSeq === Seq(11L, 12L),
        "digest-index path must suppress exactly what the full-state scan suppresses")
      assert(di.coveredVersion === 0L)
      assert(di.read().count() === 2, "backfill holds b1's 2 digests")

      val b3 = Seq((20L, longA)).toDF("id", "text")
      val a3 = IncrementalDedup.admit(t, b3, col("id"), col("text"), "2021-01-03",
        digests = Some(di))
      assert(a3.count() === 0, "exact dup of an indexed admission rejected")
      assert(di.read().count() === 4, "catch-up appended only b2's 2 admissions")

      // the anti-join's stored side must read bucket-local: one
      // Exchange total (the batch side), none above the index scan
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val probe = Seq("00notreal").toDF("digest")
        val anti = probe.join(di.read(), Seq("digest"), "left_anti")
        val plan = anti.queryExecution.executedPlan.toString
        val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
        assert(exchanges === 1,
          s"stored side must anti-join off its bucket layout (batch side only shuffles):\n$plan")
        assert(plan.contains("Bucketed: true"), s"digest index scan not bucketed:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    } finally spark.sql(s"DROP TABLE IF EXISTS ${di.table}")
  }

  test("band index: a crashed first fold (data without geometry props) fails loudly") {
    // the crash window: the first fold's bucketed write landed but the
    // TBLPROPERTIES commit did not — a later call must refuse rather
    // than silently appending under possibly-different band geometry
    val t = table()
    val bi = new BandIndex(spark, s"inc_bands_crash_${System.nanoTime()}")
    try {
      IncrementalDedup.admit(t, Seq((1L, longA)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-01") // seed history, no index yet
      graft.storage.Bucketing.writeBucketed(
        Seq(("0|x", 1L)).toDF("bkey", "old_id"), bi.table, "bkey", 4)
      val e = intercept[IllegalArgumentException] {
        IncrementalDedup.admit(t, Seq((2L, longB)).toDF("id", "text"),
          col("id"), col("text"), "2021-01-02", bands = Some(bi))
      }
      assert(e.getMessage.contains("fold properties are missing"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
  }

  test("band index: small tails serve from the derived delta; fold waits for minFoldRows") {
    // the main+delta contract: below minFoldRows an increment rides
    // the derived tail (no bucketed append, coveredVersion frozen)
    // yet still suppresses against the un-folded admissions; once the
    // accumulated tail crosses the threshold, one append folds it
    val t = table()
    val bi = new BandIndex(spark, s"inc_bands_tail_${System.nanoTime()}",
      buckets = 4, minFoldRows = 3L)
    try {
      IncrementalDedup.admit(t, Seq((1L, longA), (2L, longB)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-01", bands = Some(bi))          // state v0
      val fresh = "completely different words about ships and storms and salt " +
        "carried far over the grey water by a patient wind"
      IncrementalDedup.admit(t, Seq((10L, fresh)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-02", bands = Some(bi))          // backfill folds v0
      assert(bi.coveredVersion === 0L)
      assert(bi.read().count() === 8, "backfill holds only v0's 2 docs x 4 bands")

      // near-dup of the UN-FOLDED admission: must be suppressed off
      // the derived tail (1 doc < minFoldRows=3 -> no fold)
      val nearFresh = fresh.split(" ").dropRight(3).mkString(" ")
      val a3 = IncrementalDedup.admit(t, Seq((20L, nearFresh)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-03", bands = Some(bi))
      assert(a3.count() === 0, "tail-served suppression must work before any fold")
      assert(bi.coveredVersion === 0L, "small tail must not fold")
      assert(bi.read().count() === 8)

      // two more admissions push the tail to 3 docs >= minFoldRows:
      // the next view folds all of them in one append
      IncrementalDedup.admit(t, Seq(
        (30L, "the quick brown fox jumps over a lazy dog by the river bank"),
        (31L, "pack my box with five dozen liquor jugs said the printer"))
        .toDF("id", "text"),
        col("id"), col("text"), "2021-01-04", bands = Some(bi))          // state v2
      val a5 = IncrementalDedup.admit(t, Seq((40L, fresh)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-05", bands = Some(bi))
      assert(a5.count() === 0, "exact dup vs folded-or-tail history")
      assert(bi.coveredVersion === 2L, "3-doc tail crosses minFoldRows and folds")
      assert(bi.read().count() === 20, "8 backfilled + 12 folded tail bands")
    } finally spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
  }

  test("hash-scheme contract: a state pinned under a different scheme fails loudly") {
    val t = table()
    IncrementalDedup.admit(t, Seq((1L, longA)).toDF("id", "text"),
      col("id"), col("text"), "2021-01-01")
    // first admit pins the current scheme + k into the state props
    assert(t.props()(Dedup.MinHashSchemeProp) === Dedup.MinHashScheme)
    assert(t.props()("graft.minhash.k") === "8")
    // a state built under a DIFFERENT scheme (simulated via a fresh
    // table whose props are pre-pinned) must be rejected, not silently
    // degraded to exact-only suppression
    val old = table()
    old.setPropsIfAbsent(Map(Dedup.MinHashSchemeProp -> "md5-per-seed",
      "graft.minhash.k" -> "8"))
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.admit(old, Seq((2L, longB)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-01")
    }
    assert(e.getMessage.contains("md5-per-seed"))
    // a k mismatch against pinned props fails the same way
    val e2 = intercept[IllegalArgumentException] {
      IncrementalDedup.admit(t, Seq((3L, longB)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-02", k = 4)
    }
    assert(e2.getMessage.contains("graft.minhash.k"))
  }

  test("hash-scheme contract: a NON-EMPTY state with no pinned scheme is unverifiable") {
    // a fingerprint state populated before the pinning contract
    // existed has rows but no _props; stamping it with the CURRENT
    // scheme at next admit would legitimize silently-degraded
    // (exact-only) suppression — it must fail and demand a rebuild
    val t = table()
    IncrementalDedup.admit(t, Seq((1L, longA)).toDF("id", "text"),
      col("id"), col("text"), "2021-01-01")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(t.root, graft.storage.TxTable.LogDirName, "_props"))
    assert(t.props().isEmpty && t.version >= 0)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.admit(t, Seq((2L, longB)).toDF("id", "text"),
        col("id"), col("text"), "2021-01-02")
    }
    assert(e.getMessage.contains("unverifiable"))
    // and crucially: the failed admit did NOT stamp props after the fact
    assert(t.props().isEmpty)
  }
}
