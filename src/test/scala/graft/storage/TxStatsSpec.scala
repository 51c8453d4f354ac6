package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TxTable file-stat skipping: per-commit sidecars, range pruning as
  * a superset guarantee, graceful degradation without stats, vacuum
  * consolidation, and the rewrite path.
  */
class TxStatsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def table() = new TxTable(spark,
    java.nio.file.Files.createTempDirectory("txstats").toString,
    statsCols = Seq("ts"))

  private def batch(part: String, ts0: Long, n: Int) =
    (0 until n).map(i => (ts0 + i, s"v$i", part)).toDF("ts", "v", "p_date")
      .coalesce(1) // one file per commit: deterministic prune counts

  test("range pruning reads only intersecting files; answers stay exact") {
    val t = table()
    t.append(batch("a", 0L, 100))      // ts 0..99
    t.append(batch("a", 1000L, 100))   // ts 1000..1099
    t.append(batch("b", 2000L, 100))   // ts 2000..2099

    val snap = t.read()
    val all = snap.count()
    assert(all === 300L)

    // bounds hitting only the middle commit
    val pruned = t.pruneFiles(
      t.snapshot(t.version).files, Map("ts" -> ((1050L, 1060L))))
    assert(pruned.nonEmpty &&
      pruned.size < t.snapshot(t.version).files.size,
      s"pruning must drop the non-intersecting files: kept ${pruned.size}")

    val got = t.readPruned(Map("ts" -> ((1050L, 1060L))))
      .filter(col("ts") >= 1050L && col("ts") <= 1060L)
    val want = t.read().filter(col("ts") >= 1050L && col("ts") <= 1060L)
    assert(got.count() === want.count() && got.count() === 11L)

    // a range matching nothing prunes everything
    assert(t.pruneFiles(t.snapshot(t.version).files,
      Map("ts" -> ((50000L, 60000L)))).isEmpty)
  }

  test("files without stats are always read — stats are never a correctness input") {
    val t = table()
    t.append(batch("a", 0L, 10))
    t.append(batch("a", 1000L, 10))
    // simulate a crash between delta CAS and sidecar write: delete
    // one commit's sidecar
    val logDir = new java.io.File(t.root, TxTable.LogDirName)
    val sidecars = logDir.listFiles().filter(_.getName.endsWith(".stats"))
    assert(sidecars.length === 2, "each append must publish a sidecar")
    assert(sidecars.minBy(_.getName).delete())
    // the stats-less file survives every bound — degrade, don't drop
    val files = t.snapshot(t.version).files
    val kept = t.pruneFiles(files, Map("ts" -> ((5000L, 6000L))))
    assert(kept.size === 1 && files.size === 2,
      "only the file WITH stats may be pruned; the stats-less one must be kept")
    assert(t.readPruned(Map("ts" -> ((0L, 5L)))).filter(col("ts") <= 5L).count() === 6L)
  }

  test("vacuum consolidates live stats and pruning survives sidecar GC") {
    val t = table()
    (0 until 6).foreach(i => t.append(batch("a", i * 1000L, 10)))
    val before = t.pruneFiles(t.snapshot(t.version).files,
      Map("ts" -> ((3000L, 3009L))))
    t.vacuum(retainVersions = 2, retainAgeMillis = 0L)
    val logDir = new java.io.File(t.root, TxTable.LogDirName)
    assert(logDir.listFiles().exists(_.getName.endsWith(".statsck")),
      "vacuum must consolidate live-file stats at the horizon")
    val after = t.pruneFiles(t.snapshot(t.version).files,
      Map("ts" -> ((3000L, 3009L))))
    assert(after.map(_.path).toSet === before.map(_.path).toSet,
      "pruning must be unchanged across vacuum's sidecar GC")
    assert(t.readPruned(Map("ts" -> ((3000L, 3009L))))
      .filter(col("ts").between(3000L, 3009L)).count() === 10L)
  }

  test("vacuum through a statsCols-less handle still consolidates live stats") {
    // statsCols is a per-HANDLE param, not persisted table state: a
    // maintenance job opening the table without it must carry the
    // existing sidecars' stats across its sidecar GC, not discard
    // live files' pruning metadata
    val t = table()
    (0 until 6).foreach(i => t.append(batch("a", i * 1000L, 10)))
    val before = t.pruneFiles(t.snapshot(t.version).files,
      Map("ts" -> ((3000L, 3009L))))
    val bare = new TxTable(spark, t.root) // no statsCols
    bare.vacuum(retainVersions = 2, retainAgeMillis = 0L)
    val logDir = new java.io.File(t.root, TxTable.LogDirName)
    assert(logDir.listFiles().exists(_.getName.endsWith(".statsck")),
      "consolidation must run whenever sidecars exist, regardless of the handle's statsCols")
    val after = t.pruneFiles(t.snapshot(t.version).files,
      Map("ts" -> ((3000L, 3009L))))
    assert(after.map(_.path).toSet === before.map(_.path).toSet,
      "pruning must survive a vacuum run through a statsCols-less handle")
  }

  test("rewritten partitions re-publish stats for their reshaped files") {
    val t = table()
    t.append(batch("a", 0L, 50))
    t.rewritePartitions(Set("a")) { cur => cur.filter(col("ts") >= 25L) }
    val files = t.snapshot(t.version).files
    // the rewrite replaced partition a's file; its new file must be
    // prunable by the post-rewrite range
    assert(t.pruneFiles(files, Map("ts" -> ((0L, 10L)))).isEmpty,
      "rows 0..24 are gone; the reshaped file's stats must reflect that")
    assert(t.pruneFiles(files, Map("ts" -> ((30L, 40L)))).size === files.size)
  }

  test("z-ordered appends make SEVERAL columns prunable at once") {
    val t = new TxTable(spark,
      java.nio.file.Files.createTempDirectory("txz").toString,
      statsCols = Seq("x", "y"))
    val pts = spark.range(100000).select(
      (col("id") % 1024L).as("x"),
      ((col("id") * 2654435761L) % 1024L).as("y"),
      lit("a").as("p_date"))
    val z = ZOrder.zValue(Seq(
      ZOrder.rangeBucket(col("x"), 0L, 1023L, 10),
      ZOrder.rangeBucket(col("y"), 0L, 1023L, 10)), 10)
    t.append(pts.withColumn("__z", z)
      .repartitionByRange(16, col("__z"))
      .sortWithinPartitions(col("__z")).drop("__z"))

    val files = t.snapshot(t.version).files
    assert(files.size === 16)
    // a 1/4 y-slice with x unconstrained: impossible to prune under a
    // single-column x sort, <= half the files under the z layout
    val ySlice = t.pruneFiles(files, Map("y" -> ((0L, 255L))))
    assert(ySlice.size <= 8, s"y-slice should prune z-ordered files: ${ySlice.size}/16")
    // a 2-D box touches a corner of the grid
    val box = t.pruneFiles(files, Map("x" -> ((0L, 255L)), "y" -> ((0L, 255L))))
    assert(box.size <= 4, s"quarter-box should touch few files: ${box.size}/16")
    // and the pruned read answers exactly
    val got = t.readPruned(Map("x" -> ((0L, 255L)), "y" -> ((0L, 255L))))
      .filter(col("x") < 256L && col("y") < 256L).count()
    val want = t.read().filter(col("x") < 256L && col("y") < 256L).count()
    assert(got === want)
  }

  test("compactZOrdered: fragmented appends become few multi-column-prunable files") {
    val t = new TxTable(spark,
      java.nio.file.Files.createTempDirectory("txzc").toString,
      statsCols = Seq("x", "y"))
    // 24 small unordered appends — the streaming-ingest fragmentation
    // pattern: every file spans the whole (x, y) space, so NOTHING
    // prunes before compaction
    (0 until 24).foreach { r =>
      t.append(spark.range(r * 2000L, (r + 1) * 2000L).select(
        (col("id") % 1024L).as("x"),
        ((col("id") * 2654435761L) % 1024L).as("y"),
        lit("a").as("p_date")).coalesce(1))
    }
    val before = t.snapshot(t.version).files
    assert(before.size === 24)
    val beforeBox = t.pruneFiles(before, Map("x" -> ((0L, 255L)), "y" -> ((0L, 255L))))
    assert(beforeBox.size === 24, "unordered small files span the space — no pruning")
    val wantBox = t.read().filter(col("x") < 256L && col("y") < 256L).count()

    val rewrote = t.compactZOrdered(
      Seq(("x", 0L, 1023L), ("y", 0L, 1023L)), bitsPer = 10,
      maxFilesPerPartition = 8, filesPerPartition = 16)
    assert(rewrote === Set("a"))
    val after = t.snapshot(t.version).files
    assert(after.size === 16, s"compaction must hit the file-count constant: ${after.size}")
    // the SAME box now touches a corner of the Morton grid
    val afterBox = t.pruneFiles(after, Map("x" -> ((0L, 255L)), "y" -> ((0L, 255L))))
    assert(afterBox.size <= 4,
      s"quarter-box should touch few z-compacted files: ${afterBox.size}/16")
    // content identical, pruned read exact
    assert(t.read().count() === 48000L)
    val got = t.readPruned(Map("x" -> ((0L, 255L)), "y" -> ((0L, 255L))))
      .filter(col("x") < 256L && col("y") < 256L).count()
    assert(got === wantBox)

    // idempotent below the threshold: already-compacted partitions
    // are left alone
    assert(t.compactZOrdered(Seq(("x", 0L, 1023L), ("y", 0L, 1023L)),
      bitsPer = 10, maxFilesPerPartition = 16, filesPerPartition = 4).isEmpty)
  }
}
