package graft.storage

import graft.SparkSpec
import graft.catalog.TimeSeriesQueries
import org.apache.spark.sql.functions._

/** `ts_zorder_pruned` — the physical claim the oracle hash cannot
  * see: the quarter-range time+key box must touch a strict subset of
  * the Z-ordered table's files (file-level stat skipping is live on
  * this read path), while the pruned read still answers exactly.
  */
class ZOrderPrunedQuerySpec extends SparkSpec {

  test("quarter box prunes files; pruned read equals unpruned read") {
    val (t, mn, mx, uMn, uMx) = TimeSeriesQueries.zorderedEvents(spark, sfDir)
    val (tLo, tHi, uLo, uHi) = TimeSeriesQueries.zorderBox(mn, mx, uMn, uMx)
    val files = t.snapshot(t.version).files
    assert(files.size === 16, s"layout should produce 16 files, got ${files.size}")
    val kept = t.pruneFiles(files,
      Map("tus" -> ((tLo, tHi)), "user_id" -> ((uLo, uHi))))
    assert(kept.nonEmpty && kept.size < files.size,
      s"the quarter box must prune z-ordered files: kept ${kept.size}/${files.size}")
    val bounds = Map("tus" -> ((tLo, tHi)), "user_id" -> ((uLo, uHi)))
    val exact = col("tus").between(tLo, tHi) && col("user_id").between(uLo, uHi)
    val got = t.readPruned(bounds).filter(exact)
      .agg(count(lit(1)), sum(col("value"))).head()
    val want = t.read().filter(exact)
      .agg(count(lit(1)), sum(col("value"))).head()
    assert(got === want, "pruning must be a superset guarantee, never a row filter")
  }
}
