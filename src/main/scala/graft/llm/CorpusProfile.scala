package graft.llm

import graft.storage.TxTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained corpus profile — sketch state kept NEXT TO
  * the corpus so per-group statistics update in O(new data) per
  * increment instead of re-scanning history. The sketches earn their
  * place here by their merge laws:
  *
  *  - HLL registers are monotone MAXES → max-merge; folding an
  *    increment is exact AND idempotent (re-appending a crashed
  *    increment's registers changes nothing);
  *  - count-min cells are commutative SUMS → sum-merge; exact, but an
  *    increment must fold exactly once (callers gate on the table
  *    version or the change feed, the [[IncrementalDedup.admitStream]]
  *    discipline).
  *
  * Storage is log-structured over a [[TxTable]] partitioned by the
  * group column: each increment APPENDS its batch-local sketch rows
  * (never reads the state — O(new data) always), the serving views
  * merge at read time (O(appended rows), bounded by increments ×
  * sketch size, never by corpus size), and [[compactMerged]]
  * periodically collapses each group's log to its merged rows so the
  * read cost resets. Estimates off the merged view equal the
  * single-pass batch sketch over the union of all increments EXACTLY
  * (spec-pinned) — the property that makes a 100 TB profile
  * maintainable per-day and queryable per-hour without ever touching
  * history.
  */
object CorpusProfile {

  /** Append one increment's HLL registers (table rows: g, bucket, m).
    * Build the state as `new TxTable(spark, dir, partitionCol = "g")`.
    */
  def appendHll(state: TxTable, batch: DataFrame,
                group: Column, value: Column): Long =
    state.append(Sketches.hllRegisters(batch, group, value))

  /** The live distinct-count estimates: max-merge the register log,
    * then the standard estimate — (g, est, v_zero).
    */
  def hllView(state: TxTable): DataFrame =
    Sketches.hllFromRegisters(
      state.read().groupBy(col("g"), col("bucket")).agg(max(col("m")).as("m")))

  /** Append one increment's count-min cells (rows: g, r, b, c). */
  def appendCm(state: TxTable, batch: DataFrame, group: Column,
               value: Column, weight: Column = lit(1L)): Long =
    state.append(Sketches.countMin(batch, group, value, weight))

  /** The live frequency sketch: sum-merge the cell log. Feed the
    * result to [[Sketches.countMinLookup]] for point estimates.
    */
  def cmView(state: TxTable): DataFrame =
    state.read().groupBy(col("g"), col("r"), col("b")).agg(sum(col("c")).as("c"))

  /** Collapse every group's appended log to its merged rows — resets
    * the view's read cost to one row set per group. `merge` is the
    * same aggregation the view applies (max for registers, sum for
    * cells); running it through [[TxTable.rewritePartitions]] keeps
    * the fold transactional per group partition.
    */
  def compactMerged(state: TxTable)(merge: DataFrame => DataFrame): Set[String] = {
    if (state.version < 0) return Set.empty
    val parts = state.read()
      .select(col(state.partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    if (parts.nonEmpty) state.rewritePartitions(parts)(merge)
    parts
  }

  /** [[compactMerged]] with the register max-merge. */
  def compactHll(state: TxTable): Set[String] =
    compactMerged(state)(
      _.groupBy(col("g"), col("bucket")).agg(max(col("m")).as("m")))

  /** [[compactMerged]] with the cell sum-merge. */
  def compactCm(state: TxTable): Set[String] =
    compactMerged(state)(
      _.groupBy(col("g"), col("r"), col("b")).agg(sum(col("c")).as("c")))
}
