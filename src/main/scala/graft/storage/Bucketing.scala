package graft.storage

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins — the
  * 100 TB answer to "this join shuffles both sides every single run".
  *
  * Writing both fact tables bucketed (and optionally sorted) by the
  * join key with the SAME bucket count makes every later equi-join or
  * groupBy on that key a zero-Exchange plan: Spark's FileSourceScan
  * reports `HashPartitioning(key, n)` straight from the table layout,
  * so EnsureRequirements inserts no shuffle (and with sorted buckets,
  * no per-task Sort before a SortMergeJoin either). The shuffle is
  * paid ONCE at layout time instead of on every query — the same
  * trade the reference makes by keying its hypertables on
  * (exchange, base, quote, time) so range scans and upserts never
  * re-sort (reference scripts/database/init/create.sql:54-55).
  *
  * Scale notes:
  *  - bucket count is a layout constant: pick ≈ (table size /
  *    target partition size) at the LARGEST expected table size, not
  *    today's — both join sides must share it to co-locate (a 2:1
  *    ratio also avoids the shuffle on Spark ≥3.1 via bucket
  *    coalescing, `spark.sql.bucketing.coalesceBucketsInJoin`);
  *  - bucketed writes hash-route rows task-local, so a write task
  *    holding rows of many buckets emits one file per (task, bucket) —
  *    repartition by the bucket key first to get one file per bucket;
  *  - requires a table catalog (`saveAsTable`) — plain
  *    `.parquet(path)` writes drop the bucket metadata.
  */
object Bucketing {

  // the ONE place the bucketed layout is spelled out: initial write and
  // append must build the identical writer chain or their bucket files
  // silently mismatch
  private def save(df: DataFrame, table: String, key: String, buckets: Int,
                   sortCols: Seq[String], mode: String): Unit = {
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(key)
    // one file per bucket: route rows to their bucket's writer task
    val w: DataFrameWriter[Row] = df
      .repartition(buckets, df(key))
      .write.mode(mode).format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
    w.saveAsTable(table)
  }

  /** Write `df` as a bucketed managed parquet table. `sortCols`
    * defaults to the bucket key so merge-join reads skip the sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit =
    save(df, table, key, buckets, sortCols, "overwrite")

  /** Append to an existing bucketed table (layout must match the
    * original `bucketBy`/`sortBy` — Spark rejects a mismatch). Each
    * append writes its own sorted files, so multi-append buckets stay
    * Exchange-free in joins but may re-Sort per task (a merge of
    * sorted runs, not a shuffle).
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int, sortCols: Seq[String] = Nil): Unit =
    save(df, table, key, buckets, sortCols, "append")

  /** Read a bucketed table back (scan exposes the bucket layout). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
