package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for MULTI-column data skipping —
  * the companion lever to [[Bucketing]]: bucketing kills the join
  * shuffle for one key; z-ordering makes parquet min/max footer stats
  * selective on SEVERAL filter columns at once, which a single-column
  * sort structurally cannot do (sorting by x makes every file span the
  * full y range, so a y-predicate prunes nothing). The same layout
  * trade as the public Delta `OPTIMIZE ZORDER BY` — paid once at write
  * time, repaid by every scan with 2-D/3-D predicates (symbol ×
  * time-range, cell × length, source × quality-bucket).
  *
  * Mechanics: each layout column is first reduced to a `bits`-wide
  * integer bucket index ([[rangeBucket]] — rank-free linear binning
  * against fixed [lo, hi] layout bounds, a layout CONSTANT like
  * [[Bucketing]]'s bucket count, so appends interleave identically
  * without rescanning history); [[zValue]] bit-interleaves the bucket
  * indexes into one Long (x₀y₀x₁y₁…, the Morton code — pure integer
  * shifts, engine- and partitioning-exact); the write range-partitions
  * and sorts by that Long, so every output file covers one compact
  * Morton range = one small hyper-rectangle of the value space, and
  * each file's min/max stats are tight on EVERY layout column. The
  * curve key is dropped before writing — the layout leaves no schema
  * footprint.
  *
  * Scale notes: interleaving is a projection (no shuffle of its own);
  * the write's range partitioning is the one layout shuffle, identical
  * in cost class to the repartition any bucketed/sorted write already
  * pays. File count is a layout constant: pick ≈ table size / target
  * file size at the largest expected table. Skipping effectiveness for
  * a box query degrades gracefully to the classic Morton bound
  * (O(perimeter) boundary files); ZOrderSpec measures it against a
  * single-column sort on the same data.
  */
object ZOrder {

  /** `bits`-wide bucket index of `c` against fixed layout bounds
    * [lo, hi]: linear binning, clamped at both ends so out-of-bounds
    * appends degrade (edge buckets widen) rather than break. Integer
    * arithmetic on a Long-cast column — engine-exact.
    */
  def rangeBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, s"rangeBucket: empty range [$lo, $hi]")
    require(bits >= 1 && bits <= 20, s"rangeBucket: bits out of range: $bits")
    val n = 1L << bits
    // integral div — Column `/` is double division, which loses
    // exactness once (v−lo)·n crosses 2^53 (µs timestamps do)
    val idx = call_function("div",
      (c.cast("long") - lit(lo)) * lit(n), lit(hi - lo + 1L))
    greatest(lit(0L), least(lit(n - 1L), idx))
  }

  /** Morton code of pre-bucketed indexes: bit i of column j lands at
    * position i·|cols| + j. `bitsPer·cols.size` must fit a Long sign-
    * safely (≤ 62). Pure shifts and ORs — a codegen-friendly
    * projection.
    */
  def zValue(bucketCols: Seq[Column], bitsPer: Int): Column = {
    require(bucketCols.nonEmpty, "zValue needs at least one column")
    require(bitsPer * bucketCols.size <= 62,
      s"zValue: ${bucketCols.size} cols × $bitsPer bits overflows a Long")
    val n = bucketCols.size
    bucketCols.zipWithIndex.map { case (c, j) =>
      (0 until bitsPer).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as `files` parquet files range-partitioned and sorted
    * by the Morton code of `cols` (each `(column, lo, hi)` a layout
    * bound). The curve key is internal — dropped before the write.
    */
  def writeZOrdered(df: DataFrame, path: String,
                    cols: Seq[(Column, Long, Long)], bitsPer: Int,
                    files: Int): Unit = {
    val z = zValue(cols.map { case (c, lo, hi) =>
      rangeBucket(c, lo, hi, bitsPer) }, bitsPer)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
