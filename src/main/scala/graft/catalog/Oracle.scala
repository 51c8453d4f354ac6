package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers used by every oracle-checked query.
  *
  * The driver hash-compares our parquet output against DuckDB, so
  * floating-point results must be bit-identical, not just close:
  *
  *  - Monetary/value columns in the testdata are exact 2-dp decimals
  *    stored as doubles. [[cents]] lifts them to exact Longs so sums /
  *    averages are integer-exact and engine-order-independent —
  *    mirrors the reference's exact NUMERIC arithmetic
  *    (scripts/database/init/create.sql:17-21).
  *  - For genuinely irrational results (log returns, ratios) [[r4]]
  *    applies floor(x*1e4+0.5)/1e4 — the same primitive IEEE ops in
  *    both engines, unlike round() whose tie-breaking differs. This is
  *    the engine-portable analog of the reference's 4-dp boundary
  *    rounding (common/helpers/numbers.py:7-23).
  */
object Oracle {
  /** Exact 2-dp double → Long in hundredths. */
  def cents(c: Column): Column = floor(c * 100d + 0.5d)

  /** SQL twin of [[cents]]. */
  def centsSql(e: String): String = s"CAST(floor(($e) * 100 + 0.5) AS BIGINT)"

  /** Engine-portable 4-dp half-up rounding for irrational doubles. */
  def r4(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d

  /** SQL twin of [[r4]]. */
  def r4Sql(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"

  /** Exact revenue term: extendedprice*(1-discount) in ten-thousandths. */
  def revenueTenK(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  def revenueTenKSql(price: String, discount: String): String =
    s"${centsSql(price)} * (100 - ${centsSql(discount)})"
}
