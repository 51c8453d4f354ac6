package graft.catalog

import graft.SparkSpec

/** `ts_granger` invariants on the sf0.001 fixture (value parity is
  * the DuckDB oracle's job): F-statistics of nested models are
  * non-negative, the panel is all ordered pairs with enough overlap,
  * and no pair regresses on itself.
  */
class GrangerSpec extends SparkSpec {

  test("ts_granger: F ≥ 0, n > 3, src ≠ tgt, ordered-pair panel") {
    val rows = MicrostructureQueries.queries("ts_granger")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    rows.foreach { r =>
      assert(r.getString(0) !== r.getString(1))
      assert(r.getLong(2) > 3L)
      // RSS_restricted ≥ RSS_full for nested OLS ⇒ F ≥ 0 (r4 can
      // round a true tiny positive down to -0.0/0.0, never below -1e-4)
      assert(r.getDouble(5) >= -1e-4, s"negative F: $r")
    }
  }
}
