package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-contract guards that need no SparkSession: every query has
  * an oracle and vice versa (a missing oracle silently downgrades the
  * driver's hash gate to a rows-only check; an orphan oracle is dead
  * SQL), names are unique across the seven sub-catalogs (Map ++ would
  * otherwise silently shadow one sub-catalog's query with another's),
  * and every oracle is non-empty SQL.
  */
class CatalogConsistencySpec extends AnyFunSuite {

  test("every query has an oracle, every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("sub-catalog names never collide (Map ++ shadows silently)") {
    val subs = Seq(
      "TimeSeriesQueries" -> catalog.TimeSeriesQueries.queries.keySet,
      "RelationalQueries" -> catalog.RelationalQueries.queries.keySet,
      "LlmQueries" -> catalog.LlmQueries.queries.keySet,
      "OhlcvQueries" -> catalog.OhlcvQueries.queries.keySet,
      "IndicatorQueries" -> catalog.IndicatorQueries.queries.keySet,
      "CurationQueries" -> catalog.CurationQueries.queries.keySet,
      "MicrostructureQueries" -> catalog.MicrostructureQueries.queries.keySet,
      "LexicalQueries" -> catalog.LexicalQueries.queries.keySet,
      "SimGraphQueries" -> catalog.SimGraphQueries.queries.keySet,
      "WebQueries" -> catalog.WebQueries.queries.keySet)
    for (Seq((na, a), (nb, b)) <- subs.combinations(2)) {
      val dup = a & b
      assert(dup.isEmpty, s"$na and $nb both define: ${dup.toSeq.sorted}")
    }
    val total = subs.map(_._2.size).sum
    assert(total == SparkEntry.queries.size,
      s"union lost entries: $total sub-catalog names vs ${SparkEntry.queries.size} merged")
  }

  test("oracles are non-empty SQL") {
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(v.trim.nonEmpty && v.toUpperCase.contains("SELECT"), s"$k oracle looks wrong")
    }
  }
}
