package graft.catalog

import graft.SparkSpec

/** Shape/invariant checks for the round-14c catalog queries on the
  * sf0.001 fixture (value-level parity is the DuckDB oracle's job —
  * these pin the invariants a refactor could silently break).
  */
class SimGraphQueriesSpec extends SparkSpec {

  test("ts_gini: coefficients in [0,1), one row per event type, " +
       "exact integer totals") {
    val rows = SimGraphQueries.queries("ts_gini")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val gini = r.getDouble(3)
      assert(gini >= 0.0d && gini < 1.0d, s"gini out of range: $r")
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L)
    }
  }

  test("llm_readability: syllables ≥ words ≥ 1, sentences ≥ 1, " +
       "FRE bounded above by the formula's constant") {
    val rows = SimGraphQueries.queries("llm_readability")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, sy) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1L && s >= 1L && sy >= w) // ≥1 syllable per word
      assert(r.getDouble(4) <= 206.835d + 1e-9)
    }
  }

  test("ts_benford: chi² ≥ 0, ≤9 digit cells, one row per event type") {
    val rows = SimGraphQueries.queries("ts_benford")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 9L)
      assert(r.getDouble(3) >= 0.0d, s"negative chi2: $r")
    }
  }

  test("llm_lsh_recall: planted pairs are recovered; counts consistent") {
    val r = SimGraphQueries.queries("llm_lsh_recall")(spark, sfDir)
      .collect()(0)
    val (planted, found, returned, extra, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(planted > 0L && found <= planted)
    assert(extra === returned - found && extra >= 0L)
    // truncating 3 words of ~50 leaves Jaccard ≈ 0.9 ≫ the 0.5
    // threshold: the pipeline must recover essentially all plants
    assert(recall >= 0.9d, s"LSH pipeline missing planted dups: $r")
  }

  test("llm_allpairs_sim: every emitted pair clears the threshold and " +
       "each planted near-copy finds its source") {
    val rows = SimGraphQueries.queries("llm_allpairs_sim")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.7d - 1e-4)
    }
    // planted copies are doc_id+100000 for doc_id % 5 == 0; each must
    // pair with its source (last-3-words truncation keeps cosine high)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = pairs.collect {
      case (a, b) if b === a + 100000L => a
    }
    assert(planted.nonEmpty)
  }
}
