package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[CorpusStats.ksPairs]] — exact two-sample KS distance. Pins:
  * hand-computed D on small samples, tie handling across sides (the
  * peer-inclusive RANGE frame must yield full ≤x counts at every
  * row), identical samples at D = 0, one row per unordered pair, and
  * partitioning invariance of the exact numerator.
  */
class KsPairsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def ks(rows: Seq[(String, Long)]) =
    CorpusStats.ksPairs(rows.toDF("g", "x"), $"g", $"x")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap

  test("hand-computed D, including a distinct value present in only one side") {
    // a = [1,2,3], b = [2,4]: D = |F_a(3) - F_b(3)| = 1/2
    val m = ks(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 4L)))
    assert(m(("a", "b")) === ((3L, 2L, 3L, 0.5d)))
  }

  test("ties across sides: counts at a shared x include both sides' jumps") {
    // a = [1,1,2], b = [1,3]: at x=1 the diff is |2*2 - 1*3| = 1,
    // never the phantom intermediate |1*2 - 1*3| or |2*2 - 0*3|;
    // D lands at x=2 with d_num = 3 -> 1/2
    val m = ks(Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L), ("b", 3L)))
    assert(m(("a", "b")) === ((3L, 2L, 3L, 0.5d)))
  }

  test("identical samples give D = 0; three groups give three pairs") {
    val rows = Seq(("a", 5L), ("a", 7L), ("b", 5L), ("b", 7L), ("c", 100L))
    val m = ks(rows)
    assert(m.size === 3)
    assert(m(("a", "b"))._3 === 0L && m(("a", "b"))._4 === 0.0d)
    assert(m(("a", "c"))._4 === 1.0d) // disjoint supports -> D = 1
  }

  test("partitioning invariance: the exact numerator ignores shuffle order") {
    val rows = (1 to 400).map(i => (if (i % 3 == 0) "a" else "b", (i * 37 % 101).toLong))
    val one = CorpusStats.ksPairs(rows.toDF("g", "x").repartition(1), $"g", $"x")
      .select($"d_num").as[Long].head()
    val many = CorpusStats.ksPairs(rows.toDF("g", "x").repartition(13), $"g", $"x")
      .select($"d_num").as[Long].head()
    assert(one === many)
  }
}
