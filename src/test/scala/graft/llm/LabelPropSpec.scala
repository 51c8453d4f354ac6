package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphOps.labelPropagate]] semantics: synchronous rounds, majority
  * with (count desc, label asc) tie-break, immutable seeds, one-hop
  * spread per round, off-graph seeds ignored.
  */
class LabelPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def run(pairs: Seq[(Long, Long)], seeds: Seq[(Long, String)],
                  rounds: Int): Map[Long, (Option[String], Boolean)] =
    GraphOps.labelPropagate(pairs.toDF("a", "b"), col("a"), col("b"),
        seeds.toDF("id", "lab"), col("id"), col("lab"), rounds)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getBoolean(2)))).toMap

  test("equal-count tie breaks to the lexicographically smaller label") {
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L -> "b", 3L -> "a"), 1)
    assert(got(2L) === ((Some("a"), false)))
    assert(got(1L) === ((Some("b"), true)))   // seeds keep their labels
    assert(got(3L) === ((Some("a"), true)))
  }

  test("majority wins over tie-break order") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val got = run(pairs, Seq(2L -> "z", 3L -> "z", 4L -> "a"), 1)
    assert(got(1L)._1 === Some("z"))          // 2×z beats 1×a
  }

  test("labels spread one hop per round; unreached nodes stay null") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = run(chain, Seq(1L -> "x"), 1)
    assert(r1(2L)._1 === Some("x") && r1(3L)._1 === None)
    val r2 = run(chain, Seq(1L -> "x"), 2)
    assert(r2(3L)._1 === Some("x") && r2(4L)._1 === None)
  }

  test("off-graph seeds are ignored; graph nodes all reported") {
    val got = run(Seq((1L, 2L)), Seq(1L -> "x", 99L -> "y"), 1)
    assert(got.keySet === Set(1L, 2L))
    assert(got(2L)._1 === Some("x"))
  }
}
