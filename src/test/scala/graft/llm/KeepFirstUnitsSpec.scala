package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.keepFirstUnits]] — corpus-wide first-occurrence paragraph
  * dedup: exactly one copy of every distinct unit survives, earliest
  * (doc, pos) wins, original in-document order is preserved.
  */
class KeepFirstUnitsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val docs = Seq(
    (1L, Seq("alpha", "beta")),
    (2L, Seq("beta", "gamma")),
    (3L, Seq("alpha")),
    (4L, Seq("delta", "delta", "epsilon"))).toDF("id", "units")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Dedup.keepFirstUnits(df, col("id"), col("units"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("earliest (doc, pos) occurrence wins; later copies drop everywhere") {
    val m = run(docs)
    assert(m(1L) === (("alpha\nbeta", 2L, 0L)))  // both first occurrences
    assert(m(2L) === (("gamma", 1L, 1L)))        // beta already seen in doc 1
    assert(m(3L) === (("", 0L, 1L)))             // alpha seen; nothing left
  }

  test("within-document duplicates: first position kept, rest dropped") {
    val m = run(docs)
    assert(m(4L) === (("delta\nepsilon", 2L, 1L)))
  }

  test("every unit survives exactly once corpus-wide") {
    val total = run(docs).values.map(_._2).sum
    assert(total === 5L) // alpha, beta, gamma, delta, epsilon
  }

  test("deterministic across input partitioning") {
    assert(run(docs) === run(docs.repartition(7)))
  }
}
