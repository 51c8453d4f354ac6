package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test: [[Dedup.keepFirstUnits]] vs the
  * sequential definition (fold documents in (doc_id, pos) order,
  * keeping a unit iff its text was never seen before) over random
  * corpora with heavy duplication — the digest-keyed distributed
  * window must agree on every generated case. Fixed seeds →
  * reproducible failures.
  */
class KeepFirstUnitsPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // small unit vocabulary → dense cross-document duplication, the
  // regime where a first-occurrence bug would actually show
  private val docGen = for {
    id <- Gen.choose(0L, 300L)
    units <- Gen.listOf(Gen.oneOf((1 to 12).map(i => s"u$i")))
  } yield (id, units)

  test("distributed keep-first equals the sequential fold") {
    for (seed <- 1L to 4L) {
      val docs = Gen.listOfN(60, docGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
        .groupBy(_._1).map(_._2.head).toSeq // unique doc ids
      val df = docs.map { case (id, us) => (id, us) }.toDF("id", "units")

      // sequential reference; docs with no units emit no row
      val seen = scala.collection.mutable.Set.empty[String]
      val want = docs.sortBy(_._1).collect { case (id, us) if us.nonEmpty =>
        val kept = us.filter(u => seen.add(u))
        id -> ((kept.mkString("\n"), kept.size.toLong, (us.size - kept.size).toLong))
      }.toMap

      val got = Dedup.keepFirstUnits(df.repartition(7), col("id"), col("units"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === want, s"seed=$seed diverged from the sequential keep-first")
    }
  }
}
