package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test: [[Packing.packSequences]] vs an
  * in-memory greedy reference over random (sparse-id, skewed-length)
  * corpora — the two-level distributed prefix sum must agree with the
  * sequential definition on every generated case, for every shard
  * count. Fixed seeds → reproducible failures.
  */
class PackingPropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val docGen = for {
    id <- Gen.choose(0L, 5000L)   // sparse, non-contiguous ids
    n <- Gen.frequency(
      (5, Gen.choose(1L, 30L)),   // typical docs
      (2, Gen.const(0L)),         // empties (must vanish)
      (1, Gen.choose(200L, 400L)) // giants spanning many sequences
    )
  } yield (id, n)

  test("distributed packing equals the sequential reference for every shard count") {
    val seqLen = 64L
    for (seed <- 1L to 4L) {
      val docs = Gen.listOfN(150, docGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
        .groupBy(_._1).map(_._2.head).toSeq // unique ids
      val df = docs.toDF("doc_id", "n_tok")

      // sequential definition: tokens end-to-end in doc_id order
      var off = 0L
      val want = docs.sortBy(_._1).flatMap { case (id, n) =>
        if (n <= 0) Seq.empty
        else {
          val strt = off; off += n
          (strt / seqLen to (off - 1) / seqLen).map { s =>
            (id, s, math.max(strt, s * seqLen) - strt,
              math.min(off, (s + 1) * seqLen) - math.max(strt, s * seqLen))
          }
        }
      }.toSet

      for (shards <- Seq(1, 7, 32)) {
        val got = Packing.packSequences(df, col("doc_id"), col("n_tok"),
            seqLen, shards = shards)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got === want, s"seed=$seed shards=$shards diverged from the sequential packing")
      }
    }
  }
}
