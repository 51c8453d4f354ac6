package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.quantileBuckets]] — CCNet-style value-based per-group
  * quantile bucketing. Pins hand-computed thirds, the ties-share-a-
  * bucket contract (vs ntile's arbitrary split), per-group cutoff
  * independence, degenerate groups, and partition determinism.
  */
class QuantileBucketsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def buckets(rows: Seq[(String, Long, Long)], q: Int = 3): Map[Long, Long] =
    Sampling.quantileBuckets(rows.toDF("g", "id", "s"), "g", "s", q)
      .select(col("id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("nine distinct scores split into exact thirds") {
    val rows = (1L to 9L).map(i => ("g", i, i * 10))
    val b = buckets(rows)
    assert((1L to 3L).forall(b(_) == 1L))
    assert((4L to 6L).forall(b(_) == 2L))
    assert((7L to 9L).forall(b(_) == 3L))
  }

  test("equal scores share a bucket even across a boundary") {
    // six rows, scores 1,2,2,2,2,9: the 1/3 cutoff lands inside the
    // run of 2s — value-based bucketing keeps ALL 2s together
    val rows = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 2L),
      ("g", 4L, 2L), ("g", 5L, 2L), ("g", 6L, 9L))
    val b = buckets(rows)
    assert(b(1L) == 1L)
    assert(Seq(2L, 3L, 4L, 5L).map(b).distinct.size == 1)
    assert(b(6L) == 3L)
  }

  test("groups get independent cutoffs") {
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 4L, 100L), ("b", 5L, 200L), ("b", 6L, 300L))
    val b = buckets(rows)
    assert(b(1L) == 1L && b(2L) == 2L && b(3L) == 3L)
    assert(b(4L) == 1L && b(5L) == 2L && b(6L) == 3L)
  }

  test("single-row and single-value groups land in bucket 1") {
    val rows = Seq(("solo", 1L, 42L),
      ("flat", 2L, 7L), ("flat", 3L, 7L), ("flat", 4L, 7L))
    val b = buckets(rows)
    assert(b(1L) == 1L)
    assert(Seq(2L, 3L, 4L).forall(b(_) == 1L))
  }

  test("quartiles (q=4) on eight distinct scores") {
    val rows = (1L to 8L).map(i => ("g", i, i))
    val b = buckets(rows, q = 4)
    assert(b == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
  }

  test("partition determinism: 1 vs 4 shuffle partitions agree") {
    val rows = (1L to 200L).map(i => (s"g${i % 3}", i, i * 31 % 50))
    val a = buckets(rows)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(buckets(rows) == a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
