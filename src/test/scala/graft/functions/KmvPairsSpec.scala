package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[KmvPairsAgg]] — the bounded (hash, payload) min-k sample. */
class KmvPairsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def df(rows: Seq[(String, Long, Long)]) =
    rows.toDF("g", "h", "v")

  test("k >= group size returns every payload in (hash, payload) order") {
    val rows = Seq(("a", 30L, 300L), ("a", 10L, 100L), ("a", 20L, 200L))
    val out = df(rows).groupBy("g")
      .agg(KmvAgg.kmvPairs(col("h"), col("v"), 8).as("vs"))
      .select("vs").as[Seq[Long]].head()
    assert(out == Seq(100L, 200L, 300L))
  }

  test("k bounds the sample to the k smallest hashes, payloads ride along") {
    val rows = (0 until 100).map(i => ("a", (100 - i).toLong, i.toLong))
    val out = df(rows).groupBy("g")
      .agg(KmvAgg.kmvPairs(col("h"), col("v"), 10).as("vs"))
      .select("vs").as[Seq[Long]].head()
    // smallest hashes 1..10 belong to payloads 99 down to 90
    assert(out == (99L to 90L by -1L))
  }

  test("hash ties order by payload; identical pairs dedup") {
    val rows = Seq(("a", 5L, 20L), ("a", 5L, 10L), ("a", 5L, 10L), ("a", 7L, 1L))
    val out = df(rows).groupBy("g")
      .agg(KmvAgg.kmvPairs(col("h"), col("v"), 3).as("vs"))
      .select("vs").as[Seq[Long]].head()
    assert(out == Seq(10L, 20L, 1L))
  }

  test("result is partitioning-invariant (map-side partial merge)") {
    val rows = (0 until 5000).map { i =>
      (s"g${i % 7}", (i * 2654435761L) % 1000003L, i.toLong)
    }
    val one = df(rows).repartition(1).groupBy("g")
      .agg(KmvAgg.kmvPairs(col("h"), col("v"), 64).as("vs"))
      .orderBy("g").select("vs").as[Seq[Long]].collect()
    val many = df(rows).repartition(32).groupBy("g")
      .agg(KmvAgg.kmvPairs(col("h"), col("v"), 64).as("vs"))
      .orderBy("g").select("vs").as[Seq[Long]].collect()
    assert(one.toSeq == many.toSeq)
    assert(one.forall(_.size == 64))
  }

  test("nulls on either child are skipped") {
    val out = Seq(("a", Some(1L), Some(10L)), ("a", None, Some(20L)),
        ("a", Some(2L), None))
      .toDF("g", "h", "v").groupBy("g")
      .agg(KmvAgg.kmvPairs(col("h"), col("v"), 8).as("vs"))
      .select("vs").as[Seq[Long]].head()
    assert(out == Seq(10L))
  }
}
