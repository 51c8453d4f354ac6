package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.keepBest]] and [[Dedup.snapshotDiff]]. Pins argmax-quality
  * survivor selection with deterministic ties, cluster counts, and
  * the four diff statuses with their edges.
  */
class KeepBestDiffSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("keepBest keeps the highest-quality member per cluster") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "label")
    val quality = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (7L, 0.1), (8L, 0.1))
      .toDF("id", "q")
    val out = Dedup.keepBest(labels, quality, col("id"), col("q"))
      .orderBy("label").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq((1L, 2L, 3L), (7L, 7L, 2L))) // cluster 7 ties 0.1/0.1 → min id 7
  }

  test("keepBest output count equals cluster count") {
    val labels = (1L to 30L).map(i => (i, i % 5)).toDF("id", "label")
    val quality = (1L to 30L).map(i => (i, (i * 17 % 7).toDouble)).toDF("id", "q")
    val out = Dedup.keepBest(labels, quality, col("id"), col("q"))
    assert(out.count() == 5)
    assert(out.agg(sum("n_members")).as[Long].collect().head == 30L)
  }

  test("snapshotDiff labels all four statuses") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val neu = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("id", "t")
    val out = Dedup.snapshotDiff(old, neu, col("id"), md5(col("t")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff of identical snapshots is all-unchanged") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    val st = Dedup.snapshotDiff(df, df, col("id"), md5(col("t")))
      .select("status").as[String].collect().toSet
    assert(st == Set("unchanged"))
  }

  test("partition determinism: 1 vs 4 shuffle partitions agree") {
    val labels = (1L to 100L).map(i => (i, i % 9)).toDF("id", "label")
    val quality = (1L to 100L).map(i => (i, (i * 31 % 13).toDouble)).toDF("id", "q")
    def run() = Dedup.keepBest(labels, quality, col("id"), col("q"))
      .collect().map(_.toString).sorted.toSeq
    val a = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(run() == a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
