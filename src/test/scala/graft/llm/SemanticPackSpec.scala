package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Packing.groupedRank]] and [[Similarity.semanticOrder]] — the
  * two-level global rank and its semantic-packing composition. Pins
  * rank ≡ the single-window reference, contiguity, cluster-adjacency
  * (every cell occupies one contiguous rank span), and partition
  * determinism.
  */
class SemanticPackSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("groupedRank equals the single-window global rank") {
    val rows = (1L to 120L).map(i => (s"g${i % 5}", i, (i * 37) % 41))
    val df = rows.toDF("g", "id", "s")
    val got = Packing.groupedRank(df, "g", Seq(col("s").desc, col("id")))
      .select(col("id"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.sortBy { case (g, id, s) => (g, -s, id) }
      .zipWithIndex.map { case ((_, id, _), r) => id -> r.toLong }.toMap
    assert(got === expected)
  }

  test("groupedRank is dense and 0-based") {
    val df = Seq(("a", 1L, 9L), ("b", 2L, 1L), ("a", 3L, 2L)).toDF("g", "id", "s")
    val ranks = Packing.groupedRank(df, "g", Seq(col("s"), col("id")))
      .select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == Seq(0L, 1L, 2L))
  }

  test("semanticOrder: contiguous ranks, cells in contiguous spans, csim desc within cell") {
    val vecs = (0L until 40L).map { i =>
      // four well-separated clusters on distinct axes + noise ordering
      val axis = (i % 4).toInt
      val v = Array.fill(8)(0.0f)
      v(axis) = 1.0f
      v((axis + 4) % 8) = (i % 7).toFloat / 100.0f
      (i, v.toSeq)
    }
    val df = vecs.toDF("id", "v")
    val out = Similarity.semanticOrder(df, col("id"), col("v"), k = 4, iters = 3)
      .orderBy("rank").collect()
    val ranks = out.map(_.getLong(3)).toSeq
    assert(ranks == (0L until 40L).toSeq)
    // each cell's ranks form one contiguous block
    val byCell = out.groupBy(_.getInt(1)).values
    byCell.foreach { rows =>
      val rs = rows.map(_.getLong(3)).sorted
      assert(rs.last - rs.head + 1 == rs.length, "cell ranks not contiguous")
    }
    // within a cell, csim is non-increasing along rank
    byCell.foreach { rows =>
      val csims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(csims.zip(csims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("partition determinism: 1 vs 4 shuffle partitions agree") {
    val rows = (1L to 200L).map(i => (s"g${i % 7}", i, (i * 13) % 29))
    val df = rows.toDF("g", "id", "s")
    def run() = Packing.groupedRank(df, "g", Seq(col("s"), col("id")))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(run() === a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
