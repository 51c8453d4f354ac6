package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphOps.pageRank]] against an in-memory reference iteration. */
class PageRankSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  /** The exact quantized update the operator performs. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        d: Double = 0.85): Map[Long, Double] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size
    var r = deg.keys.map(_ -> 1.0 / n.toDouble).toMap
    for (_ <- 1 to iters) {
      val sq = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => math.floor(r(e._1) / deg(e._1).toDouble * 1e12).toLong).sum
      }
      r = deg.keys.map(v =>
        v -> ((1.0 - d) / n.toDouble + d * (sq.getOrElse(v, 0L).toDouble / 1e12))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    GraphOps.pageRank(edges.toDF("a", "b"), col("a"), col("b"), iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("path graph: center outranks symmetric endpoints; exact vs reference") {
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = run(edges, 3)
    val want = reference(edges, 3)
    assert(got.view.mapValues(_._2).toMap === want)
    assert(got(1L)._2 === got(3L)._2)         // symmetry is exact
    assert(got(2L)._2 > got(1L)._2)           // hub centrality
    assert(got(1L)._1 === 1L && got(2L)._1 === 2L) // degrees
  }

  test("star graph: hub collects the leaves' mass; totals conserved") {
    val edges = (2L to 6L).map(i => (1L, i))
    val got = run(edges, 4)
    val leaves = (2L to 6L).map(got(_)._2)
    assert(leaves.distinct.size === 1)        // identical leaves, exactly
    assert(got(1L)._2 > leaves.head * 2)
    // symmetric graph has no dangling mass; only the pico-floor leaks
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("duplicate and reversed input pairs collapse to one edge") {
    val a = run(Seq((1L, 2L), (2L, 1L), (1L, 2L)), 2)
    val b = run(Seq((1L, 2L)), 2)
    assert(a === b)
  }
}
