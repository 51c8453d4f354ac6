package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphOps.hits]] against an in-memory reference of the exact
  * quantized alternating half-steps.
  */
class HitsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def reference(edges: Seq[(Long, Long)],
                        iters: Int): Map[Long, (Double, Double)] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var h = nodes.map(_ -> 1.0d).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val aq = es.groupBy(_._2).map { case (v, in) =>
        v -> in.map(e => math.floor(h(e._1) * 1e12).toLong).sum
      }
      val at = aq.values.sum
      a = nodes.map(v => v -> aq.getOrElse(v, 0L).toDouble / at.toDouble).toMap
      val hq = es.groupBy(_._1).map { case (u, out) =>
        u -> out.map(e => math.floor(a(e._2) * 1e12).toLong).sum
      }
      val ht = hq.values.sum
      h = nodes.map(v => v -> hq.getOrElse(v, 0L).toDouble / ht.toDouble).toMap
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    GraphOps.hits(edges.toDF("s", "d"), col("s"), col("d"), iters)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("two citers, two sources: prolific citer is the hub, " +
       "well-cited source the authority; exact vs reference") {
    // 3 cites {1,2}, 4 cites {1}: hub(3) > hub(4), auth(1) > auth(2)
    val edges = Seq((3L, 1L), (3L, 2L), (4L, 1L))
    val got = run(edges, 3)
    val want = reference(edges, 3)
    for ((id, (_, _, h, a)) <- got) {
      assert((h, a) === want(id), s"node $id")
    }
    assert(got(3L)._3 > got(4L)._3)     // hub ranking
    assert(got(1L)._4 > got(2L)._4)     // authority ranking
    assert(got(1L)._3 === 0.0d)         // pure sources have no hub mass
    assert(got(3L)._4 === 0.0d)         // pure citers have no authority
    assert(got(3L)._1 === 2L && got(1L)._2 === 2L) // out/in degrees
  }

  test("duplicate edges collapse; L1 normalization holds each side") {
    val a = run(Seq((1L, 2L), (1L, 2L), (3L, 2L)), 2)
    val b = run(Seq((1L, 2L), (3L, 2L)), 2)
    assert(a === b)
    // single authority absorbs everything: exactly 1.0 after L1 norm
    assert(b(2L)._4 === 1.0d)
    assert(math.abs(b.values.map(_._3).sum - 1.0d) < 1e-9)
  }
}
