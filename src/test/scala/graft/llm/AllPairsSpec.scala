package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[AllPairs.cosinePairs]] against the brute-force quantized
  * all-pairs reference — the prefix filter must be lossless for
  * every pair at or above the threshold, including borderline ones.
  */
class AllPairsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  /** Exact quantized brute force mirroring the operator's arithmetic. */
  private def reference(docs: Seq[(Long, Seq[String])], t: Double,
                        dfMin: Int, dfMax: Int): Map[(Long, Long), Long] = {
    val counts = docs.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    }.toMap
    val df = docs.flatMap(_._2.distinct).groupBy(identity)
      .map { case (g, o) => g -> o.size }
    val kept = counts.map { case (id, m) =>
      id -> m.filter { case (g, _) => df(g) >= dfMin && df(g) <= dfMax }
    }
    val wq = kept.map { case (id, m) =>
      val n2 = m.values.map(c => c * c).sum
      id -> m.map { case (g, c) =>
        g -> math.floor(c.toDouble / math.sqrt(n2.toDouble) * 1e6 + 0.5).toLong
      }
    }
    val thr = math.floor(t * 1e12).toLong
    val ids = docs.map(_._1).sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = wq.getOrElse(ids(i), Map.empty[String, Long])
      b = wq.getOrElse(ids(j), Map.empty[String, Long])
      dot = a.keySet.intersect(b.keySet).toSeq.map(g => a(g) * b(g)).sum
      if dot >= thr
    } yield (ids(i), ids(j)) -> dot).toMap
  }

  private def run(docs: Seq[(Long, Seq[String])], t: Double,
                  dfMin: Long, dfMax: Long): Map[(Long, Long), Long] =
    AllPairs.cosinePairs(docs.toDF("id", "ws"), col("id"), col("ws"),
        t, dfMin, dfMax)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("near-copies, partial overlaps, and disjoint docs: " +
       "exact match with brute force, including sub-threshold exclusion") {
    val docs = Seq(
      1L -> Seq("alpha", "beta", "gamma", "delta"),
      2L -> Seq("alpha", "beta", "gamma", "delta"),          // exact dup of 1
      3L -> Seq("alpha", "beta", "gamma", "epsilon"),        // 3/4 overlap
      4L -> Seq("alpha", "beta", "zeta", "eta"),             // 2/4 overlap
      5L -> Seq("theta", "iota", "kappa", "lambda"),         // disjoint-ish
      6L -> Seq("theta", "iota", "kappa", "lambda"),         // dup of 5
      7L -> Seq("mu", "mu", "mu", "alpha"))                  // skewed tf
    val t = 0.7d
    val got = run(docs, t, 1L, 100L)
    val want = reference(docs, t, 1, 100)
    assert(got === want)
    assert(got.contains((1L, 2L)) && got.contains((5L, 6L)))
    assert(got((1L, 2L)) === 1000000000000L)    // unit self-similarity
    assert(!got.contains((1L, 5L)))             // disjoint never qualifies
    // 3/4-overlap uniform vectors: cosine = 0.75 ≥ t must survive the
    // prefix filter — the borderline case a lossy filter would drop
    assert(got.contains((1L, 3L)))
    assert(!got.contains((1L, 4L)))             // cosine 0.5 < t
  }

  test("df band drops hot tokens from the vector space") {
    // 'stop' appears everywhere; with dfMax=2 it is excluded, so the
    // docs only match through their rare tokens
    val docs = Seq(
      1L -> Seq("stop", "rare1"),
      2L -> Seq("stop", "rare1"),
      3L -> Seq("stop", "rare2"))
    val got = run(docs, 0.7d, 1L, 2L)
    assert(got.keySet === Set((1L, 2L)))
  }
}
