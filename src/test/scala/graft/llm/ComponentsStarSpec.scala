package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Dedup.componentsStar]] — the large-star/small-star long-chain
  * fallback — against closed-form component labels and against
  * [[Dedup.components]] run for a full diameter's worth of rounds.
  */
class ComponentsStarSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph: every node labels to the chain head in O(log) rounds") {
    // 3 disjoint 32-node chains; min-label propagation would need 31
    // rounds, the star contraction's cap of 15 forces the log path
    val edges = (0L until 96L).filter(i => i % 32 != 31).map(i => (i, i + 1))
      .toDF("a", "b")
    val got = labelsOf(Dedup.componentsStar(edges, col("a"), col("b"), maxRounds = 15))
    val want = (0L until 96L).map(i => i -> (i / 32) * 32).toMap
    assert(got === want)
  }

  test("agrees with min-label propagation on a mixed clique+chain+pair graph") {
    val edges = (
      // clique on 100..104
      (for (i <- 100L to 104L; j <- (i + 1) to 104L) yield (i, j)) ++
      // chain 0..8
      (0L until 8L).map(i => (i, i + 1)) ++
      // isolated pair + reversed/duplicate/self edges
      Seq((500L, 400L), (400L, 500L), (7L, 7L), (3L, 2L))
    ).toDF("a", "b")
    val star = labelsOf(Dedup.componentsStar(edges, col("a"), col("b")))
    val prop = labelsOf(Dedup.components(edges, col("a"), col("b"), iters = 10)
      .select(col("id"), col("label")))
    // components() also emits self-loop-only nodes; componentsStar
    // drops self-loops up front — compare on the common support
    assert(star === prop.view.filterKeys(star.contains).toMap)
    assert(star(104L) === 100L && star(8L) === 0L && star(500L) === 400L)
  }

  test("star-shaped input (the near-dup common case) is already a fixpoint") {
    val edges = (1L to 20L).map(i => (0L, i)).toDF("a", "b")
    val got = labelsOf(Dedup.componentsStar(edges, col("a"), col("b"), maxRounds = 3))
    assert(got === (0L to 20L).map(_ -> 0L).toMap)
  }

  test("local contraction ≡ pure star recursion on random multi-partition graphs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 4) {
      val n = 60 + trial * 40
      // random edges + a long chain crossing partitions, scattered so
      // every partition's union-find sees an arbitrary slice
      val raw = Seq.fill(n)((rnd.nextLong(80L), rnd.nextLong(80L))) ++
        (100L until 160L).map(i => (i, i + 1)) ++ Seq((80L * trial % 79, 130L))
      val edges = rnd.shuffle(raw).toDF("a", "b").repartition(7)
      val contracted = labelsOf(
        Dedup.componentsStar(edges, col("a"), col("b")))
      val pure = labelsOf(
        Dedup.componentsStar(edges, col("a"), col("b"), contract = false))
      assert(contracted === pure, s"trial $trial")
    }
  }

  test("under-capped rounds throw instead of returning wrong clusters") {
    val edges = (0L until 64L).filter(_ != 63L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Dedup.componentsStar(edges, col("a"), col("b"), maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
