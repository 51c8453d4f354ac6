package graft.ops

import graft.SparkSpec
import graft.storage.ZOrder
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property tests for the round-11 operators, each
  * against a brute-force in-memory reference over random inputs.
  * Fixed seeds → reproducible failures.
  */
class Round11PropSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("kmv_mins ≡ sorted-distinct-take-k under any partitioning") {
    for (seed <- 1L to 5L) {
      val vals = sample(Gen.listOfN(400,
        Gen.choose(0, 120).map(i => s"v_$i")), seed) // heavy duplication
      val k = 16
      for (parts <- Seq(1, 3, 32)) {
        val df = vals.map((0L, _)).toDF("g", "v").repartition(parts)
        val got = graft.llm.Sketches.kmvMins(df, col("g"), col("v"), k)
          .select("u").as[Double].collect().sorted.toSeq
        val want = vals.distinct
          .map(v => Seq(v).toDF("x")
            .select(graft.llm.Sketches.hashUniform(col("x"))).as[Double].head())
        val wantK = want.distinct.sorted.take(k)
        assert(got === wantK,
          s"seed=$seed parts=$parts: bounded aggregate must equal sorted-distinct-take-k")
      }
    }
  }

  test("intervalJoin ≡ naive range join on random intervals and points") {
    for (seed <- 2L to 6L) {
      val ivs = sample(Gen.listOfN(40, for {
        k <- Gen.oneOf("a", "b", "c")
        lo <- Gen.choose(0L, 2000L)
        len <- Gen.choose(0L, 600L)
      } yield (k, lo, lo + len)), seed)
        .zipWithIndex.map { case ((k, lo, hi), i) => (k, i.toLong, lo, hi) }
      val pts = sample(Gen.listOfN(200, for {
        k <- Gen.oneOf("a", "b", "c")
        t <- Gen.choose(0L, 2600L)
      } yield (k, t)), seed + 100)
      val ivDf = ivs.toDF("k", "iid", "lo", "hi")
      val ptDf = pts.toDF("k", "t")
      for (band <- Seq(1L, 100L, 5000L)) { // tiny, sane, oversized bands
        val got = Analytics.intervalJoin(ptDf, ivDf, Seq("k"),
            col("t"), col("lo"), col("hi"), band)
          .select("k", "t", "iid").as[(String, Long, Long)].collect().sorted.toSeq
        val want = (for {
          (pk, t) <- pts
          (ik, iid, lo, hi) <- ivs
          if pk == ik && t >= lo && t <= hi
        } yield (pk, t, iid)).sorted
        assert(got === want, s"seed=$seed band=$band")
      }
    }
  }

  test("zValue is monotone per dimension and a bijection on the grid") {
    val bits = 5
    val grid = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val zs = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zValue(Seq(col("x"), col("y")), bits).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(zs.map(_._3).distinct.length === grid.length, "Morton codes collide")
    assert(zs.forall { case (_, _, z) => z >= 0 && z < (1L << (2 * bits)) })
    val byXy = zs.map { case (x, y, z) => (x, y) -> z }.toMap
    // fixing one coordinate, the code is strictly increasing in the other
    for (x <- 0L until 32L) {
      val row = (0L until 32L).map(y => byXy((x, y)))
      assert(row === row.sorted, s"z not monotone in y at x=$x")
    }
    for (y <- 0L until 32L) {
      val colv = (0L until 32L).map(x => byXy((x, y)))
      assert(colv === colv.sorted, s"z not monotone in x at y=$y")
    }
  }

  test("funnel ≡ a sequential in-memory fold on random event streams") {
    val stages = Seq("s0", "s1", "s2")
    for (seed <- 3L to 7L) {
      val evs = sample(Gen.listOfN(300, for {
        k <- Gen.choose(0, 9)
        t <- Gen.choose(0L, 500L) // collisions likely: ties exercised
        s <- Gen.oneOf(stages)
      } yield (s"k$k", t, s)), seed)
      val got = Analytics.funnel(evs.toDF("k", "t", "s"), Seq("k"),
          col("t"), col("s"), stages)
        .collect().map(r => r.getAs[String]("k") ->
          ((Option(r.get(r.fieldIndex("t0"))), Option(r.get(r.fieldIndex("t1"))),
            Option(r.get(r.fieldIndex("t2")))))).toMap
      for ((k, rows) <- evs.groupBy(_._1)) {
        val t0 = rows.filter(_._3 == "s0").map(_._2).minOption
        val t1 = t0.flatMap(a => rows.filter(e => e._3 == "s1" && e._2 > a)
          .map(_._2).minOption)
        val t2 = t1.flatMap(a => rows.filter(e => e._3 == "s2" && e._2 > a)
          .map(_._2).minOption)
        assert(got(k) === ((t0, t1, t2)), s"seed=$seed key=$k")
      }
    }
  }
}
