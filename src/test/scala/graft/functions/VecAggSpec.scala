package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class VecAggSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("vecMean: elementwise mean per group") {
    val df = Seq(
      (0, Seq(1.0, 2.0, 3.0)),
      (0, Seq(3.0, 4.0, 5.0)),
      (1, Seq(10.0, 20.0, 30.0))
    ).toDF("cell", "v")
    val out = df.groupBy($"cell").agg(VecAgg.vecMean($"v").as("c"))
      .orderBy($"cell").collect()
    assert(out(0).getSeq[Double](1) == Seq(2.0, 3.0, 4.0))
    assert(out(1).getSeq[Double](1) == Seq(10.0, 20.0, 30.0))
  }

  test("vecMean: matches the posexplode+avg form on float input") {
    val df = Seq(
      (0, Seq(1.5f, 2.25f)), (0, Seq(2.5f, 0.75f)), (1, Seq(-1.0f, 7.0f))
    ).toDF("cell", "v")
    val fast = df.groupBy($"cell")
      .agg(VecAgg.vecMean(transform($"v", x => x.cast("double"))).as("c"))
    val slow = df.select($"cell", posexplode($"v").as(Seq("pos", "x")))
      .groupBy($"cell", $"pos").agg(avg($"x".cast("double")).as("m"))
      .groupBy($"cell")
      .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
        s => s.getField("m")).as("c"))
    assert(fast.orderBy($"cell").collect().toSeq ==
      slow.orderBy($"cell").collect().toSeq)
  }

  test("vecMean: ragged lengths and null elements mirror per-position avg") {
    val df = Seq(
      (0, Seq[java.lang.Double](1.0, null, 2.0)),
      (0, Seq[java.lang.Double](3.0, 6.0)),
      (2, Seq[java.lang.Double]())
    ).toDF("cell", "v")
    val out = df.groupBy($"cell").agg(VecAgg.vecMean($"v").as("c"))
      .orderBy($"cell").collect()
    // pos0: (1+3)/2; pos1: 6/1 (null skipped); pos2: 2/1 (shorter row absent)
    assert(out(0).getSeq[java.lang.Double](1) == Seq(2.0, 6.0, 2.0))
    assert(out(1).getSeq[java.lang.Double](1) == Seq())
  }

  test("vecMean: null arrays contribute nothing; all-null group -> empty") {
    val df = Seq[(Int, Seq[Double])]((0, Seq(4.0, 8.0)), (0, null), (1, null))
      .toDF("cell", "v")
    val out = df.groupBy($"cell").agg(VecAgg.vecMean($"v").as("c"))
      .orderBy($"cell").collect()
    assert(out(0).getSeq[Double](1) == Seq(4.0, 8.0))
    assert(out(1).getSeq[Double](1) == Seq())
  }

  test("vecMean: map-side partials merge across partitions") {
    val df = spark.range(0, 1000, 1, 16)
      .select((col("id") % 4).as("cell"),
        array(col("id").cast("double"), lit(1.0)).as("v"))
    val out = df.groupBy($"cell").agg(VecAgg.vecMean($"v").as("c"))
      .orderBy($"cell").collect()
    // cell c holds ids c, c+4, ..., c+996: mean = c + 498
    out.zipWithIndex.foreach { case (r: Row, c: Int) =>
      assert(r.getSeq[Double](1) == Seq(c + 498.0, 1.0))
    }
  }
}
