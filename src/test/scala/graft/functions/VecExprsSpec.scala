package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecExprsSpec extends SparkSpec {
  import VecExprs.{vecDot, vecL2Sq, srpBitsCol}

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  test("vecDot is bit-identical to the aggregate(zip_with) fold on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val mismatches = e.crossJoin(
        e.select(col("embedding").as("q")).limit(3))
      .select(vecDot(col("embedding"), col("q")).as("native"),
        hofDot(col("embedding"), col("q")).as("hof"))
      .filter(col("native") =!= col("hof"))   // bit-exact, not approx
      .count()
    assert(mismatches == 0)
  }

  test("vecL2Sq matches the squared-difference fold; mixed float/double inputs") {
    import graft.SparkSpec.spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, -3.5f), Seq(0.5d, -1.0d, 2.0d))).toDF("f", "d")
    val r = df.select(
      vecL2Sq(col("f"), col("d")).as("n"),
      aggregate(zip_with(col("f"), col("d"), (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0d), (acc, x) => acc + x).as("h"),
      vecDot(col("f"), col("d")).as("dotfd")).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(2) == 1.0f * 0.5 + 2.0f * -1.0 + -3.5f * 2.0)
  }

  test("length mismatch yields null, like the zip_with null padding") {
    import graft.SparkSpec.spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0d))).toDF("a", "b")
    val r = df.select(vecDot(col("a"), col("b")), vecL2Sq(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("srpBits equals per-plane sign dots and is width-guarded") {
    import graft.SparkSpec.spark.implicits._
    val signs = IndexedSeq(
      IndexedSeq(1.0d, -1.0d, 1.0d),
      IndexedSeq(-1.0d, -1.0d, 1.0d))
    val df = Seq(Seq(0.5f, 1.0f, 0.25f), Seq(-1.0f, 0.0f, 0.5f)).toDF("v")
    val got = df.select(srpBitsCol(col("v"), signs).as("bits")).collect()
      .map(_.getSeq[String](0))
    // plane dots: (0.5-1+0.25)=-0.25 -> "0"; (-0.5-1+0.25)=-1.25 -> "0"
    //             (-1-0+0.5)=-0.5 -> "0";   (1-0+0.5)=1.5 -> "1"
    assert(got(0) == Seq("0", "0") && got(1) == Seq("0", "1"))
    val short = Seq(Seq(1.0f)).toDF("v")
      .select(srpBitsCol(col("v"), signs).as("bits")).collect()(0)
    assert(short.isNullAt(0))
  }
}
