package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarginMineSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("margin mining: hand-computed ratio margins and best-match pairing") {
    // A (even ids): x0=(1,0), x2=(0,1); B (odd ids): y1=(1,0), y3=(3,4)/5.
    // cos: x0·y1=1, x0·y3=0.6, x2·y1=0, x2·y3=0.8 — all exact doubles.
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f)), (3L, Array(3.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.marginMine(df, col("vec_id"), col("embedding"),
        col("vec_id") % 2 === 0, k = 2, topN = 10)
      .select("x", "y", "cos_sim", "margin")
      .as[(Long, Long, Double, Double)].collect().toSeq
    // ax0 = 1.6e6 (top-2 of x0), ax2 = 0.8e6; by1 = 1e6, by3 = 1.4e6
    // margin(x0,y1) = 2·1e6·2·2 / (1.6e6·2 + 1e6·2)  = 8/5.2  ≈ 1.53846
    // margin(x2,y3) = 2·0.8e6·2·2 / (0.8e6·2 + 1.4e6·2) = 6.4/4.4 ≈ 1.45455
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 1L), (2L, 3L)),
      "best pairs in margin-descending order")
    assert(math.abs(out(0)._4 - 8.0 / 5.2) < 1e-9)
    assert(math.abs(out(1)._4 - 6.4 / 4.4) < 1e-9)
    assert(out(0)._3 == 1.0 && out(1)._3 == 0.8)
  }

  test("hub suppression: the margin prefers exclusive matches over a hub's raw cosine") {
    // y1 is a hub: near-equally close to both x's; y3 is x2's exclusive
    // match with a slightly lower raw cosine. Raw-cosine mining pairs
    // both x's to the hub; margin scoring ranks the exclusive pair's
    // score above the hub pair score for x0.
    val c = math.cos(math.Pi / 8).toFloat
    val s = math.sin(math.Pi / 8).toFloat
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (1L, Array(c, s)),       // hub between the axes
      (3L, Array(0.0f, 1.0f))  // exclusive exact match for x2
    ).toDF("vec_id", "embedding")
    val out = Similarity.marginMine(df, col("vec_id"), col("embedding"),
        col("vec_id") % 2 === 0, k = 2, topN = 10)
      .select("x", "y", "margin").as[(Long, Long, Double)].collect().toSeq
    assert(out.head._1 == 2L && out.head._2 == 3L,
      s"exclusive exact pair outranks the hub pair, got $out")
  }

  test("cellMarginMine with one cell reproduces exact brute-force mining") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = Similarity.marginMine(df, col("vec_id"), col("embedding"),
      col("label") % 2 === 0, k = 4, topN = 20).collect().toSeq
    val cell = Similarity.cellMarginMine(df, col("vec_id"), col("embedding"),
      col("label") % 2 === 0, kCells = 1, iters = 2, k = 4, topN = 20)
      .collect().toSeq
    assert(cell == exact,
      "one cell ⇒ same-cell pairs = A×B ⇒ bit-identical scores and order")
  }
}
