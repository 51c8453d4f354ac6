package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // df(a)=2 df(b)=2 df(z)=3, N=3; qidf(2-doc term)=floor(ln(1.5)e6)
  private val q15 = math.floor(math.log(3.0 / 2.0) * 1e6).toLong // 405465

  private def run(k: Int) = {
    val docs = Seq((1L, Seq("a", "a", "b", "z")), (2L, Seq("a", "z")),
        (3L, Seq("b", "b", "z")))
      .toDF("doc_id", "ws")
    TfIdf.topTerms(TfIdf.termFreq(docs, col("doc_id"), col("ws")), k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
  }

  test("scores are exact integer tf·q(idf); corpus-wide terms get idf 0") {
    val byDoc = run(3).groupBy(_._1)
    assert(byDoc(1L).sortBy(_._5) === Seq(
      (1L, "a", 2L, 2 * q15, 1), (1L, "b", 1L, q15, 2), (1L, "z", 1L, 0L, 3)))
    assert(byDoc(3L).sortBy(_._5) === Seq(
      (3L, "b", 2L, 2 * q15, 1), (3L, "z", 1L, 0L, 2)))
  }

  test("k bounds the terms per doc; ties break on the term string") {
    val top1 = run(1)
    assert(top1.length === 3 && top1.forall(_._5 == 1))
    // doc 2: a (q15) beats z (0)
    assert(top1.find(_._1 == 2L).get._2 === "a")
  }
}
