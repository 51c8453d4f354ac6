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

  // ---- Dirichlet query likelihood ----
  // docs: 1=[a,a,b] 2=[b,c]; cf: a=2 b=2 c=1; |C|=5; dl: 1→3 2→2
  private def qlQ(tf: Long, cf: Long, ctot: Long, dl: Long, mu: Double): Long =
    math.floor(math.log(
      (tf.toDouble + mu * cf.toDouble / ctot.toDouble) / (dl.toDouble + mu))
      * 1e6).toLong

  test("dirichletQl: zero-tf terms contribute smoothed background mass") {
    val docs = Seq((1L, Seq("a", "a", "b")), (2L, Seq("b", "c")))
      .toDF("doc_id", "ws")
    val tf = TfIdf.termFreq(docs, col("doc_id"), col("ws"))
    val q = Seq("a", "c").toDF("w")
    val got = TfIdf.dirichletQl(tf, q, mu = 10.0d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val s1 = qlQ(2, 2, 5, 3, 10.0) + qlQ(0, 1, 5, 3, 10.0)
    val s2 = qlQ(0, 2, 5, 2, 10.0) + qlQ(1, 1, 5, 2, 10.0)
    assert(got === Map(1L -> (s1, 1L), 2L -> (s2, 1L)))
  }

  test("dirichletQl: every doc scores on every query term (no match-only drop)") {
    val docs = Seq((1L, Seq("a")), (2L, Seq("z"))).toDF("doc_id", "ws")
    val tf = TfIdf.termFreq(docs, col("doc_id"), col("ws"))
    val got = TfIdf.dirichletQl(tf, Seq("a").toDF("w"), mu = 10.0d)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // doc 2 never contains 'a' but still scores (n_hit = 0)
    assert(got === Map(1L -> 1L, 2L -> 0L))
  }
}
