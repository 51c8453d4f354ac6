package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for [[Lexical]]: MATTR window arithmetic and
  * every branch of the stupid-backoff chain (trigram hit, bigram
  * backoff, unigram backoff, OOV exclusion).
  */
class LexicalSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  test("mattr: windows of a known sequence, and the short-doc TTR fallback") {
    // text = "a b a b a b" with w=4: windows [a b a b]→2, [b a b a]→2,
    // [a b a b]→2 ⇒ mattr = 6 / (3·4) = 0.5
    val d = df(Seq((1L, "a b a b a b"), (2L, "x y z"), (3L, "")))
    val out = d.select(col("id"),
        Lexical.mattr(TextOps.words(col("text")), 4).as("m"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L).get === 0.5)
    assert(out(2L).get === 1.0)   // 3 distinct / 3 tokens, TTR fallback
    assert(out(3L).isEmpty)       // empty doc → null
  }

  test("mattr: repeated single token gives 1/w") {
    // "a a a a a" w=4: each window has 1 distinct ⇒ 2/(2·4) = 0.25
    val d = df(Seq((1L, "a a a a a")))
    val m = d.select(Lexical.mattr(TextOps.words(col("text")), 4)).head().getDouble(0)
    assert(m === 0.25)
  }

  test("trigrams: per-occurrence frame in document order") {
    val d = df(Seq((1L, "a b c d"), (2L, "x y")))
    val t = Lexical.trigrams(d, col("id"), TextOps.words(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(t.toSet === Set((1L, "a", "b", "c"), (1L, "b", "c", "d")))
  }

  test("stupid backoff: each chain branch scores as Brants §3 prescribes") {
    // train: "a b c a b d" → trigrams (a,b,c),(b,c,a),(c,a,b),(a,b,d)
    // c3(a,b,c)=1, c2uv(a,b)=2; unigrams over w-position: c,a,b,d → N=4
    val train = Lexical.trigrams(
      df(Seq((0L, "a b c a b d"))), col("id"), TextOps.words(col("text")))
      .select(col("u"), col("v"), col("w"))
    // eval doc 1: "a b c" → exact trigram hit: S = c3/c2uv = 1/2
    // eval doc 3: "z b c" → trigram (z,b,c) unseen, bigram (b,c) seen
    //   (from train trigram (a,b,c) at vw-position): S = 0.4·c2vw(b,c)/c1(b)
    //   c2vw(b,c)=1, c1v(b)=1 ⇒ S = 0.4
    // eval doc 5: "z z d" → trigram+bigram unseen, unigram d seen:
    //   S = 0.16·c1(d)/N = 0.16·1/4 = 0.04
    // eval doc 7: "z z q" → q OOV ⇒ excluded, counted
    val eval = Lexical.trigrams(
      df(Seq((1L, "a b c"), (3L, "z b c"), (5L, "z z d"), (7L, "z z q"))),
      col("id"), TextOps.words(col("text")))
    val out = Lexical.stupidBackoff(train, eval).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def q(s: Double): Long = math.floor(math.log(s) * 1e6).toLong
    assert(out(1L) === ((1L, 0L, q(0.5))))
    assert(out(3L) === ((1L, 0L, q(0.4))))
    assert(out(5L) === ((1L, 0L, q(0.04))))
    assert(out(7L) === ((1L, 1L, 0L)))
  }
}
