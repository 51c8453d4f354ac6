package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CorpusStats.pmiTopK]] / [[CorpusStats.byteEntropy]] against
  * closed-form counts.
  */
class CorpusStatsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("pmiTopK: counts and PMI match hand computation") {
    // corpus: "new york" ×3 always adjacent; "big apple" ×2; fillers.
    // N = 14 tokens, B = 9 adjacent pairs (doc lengths 4,4,2,2,2 →
    // per-doc pairs 3,3,1,1,1).
    val docs = Seq(
      (1L, "New York new york"),
      (2L, "big apple big apple"),
      (3L, "new york"),
      (4L, "to the"),
      (5L, "to the")
    ).toDF("doc_id", "text")
    val got = CorpusStats.pmiTopK(docs, col("text"), minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byPair = got.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // new york: doc 1's "new york new york" yields pairs
    // (new,york),(york,new),(new,york) → c12("new","york")=2 there
    // + 1 in doc 3 = 3; c(new)=3, c(york)=3, N=14, B=9
    val nyExpected = math.log((3.0 / 9.0) / ((3.0 / 14.0) * (3.0 / 14.0)))
    assert(byPair(("new", "york"))._1 === 3L)
    assert(math.abs(byPair(("new", "york"))._2 - nyExpected) < 1e-12)
    // big apple: c12=2, c(big)=2, c(apple)=2
    val baExpected = math.log((2.0 / 9.0) / ((2.0 / 14.0) * (2.0 / 14.0)))
    assert(byPair(("big", "apple"))._1 === 2L)
    assert(math.abs(byPair(("big", "apple"))._2 - baExpected) < 1e-12)
    // (to,the) appears twice across docs 4+5
    assert(byPair(("to", "the"))._1 === 2L)
    // minCount prunes singletons like (york,new)
    assert(!byPair.contains(("york", "new")))
  }

  test("pmiTopK: ranking is PMI desc and limit applies") {
    val docs = Seq(
      (1L, "a b a b a b"),       // (a,b) c12=3, (b,a) c12=2
      (2L, "c c c c c c c c")    // (c,c) c12=7 but low PMI (c frequent)
    ).toDF("doc_id", "text")
    val got = CorpusStats.pmiTopK(docs, col("text"), minCount = 2L, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.length === 2)
    // (a,b) and (b,a) have the highest association; (c,c) PMI is
    // ln((7/12)/((8/14)^2)) ≈ 0.58, below both
    assert(got.toSet === Set(("a", "b"), ("b", "a")))
  }

  test("byteEntropy: closed forms — uniform two-symbol, single-symbol, empty excluded") {
    val docs = Seq(
      (1L, "abab"),          // 2 symbols × 2 → entropy ln 2
      (2L, "aaaa"),          // single symbol → 0
      (3L, ""),              // excluded: empty
      (4L, null.asInstanceOf[String]), // excluded: null
      (5L, "abcd")           // 4 distinct → ln 4
    ).toDF("doc_id", "text")
    val got = CorpusStats.byteEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L, 5L))
    assert(got(1L)._1 === 4L)
    assert(math.abs(got(1L)._2 - math.log(2)) < 1e-12)
    assert(math.abs(got(2L)._2 - 0.0) < 1e-12)
    assert(math.abs(got(5L)._2 - math.log(4)) < 1e-12)
  }

  test("sourceOverlap: exact set algebra on a known 2-gram overlap") {
    // Source A grams: {a b, b c, c d} (doc "a b c d"); source B grams:
    // {b c, c d, d e} (doc "b c d e"); source C shares nothing.
    val docs = Seq(
      ("A", "a b c d"),
      ("B", "b c d e"),
      ("C", "x y z w")
    ).toDF("source", "text")
    val got = CorpusStats.sourceOverlap(docs, col("source"), col("text"), n = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // A∩B = {b c, c d} → shared 2, union 4 → jaccard 0.5, containment 2/3
    assert(got.keySet === Set(("A", "B")))
    val (sh, j, cont) = got(("A", "B"))
    assert(sh === 2L)
    assert(math.abs(j - 0.5) < 1e-12)
    assert(math.abs(cont - 2.0 / 3.0) < 1e-12)
  }

  test("sourceOverlap: duplicate grams within a source count once") {
    val docs = Seq(
      ("A", "a b a b"),   // grams {a b, b a} (a b twice → once)
      ("A", "a b"),       // same gram again, still once
      ("B", "a b")
    ).toDF("source", "text")
    val got = CorpusStats.sourceOverlap(docs, col("source"), col("text"), n = 2)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // A = {a b, b a}, B = {a b}: shared 1, union 2, containment 1/1
    assert(got.toSeq === Seq((1L, 0.5, 1.0)))
  }

  test("byteEntropy: multi-byte UTF-8 counts bytes, not characters") {
    // "éé" = 0xC3 0xA9 ×2 → 4 bytes, 2 distinct values × 2 → ln 2
    val docs = Seq((1L, "éé")).toDF("doc_id", "text")
    val got = CorpusStats.byteEntropy(docs, col("doc_id"), col("text")).collect()
    assert(got.head.getLong(1) === 4L)
    assert(math.abs(got.head.getDouble(2) - math.log(2)) < 1e-12)
  }

  test("jsDivergence: identical distributions 0, disjoint vocabularies ln 2") {
    val docs = Seq(
      ("A", "cat dog cat"), ("B", "cat dog cat"), // identical dists
      ("C", "bird fish")                          // disjoint from both
    ).toDF("src", "text")
    val got = CorpusStats.jsDivergence(docs, col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(math.abs(got(("A", "B"))) < 1e-12)
    assert(math.abs(got(("A", "C")) - math.log(2)) < 1e-12)
    assert(math.abs(got(("B", "C")) - math.log(2)) < 1e-12)
  }

  test("jsDivergence matches the closed form on a half-overlapping pair") {
    // A: {a: 1/2, b: 1/2}; B: {a: 1/2, c: 1/2}
    val docs = Seq(("A", "a b"), ("B", "a c")).toDF("src", "text")
    val got = CorpusStats.jsDivergence(docs, col("src"), col("text"))
      .collect().head.getDouble(2)
    // shared a: pa=pb=1/2 → terms vanish (ln 1); one-sided mass 1/2
    // each → JS = 0.5·(ln2·(1/2) + ln2·(1/2)) = ln2/2
    assert(math.abs(got - math.log(2) / 2) < 1e-12)
    // and bounded by [0, ln 2]
    assert(got >= 0 && got <= math.log(2) + 1e-12)
  }

  test("gramNovelty: shared vs novel bigrams, within-doc repeats count once") {
    // bigrams (n=2): doc1 {a b, b c}; doc2 {a b, b d}; doc3 {x y}
    // doc4 repeats "a b" twice → still ONE distinct gram, df("a b")=3
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "x y"), (4L, "a b a b")
    ).toDF("doc_id", "text")
    val m = CorpusStats.gramNovelty(docs, col("doc_id"),
        TextOps.words(col("text")), n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(m(1L) === ((2L, 1L, 0.5)))      // "a b" shared, "b c" novel
    assert(m(2L) === ((2L, 1L, 0.5)))
    assert(m(3L) === ((1L, 0L, 0.0)))      // fully novel
    // doc4: distinct grams {a b, b a}; "a b" df=3 shared, "b a" df=1
    assert(m(4L) === ((2L, 1L, 0.5)))
  }

  test("gramNovelty: docs shorter than n emit no row; determinism across partitions") {
    val docs = Seq((1L, "only"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    val run = CorpusStats.gramNovelty(docs, col("doc_id"),
      TextOps.words(col("text")), n = 2)
    assert(run.collect().map(_.getLong(0)).toSet === Set(2L, 3L))
    val rep = CorpusStats.gramNovelty(docs.repartition(5), col("doc_id"),
      TextOps.words(col("text")), n = 2)
    assert(run.collect().toSeq.sortBy(_.getLong(0)).map(_.toString) ===
      rep.collect().toSeq.sortBy(_.getLong(0)).map(_.toString))
  }

  test("logOdds: exclusive words score symmetric positive z, balanced words 0") {
    // s1: apple×3 banana ; s2: cherry×3 banana — mirror corpora.
    // apple/s1: ysw=3 yw=3 ns=4 n=8 →
    //   δ = ln(6/6) − ln(3/9) = ln 3 ; σ² = 1/6 + 1/3 ; z = ln3/√0.5
    val docs = Seq(
      ("s1", "apple apple apple banana"),
      ("s2", "cherry cherry cherry banana")
    ).toDF("source", "text")
    val got = CorpusStats.logOdds(docs, col("source"), col("text"),
        minCount = 1L, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    val zApple = math.log(3.0) / math.sqrt(1.0 / 6.0 + 1.0 / 3.0)
    assert(math.abs(got(("s1", "apple")) - zApple) < 1e-12)
    assert(math.abs(got(("s2", "cherry")) - zApple) < 1e-12)
    // banana is split evenly: both deltas are ln(3/9), z = 0
    assert(math.abs(got(("s1", "banana"))) < 1e-12)
    assert(math.abs(got(("s2", "banana"))) < 1e-12)
    // cherry never occurs in s1 — not a candidate there
    assert(!got.contains(("s1", "cherry")))
  }

  test("logOdds: minCount prunes, k caps per group, rank ties on the word") {
    val docs = Seq(
      ("s1", "a a a b b c z z"),
      ("s2", "z z z z")
    ).toDF("source", "text")
    val got = CorpusStats.logOdds(docs, col("source"), col("text"),
      minCount = 2L, k = 2).collect()
    val s1 = got.filter(_.getString(0) == "s1").map(_.getString(1)).toSeq
    // c (count 1) pruned by minCount; k=2 keeps the two largest z
    assert(s1.length === 2 && !s1.contains("c"))
  }
}
