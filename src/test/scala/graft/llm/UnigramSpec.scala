package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential test of [[Unigram]] against an in-memory reference:
  * the same hard-EM (seed → Viterbi-E → add-one-M) algorithm coded
  * imperatively, with the identical integer-encoded DP tie-break, so
  * any drift in the distributed formulation (edge ordering, slice
  * arithmetic, smoothing totals) surfaces as a value diff.
  */
class UnigramSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val Off = 1L << 40
  private val L = 4

  private def refViterbi(w: String, lp: Map[String, Long]): Seq[String] = {
    val n = w.length
    val dp = new Array[Long](n + 1)
    dp(0) = Off << 4
    for (j <- 1 to n) {
      var best = Long.MinValue
      for (l <- 1 to math.min(L, j)) {
        val p = w.substring(j - l, j)
        lp.get(p).foreach { v =>
          val cand = (((dp(j - l) >> 4) + v) << 4) | l
          if (cand > best) best = cand
        }
      }
      dp(j) = best
    }
    var pos = n
    val ps = scala.collection.mutable.Buffer[String]()
    while (pos > 0) {
      val l = (dp(pos) & 15L).toInt
      ps += w.substring(pos - l, pos)
      pos -= l
    }
    ps.toSeq
  }

  private def refTrain(wf: Map[String, Long], seedSize: Int, iters: Int)
      : (Map[String, (Long, Long)]) = {
    val sub = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, n) <- wf; j <- 1 to w.length; l <- 1 to math.min(L, j))
      sub(w.substring(j - l, j)) += n
    val chars = sub.filter(_._1.length == 1)
    val multi = sub.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    val vocab = (chars ++ multi).toMap
    val t0 = vocab.values.sum
    var lp = vocab.map { case (p, c) =>
      p -> math.floor(math.log(c.toDouble / t0.toDouble) * 1e6).toLong }
    var counts = Map[String, Long]()
    for (_ <- 1 to iters) {
      val c = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, n) <- wf; p <- refViterbi(w, lp)) c(p) += n
      counts = vocab.keys.map(p => p -> c(p)).toMap
      val t = counts.values.map(_ + 1L).sum
      lp = counts.map { case (p, cc) =>
        p -> math.floor(math.log((cc + 1L).toDouble / t.toDouble) * 1e6).toLong }
    }
    vocab.keys.map(p => p -> ((counts(p), lp(p)))).toMap
  }

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "sparkling spark streams sparsely over sparse parquet parks",
    "tokenize tokenizer tokenization token tokens into pieces",
    "the lazy dog sleeps while the quick fox runs quickly",
    "unigram language models segment words into subword pieces"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private lazy val wfDf = Bpe.wordFreq(docs, col("text")).localCheckpoint(false)
  private lazy val wfMap = wfDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("viterbiSegments matches the reference DP on every word") {
    val vocab = Unigram.seedVocab(wfDf, L, 30)
    val lpMap = vocab.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = Unigram.viterbiSegments(wfDf.select(col("w")), vocab, L)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for ((w, _) <- wfMap) {
      val ref = refViterbi(w, lpMap)
      assert(got(w) === ref, s"word $w")
      assert(got(w).reverse.mkString("") === w, s"pieces of $w reassemble the word")
    }
  }

  test("train matches the reference hard-EM counts and log-probs") {
    val ref = refTrain(wfMap, seedSize = 30, iters = 2)
    val got = Unigram.train(wfDf, L, 30, 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === ref.keySet)
    for ((p, v) <- ref) assert(got(p) === v, s"piece $p")
  }

  test("llm_unigram_apply (pretrained-vocab path) ≡ llm_unigram_encode") {
    // the catalog rows share the oracle SQL verbatim; this pins the
    // Spark-side equivalence of the fixture-cached deployed encode
    // against the in-query-training form (the PqIndexSpec discipline)
    val enc = graft.SparkEntry.queries("llm_unigram_encode")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val app = graft.SparkEntry.queries("llm_unigram_apply")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(app == enc)
  }

  test("every character keeps a finite log-prob (segmentability invariant)") {
    val v = Unigram.train(wfDf, L, 10, 1)
    val chars = v.filter(length(col("piece")) === 1).count()
    val corpusChars = wfMap.keys.flatMap(_.toSeq).toSet.size
    assert(chars === corpusChars.toLong)
  }
}
