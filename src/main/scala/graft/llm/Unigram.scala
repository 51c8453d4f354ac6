package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training (Kudo, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", ACL 2018 — the algorithm behind
  * SentencePiece's default unigram vocabularies), in the hard-EM
  * (Viterbi-EM) form: the E-step segments each word with the current
  * piece probabilities and the M-step re-estimates probabilities from
  * the segmentation counts. The reference exposes no tokenizer
  * training at all (closest surface: the word pipelines in
  * fetchers/utils.py); this operator exists for the LLM-pipeline
  * brief alongside [[Bpe]].
  *
  * Scale discipline = the [[Bpe.train]] one: the corpus is scanned
  * ONCE (the word-frequency table); seeding, every EM iteration, and
  * encoding run on the VOCABULARY frame (distinct words), so a 100 TB
  * corpus pays one tokenize pass and the training cost is bounded by
  * |distinct words| · wordLen · maxPieceLen, independent of corpus
  * size. Encoding the corpus is a JOIN of per-source word usage
  * against the vocabulary-sized (w, |segmentation|) frame, never a
  * re-segmentation of every occurrence. The vocabulary itself is a
  * MODEL frame held as driver rows between iterations (the [[Bpe]]
  * merge-table / [[PqIndex]] codebook discipline) — the only collects
  * are the seed cut and per-iteration piece counts, both vocab-sized,
  * and the E-step kernel runs exactly once per iteration.
  *
  * Engine-exactness: Viterbi runs on integer micro-nat log-probs
  * (floor(ln·10⁶), the [[NgramLm]] quantization) with the DP value at
  * each position encoded as ONE bigint `((score + 2⁴⁰) << 4) | len`
  * (score ordering first, longer-piece tie-break second, backpointer
  * recoverable as `enc & 15`) — every DP comparison, update, and
  * backtrack step is integer arithmetic on positives, identical in
  * any engine. Piece probabilities are exact integer-count rationals;
  * the M-step smooths add-one over the FIXED seed vocabulary so every
  * piece keeps a finite log-prob and the iteration count alone
  * determines the result.
  */
object Unigram {

  /** Positive offset keeping every encoded DP value non-negative, so
    * `>> 4` is exact floor-division in both engines. Scores are sums
    * of ≤ wordLen micro-nat log-probs (≫ −2⁴⁰).
    */
  private val Off = 1L << 40

  /** All (j, len, piece) spans of each distinct word `w`, len ≤
    * maxLen: piece = w[j−len+1 .. j] (1-based, end position j) — the
    * candidate-piece lattice both seeding and Viterbi edges read.
    */
  private def spans(words: DataFrame, maxLen: Int): DataFrame =
    words.select(col("w"),
        explode(sequence(lit(1), length(col("w")))).as("j"))
      .select(col("w"), col("j"),
        explode(sequence(lit(1), least(lit(maxLen), col("j")))).as("len"))
      .select(col("w"), col("j"), col("len"),
        col("w").substr(col("j") - col("len") + lit(1), col("len")).as("piece"))

  /** Driver-side micro-nat quantization — the SAME double ops
    * (IEEE division, Math.log, floor·10⁶) Catalyst's codegen would
    * run, so values are identical to an in-engine projection; kept on
    * the driver because the vocab is a MODEL frame (the [[Bpe]]
    * merge-table / [[PqIndex]] codebook discipline) and a LocalRelation
    * vocabulary costs zero jobs to checkpoint, broadcast, or total.
    */
  private def lpMicro(num: Long, den: Long): Long =
    math.floor(math.log(num.toDouble / den.toDouble) * 1e6).toLong

  /** Seed vocabulary: every single character seen in the corpus (so
    * any word stays segmentable — SentencePiece's required-character
    * rule) plus the `seedSize` most frequent multi-character
    * substrings up to `maxLen`, counted with word-frequency weight
    * over ALL occurrences. (cnt desc, piece asc) makes the cut
    * deterministic, and the cut itself runs IN the engine (sort+limit
    * over the substring-count frame) — only the chosen vocab rows
    * reach the driver.
    */
  def seedVocab(wf: DataFrame, maxLen: Int, seedSize: Int): DataFrame = {
    val spark = wf.sparkSession
    import spark.implicits._
    val cnts = spans(wf.select(col("w")), maxLen)
      .join(wf.select(col("w"), col("wc")), "w")
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
    val chars = cnts.filter(length(col("piece")) === 1)
    val multi = cnts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
    val rows = chars.unionByName(multi).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val t = rows.map(_._2).sum
    rows.toSeq.map { case (p, c) => (p, c, lpMicro(c, t)) }
      .toDF("piece", "cnt", "lp")
  }

  /** Viterbi segmentation of each distinct word under `vocab`
    * (piece, lp): (w, ps) with ps the best-path pieces. One
    * vocabulary-sized join builds the per-word edge list; the DP and
    * backtrack are single `aggregate` folds over that list — per-word
    * O(len·maxLen) arithmetic with no lookups inside the lambda, so
    * the whole segmentation is one shuffle-free projection after the
    * edge groupBy.
    *
    * DP state = array of encoded positions (see the scaladoc's enc
    * scheme); edges are processed sorted by (j, len, lp), and every
    * position has a len=1 edge (single chars are always in the
    * vocab), so position j's slot is appended exactly when its first
    * edge arrives. `greatest` on the encodings is the deterministic
    * tie-break: higher score first, longer piece on equal score.
    */
  def viterbiSegments(words: DataFrame, vocab: DataFrame, maxLen: Int): DataFrame = {
    val edges = spans(words, maxLen)
      .join(broadcast(vocab.select(col("piece"), col("lp"))), "piece")
    val es = edges.groupBy(col("w"))
      .agg(sort_array(collect_list(struct(
        col("j").cast("long").as("j"),
        col("len").cast("long").as("len"),
        col("lp").as("lp")))).as("es"))
    // single-element Generate barrier between the DP fold and the
    // backtrack: the walk references `dp` several times per step, and
    // CollapseProject would otherwise substitute the whole DP fold
    // into each reference (the docSigWithSet discipline)
    val dp = es.select(col("w"),
      explode_outer(array(
        aggregate(col("es"), array(lit(Off << 4)), (acc, x) => {
          val j = x.getField("j")
          val len = x.getField("len")
          val nv = shiftleft(
            shiftright(element_at(acc, (j - len + lit(1L)).cast("int")), 4)
              + x.getField("lp"), 4).bitwiseOR(len)
          when(size(acc).cast("long") === j, concat(acc, array(nv)))
            .otherwise(concat(slice(acc, lit(1), j.cast("int")),
              array(greatest(element_at(acc, (j + lit(1L)).cast("int")), nv))))
        }))).as("dp"))
    dp.select(col("w"),
        aggregate(
          sequence(lit(1), length(col("w"))),
          struct(length(col("w")).cast("long").as("pos"),
            array().cast("array<string>").as("ps")),
          (st, _) => {
            val pos = st.getField("pos")
            val len = element_at(col("dp"), (pos + lit(1L)).cast("int"))
              .bitwiseAND(lit(15L))
            when(pos <= 0, st).otherwise(struct(
              (pos - len).as("pos"),
              concat(st.getField("ps"),
                array(col("w").substr((pos - len + lit(1L)).cast("int"),
                  len.cast("int")))).as("ps")))
          }).getField("ps").as("ps"))
  }

  /** Hard-EM training: seed, then `iters` Viterbi-E / add-one-M
    * rounds over the fixed seed vocabulary. Returns the FULL final
    * vocabulary (piece, cnt, lp) — cnt the last E-step's Viterbi
    * count (0 for pieces the final model never uses), lp the final
    * smoothed micro-nat log-prob (the artifact [[viterbiSegments]]
    * encodes with). The vocab lives as driver rows between
    * iterations, so each EM round is ONE engine job wave (segment +
    * count + collect) with no checkpoint/broadcast bookkeeping and
    * trivially bounded lineage.
    */
  def train(wf: DataFrame, maxLen: Int, seedSize: Int, iters: Int): DataFrame = {
    val spark = wf.sparkSession
    import spark.implicits._
    val words = wf.select(col("w")).localCheckpoint(false)
    var vocab = seedVocab(wf, maxLen, seedSize).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    for (_ <- 1 to iters) {
      // E-step: one engine pass over the word frame; the per-piece
      // Viterbi counts that come back are vocab-sized (model frame)
      val counts = viterbiSegments(words, vocab.toDF("piece", "cnt", "lp"), maxLen)
        .select(col("w"), explode(col("ps")).as("piece"))
        .join(wf.select(col("w"), col("wc")), "w")
        .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step on the driver: add-one over the fixed seed vocabulary
      val t = vocab.iterator.map(v => counts.getOrElse(v._1, 0L) + 1L).sum
      vocab = vocab.map { case (p, _, _) =>
        val c = counts.getOrElse(p, 0L)
        (p, c, lpMicro(c + 1L, t))
      }
    }
    vocab.toDF("piece", "cnt", "lp")
  }
}
