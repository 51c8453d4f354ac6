package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — the algorithm behind GPT-2/RoBERTa/SentencePiece-BPE
  * vocabularies): repeatedly merge the most frequent adjacent symbol
  * pair, training on the WORD-FREQUENCY table — vocabulary-sized, not
  * corpus-sized, exactly as the paper's reference implementation does
  * (learning from a `{word: count}` dict). The corpus is scanned ONCE
  * (the word count); every merge iteration touches only the distinct-
  * word frame.
  *
  * The per-word symbol sequence is a delimiter-terminated string
  * (`"h|e|l|l|o|"`), which makes merge APPLICATION a plain literal
  * `replace(s, "a|b|", "ab|")`: both Spark's and every SQL engine's
  * replace scan left-to-right non-overlapping — exactly BPE's greedy
  * leftmost merge order ("aaa" + merge(a,a) → [aa, a], never [a, aa]).
  * The winning pair is a 1-row frame crossJoined in, so an iteration
  * is: split → adjacent-pair explode → count-sum keyed on the pair →
  * top-1 (count desc, pair lexicographic — deterministic) → replace.
  * No driver-side collect anywhere; `merges` Spark jobs total.
  *
  * Integer counts and string tie-breaks make every step engine-exact.
  * Words come from [[CorpusStats.alphaTokens]] ([a-z]+ only) so
  * character splitting is byte = char = code point in any engine.
  */
object Bpe {

  /** One corpus pass: (w, wc) word-frequency table over [a-z]+ words. */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(CorpusStats.alphaTokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))

  /** Adjacent symbol pairs of the delimited string `s`, weighted by
    * `wc`: (a, b, cnt) summed over the vocabulary.
    */
  private def pairCounts(wf: DataFrame): DataFrame = {
    val sym = filter(split(col("s"), "\\|"), x => x =!= "")
    wf.select(col("wc"), sym.as("sym"))
      .filter(size(col("sym")) >= 2)
      .select(col("wc"), explode(
        transform(sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("a"),
                      element_at(col("sym"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wc")).as("cnt"))
  }

  /** Learn `merges` BPE merges from the (w, wc) table. Returns the
    * merge table (step, a, b, merged, cnt) in learning order — the
    * artifact a tokenizer ships. The symbol frame is checkpointed per
    * iteration so plan lineage stays bounded at any merge count
    * (the [[GraphOps.pageRank]] pattern).
    */
  def train(wf: DataFrame, merges: Int): DataFrame = {
    val spark = wf.sparkSession
    import spark.implicits._
    var cur = wf.select(col("wc"),
        regexp_replace(col("w"), "(.)", "$1|").as("s"))
      .localCheckpoint(false)
    var out: DataFrame = Seq.empty[(Int, String, String, String, Long)]
      .toDF("step", "a", "b", "merged", "cnt")
    for (step <- 1 to merges) {
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
        .localCheckpoint(false)
      out = out.unionByName(top.select(lit(step).as("step"), col("a"),
        col("b"), concat(col("a"), col("b")).as("merged"), col("cnt")))
      cur = cur.crossJoin(broadcast(top.select(col("a").as("__a"), col("b").as("__b"))))
        .select(col("wc"),
          replace(col("s"),
            concat(col("__a"), lit("|"), col("__b"), lit("|")),
            concat(col("__a"), col("__b"), lit("|"))).as("s"))
        .localCheckpoint(false)
    }
    out.orderBy(col("step"))
  }

  /** Corpus ENCODING with a learned merge table — the deploy step
    * after [[train]]: per-word token count once every merge is applied
    * in learning order. Computed on the VOCABULARY (the distinct-word
    * frame), never the corpus: tokenizing 100 TB of text is a join of
    * per-source/per-doc word usage against this vocabulary-sized
    * (w, n_tokens) frame, not a re-segmentation of every occurrence —
    * the same move the paper's `{word: count}` learner makes, applied
    * at inference. Merge application is the identical literal-replace
    * fold as [[tokenStats]] (left-to-right non-overlapping = BPE's
    * greedy order in every engine); the merge table is a learning
    * artifact of bounded size, applied as broadcast literals.
    */
  def encodeWords(vocab: DataFrame, mergeTable: DataFrame): DataFrame = {
    val ms = mergeTable.orderBy(col("step"))
    var cur = vocab.select(col("w"),
      regexp_replace(col("w"), "(.)", "$1|").as("s"))
    val steps = ms.select(col("a"), col("b")).collect()
    steps.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      cur = cur.select(col("w"),
        replace(col("s"), lit(s"$a|$b|"), lit(s"$a$b|")).as("s"))
    }
    cur.select(col("w"),
      length(regexp_replace(col("s"), "[^|]", "")).cast("long").as("n_tokens"))
  }

  /** Tokenize the (w, wc) table with a learned merge table: total
    * token count before/after — the compression the vocabulary buys.
    * Applies merges in learning order via the same replace form.
    */
  def tokenStats(wf: DataFrame, mergeTable: DataFrame): DataFrame = {
    val ms = mergeTable.orderBy(col("step"))
    var cur = wf.select(col("wc"),
      regexp_replace(col("w"), "(.)", "$1|").as("s"))
    // the merge table is a learning artifact (≤ a few thousand rows);
    // applying it is a per-row fold over broadcast literals
    val steps = ms.select(col("a"), col("b")).collect()
    steps.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      cur = cur.select(col("wc"),
        replace(col("s"), lit(s"$a|$b|"), lit(s"$a$b|")).as("s"))
    }
    cur.select(
        sum(col("wc") * (length(regexp_replace(col("s"), "[^|]", "")))).as("n_tokens"),
        sum(col("wc") * length(regexp_replace(col("s"), "\\|", ""))).as("n_chars"))
  }
}
