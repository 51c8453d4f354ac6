package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistical profiling for training-data curation:
  * PMI collocation mining and per-document byte-entropy scoring.
  *
  * Scale design: both ops are pure aggregation pipelines — every
  * explode is pipeline-local (WholeStageCodegen consumes it before
  * any exchange) and every shuffle carries partially-aggregated
  * counts, so shuffle volume is bounded by DISTINCT keys (vocabulary
  * / bigram types / ≤256 byte values per doc), not corpus tokens.
  */
object CorpusStats {

  /** Lowercase ASCII-alpha word tokens — the deterministic tokenizer
    * shared by both engines (`regexp_extract_all` over `[a-z]+`).
    */
  def alphaTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** PMI-ranked adjacent word pairs (Church & Hanks, "Word
    * Association Norms, Mutual Information, and Lexicography", CL
    * 1990): pmi = ln((c12/B) / ((c1/N)·(c2/N))) with N = total
    * tokens, B = total adjacent pairs, over all documents. Pairs
    * below `minCount` occurrences are pruned BEFORE the unigram
    * joins, so the join probe side is only the surviving pair types.
    *
    * Shape: two explode→count aggregations (map-side combined) + two
    * joins on the pruned pair table + one 1-row totals crossJoin —
    * at 100 TB the heavy stages shuffle distinct grams only, and AQE
    * broadcasts the pruned pair side of the joins when it is small.
    */
  def pmiTopK(docs: DataFrame, text: Column, minCount: Long, k: Int): DataFrame = {
    val toks = docs.filter(text.isNotNull)
      .select(alphaTokens(text).as("ts"))
      .filter(size(col("ts")) > 0)
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // totals: one row (N tokens, B adjacent pairs) — B counts every
    // adjacent pair, including those later pruned by minCount
    val totals = toks.agg(
      sum(size(col("ts"))).as("n"),
      sum(greatest(size(col("ts")) - 1, lit(0))).as("btot"))
    val pairs = toks.filter(size(col("ts")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ts")) - 2),
        i => struct(element_at(col("ts"), i + 1).as("w1"),
          element_at(col("ts"), i + 2).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"),
        log((col("c12").cast("double") / col("btot").cast("double")) /
          ((col("c1").cast("double") / col("n").cast("double")) *
            (col("c2").cast("double") / col("n").cast("double")))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Cross-source verbatim overlap matrix — the corpus-composition
    * audit run before mixing sources into a training set (how much of
    * source B is already in source A, and how contaminated is the mix
    * overall). For every pair of `group` values sharing at least one
    * distinct word n-gram: the shared-gram count, Jaccard similarity
    * of the gram sets, and containment (shared / smaller set).
    * Non-overlapping pairs are omitted — their row would be all-zero.
    *
    * Scale: one gram-keyed distinct, then a self-join on the gram —
    * each gram fans out to at most |sources with it|² ≤ |S|² pair
    * rows (|S| is small: a corpus has tens of sources, not millions),
    * partially aggregated before the (a,b)-keyed shuffle. No stage
    * depends on corpus size beyond the initial linear shingle pass.
    */
  def sourceOverlap(docs: DataFrame, group: Column, text: Column, n: Int): DataFrame = {
    val sg = docs.filter(text.isNotNull)
      .select(group.as("src"),
        explode(array_distinct(TextOps.wordNgrams(TextOps.words(text), n))).as("g"))
      .distinct()
    val counts = sg.groupBy("src").agg(count(lit(1)).as("cnt"))
    val inter = sg.select(col("src").as("source_a"), col("g"))
      .join(sg.select(col("src").as("source_b"), col("g")), "g")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    inter
      .join(counts.select(col("src").as("source_a"), col("cnt").as("na")), "source_a")
      .join(counts.select(col("src").as("source_b"), col("cnt").as("nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")).cast("double")).as("jaccard"),
        (col("n_shared").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("containment"))
  }

  /** Per-document Shannon entropy of the UTF-8 byte distribution —
    * the gibberish/low-diversity quality signal (binary junk and
    * single-char spam score near 0, natural text ~4.2 bits·ln2).
    * Computed as ln(n) − Σ c·ln(c) / n over byte counts c, so both
    * engines fold the same ≤256 terms. Bytes are keyed as hex pairs
    * (the llm_resize oracle's proven byte-extraction form). Empty
    * and NULL texts are excluded — their entropy is undefined.
    *
    * Returns (doc_id, n_bytes, entropy), entropy in nats.
    */
  def byteEntropy(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val hx = lower(hex(encode(text, "UTF-8")))
    val counts = docs.filter(text.isNotNull)
      .select(id.as("doc_id"), hx.as("hx"))
      .filter(length(col("hx")) > 0)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), (length(col("hx")) / 2).cast("int") - 1),
          i => col("hx").substr(i * 2 + 1, lit(2)))).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    counts.groupBy("doc_id").agg(
        sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("slc"))
      .select(col("doc_id"), col("n").as("n_bytes"),
        (log(col("n").cast("double")) - col("slc") / col("n").cast("double"))
          .as("entropy"))
  }
}
