package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the GPT-style training-data layout: documents'
  * tokens laid end-to-end in a fixed deterministic order and cut into
  * fixed-length sequences, docs SPLITTING across sequence boundaries
  * (zero padding waste; the packing used by the public GPT/Pile/
  * Megatron data loaders). Emits one row per (doc, overlapped
  * sequence) with the doc-internal offset, i.e. the index a loader
  * needs to materialize any sequence by fetching its member spans.
  *
  * Scale: the global running token offset is NOT a single-partition
  * window — it is the classic two-level parallel prefix sum. Docs
  * shard by id range (deterministic arithmetic, not RangePartitioner
  * sampling); each shard computes a shard-local cumsum with an
  * ordinary keyed window; the tiny one-row-per-shard totals frame
  * gets the global prefix (the only global window, over `shards`
  * rows) and broadcasts back. Output is therefore IDENTICAL for any
  * shard count — `shards = 1` ≡ `shards = 32` is the spec's
  * correctness proof — and every heavy stage is a keyed shuffle.
  */
object Packing {

  /** Dense 0-based GLOBAL rank for a (group, within-group order) sort,
    * built scale-clean: the within-group ranks come from an ordinary
    * keyed window, and group base offsets from a cumulative sum over
    * the |groups|-row count frame (broadcast back) — the same
    * two-level trick as [[packSequences]]'s prefix sum, so no stage
    * ever sorts the corpus in one partition. Groups are ordered by
    * the group key itself. Appends `rank`.
    *
    * The canonical caller is semantic packing: rank = position in
    * (cluster, similarity) order, which then serves as the packing id
    * so related documents land in adjacent training sequences.
    */
  def groupedRank(df: DataFrame, group: String,
                  orderCols: Seq[Column]): DataFrame = {
    require(!df.columns.contains("rank"),
      "input already has a rank column — rename it first; groupedRank would clobber it")
    val w = Window.partitionBy(col(group)).orderBy(orderCols: _*)
    val ranked = df.withColumn("__r", row_number().over(w).cast("long"))
    val bases = df.groupBy(col(group)).agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(
        sum(col("__c")).over(Window.orderBy(col(group))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(group), col("__base"))
    ranked.join(broadcast(bases), Seq(group))
      .withColumn("rank", col("__base") + col("__r") - 1L)
      .drop("__r", "__base")
  }

  /** @param tokens per-doc token count column (must be > 0 to occupy
    *               space; empty docs are dropped)
    * @param seqLen tokens per packed training sequence
    * @param shards width of the prefix-sum first level
    * Returns (doc_id, seq_id, doc_off, n_tok_in_seq).
    */
  def packSequences(docs: DataFrame, id: Column, tokens: Column,
                    seqLen: Long, shards: Int = 32): DataFrame = {
    require(seqLen > 0 && shards > 0)
    val base = docs.select(id.cast("long").as("doc_id"), tokens.cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
    // deterministic id-range sharding: one tiny driver scalar, then
    // pure arithmetic — never RangePartitioner's sampled bounds.
    // Non-negative ids are part of the contract: a negative id would
    // flip the shard/doc_id monotonicity the prefix sum relies on.
    val bounds = base.agg(max(col("doc_id")), min(col("doc_id"))).head()
    if (bounds.isNullAt(0))
      return base.select(col("doc_id"),
        lit(0L).as("seq_id"), lit(0L).as("doc_off"), lit(0L).as("n_tok_in_seq"))
    require(bounds.getLong(1) >= 0,
      s"packSequences requires non-negative doc ids (saw ${bounds.getLong(1)})")
    val maxId = bounds.getLong(0)
    val width = maxId / shards + 1
    val sharded = base.withColumn("shard", expr(s"doc_id DIV $width"))
    val local = sharded.withColumn("cum",
      sum(col("n_tok")).over(Window.partitionBy(col("shard")).orderBy(col("doc_id"))))
    val prefix = sharded.groupBy(col("shard")).agg(sum(col("n_tok")).as("tot"))
      .withColumn("prefix", coalesce(
        sum(col("tot")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("prefix"))
    local.join(broadcast(prefix), "shard")
      .withColumn("en", col("cum") + col("prefix"))
      .withColumn("strt", col("en") - col("n_tok"))
      .withColumn("seq_id",
        explode(sequence(expr(s"strt DIV $seqLen"), expr(s"(en - 1) DIV $seqLen"))))
      .select(col("doc_id"), col("seq_id"),
        (greatest(col("strt"), col("seq_id") * seqLen) - col("strt")).as("doc_off"),
        (least(col("en"), (col("seq_id") + 1) * seqLen)
          - greatest(col("strt"), col("seq_id") * seqLen)).as("n_tok_in_seq"))
  }
}
