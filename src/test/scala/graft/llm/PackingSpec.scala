package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Packing.packSequences]] invariants: the two-level prefix sum is
  * shard-count-invariant (the distributed plan computes EXACTLY the
  * single-window answer), token mass is conserved per doc and per
  * sequence, and every sequence except the last is full.
  */
class PackingSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private val docs = (1L to 200L)
    .map(i => (i, if (i % 7 == 0) 0L else (i * 13 % 97) + 1))
    .toDF("doc_id", "n_tok")

  private def pack(shards: Int) =
    Packing.packSequences(docs, col("doc_id"), col("n_tok"), seqLen = 64L, shards = shards)

  test("shard count never changes the packing (parallel prefix sum is exact)") {
    val one = pack(1).collect().map(_.toSeq).toSet
    assert(pack(32).collect().map(_.toSeq).toSet === one)
    assert(pack(5).collect().map(_.toSeq).toSet === one)
  }

  test("token mass conserved per doc; every sequence but the last is exactly full") {
    val out = pack(8).persist()
    try {
      val perDoc = out.groupBy("doc_id").agg(sum("n_tok_in_seq").as("t"))
        .join(docs.filter(col("n_tok") > 0), "doc_id")
        .filter(col("t") =!= col("n_tok"))
      assert(perDoc.count() === 0, "doc tokens lost or invented across sequences")
      val perSeq = out.groupBy("seq_id").agg(sum("n_tok_in_seq").as("t"))
      val lastSeq = perSeq.agg(max("seq_id")).head().getLong(0)
      assert(perSeq.filter(col("seq_id") =!= lastSeq && col("t") =!= 64L).count() === 0,
        "a non-final sequence is not exactly seqLen tokens")
      // offsets are doc-internal and in range
      assert(out.filter(col("doc_off") < 0 || col("n_tok_in_seq") <= 0).count() === 0)
    } finally out.unpersist()
  }

  test("empty docs occupy no space; empty input returns empty") {
    val out = pack(8)
    assert(out.filter(col("doc_id") % 7 === 0).count() === 0)
    val empty = Packing.packSequences(docs.filter(col("n_tok") < 0),
      col("doc_id"), col("n_tok"), 64L)
    assert(empty.count() === 0)
  }
}
