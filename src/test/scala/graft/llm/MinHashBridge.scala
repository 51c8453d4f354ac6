package graft.llm

import org.apache.spark.sql.Column

/** Test-only bridge exposing the private[llm] minhash scheme pieces
  * to probes outside the llm package (R16AbProbe's old-form inline).
  */
object MinHashBridge {
  def digests(shingle: Column): Seq[Column] = Dedup.minHashDigests(shingle)
  def aggs(k: Int): Seq[Column] = Dedup.minHashAggs(k)
}
