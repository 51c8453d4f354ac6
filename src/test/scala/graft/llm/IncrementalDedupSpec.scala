package graft.llm

import graft.SparkSpec
import graft.storage.TxTable
import org.apache.spark.sql.functions._

/** [[IncrementalDedup.admit]] — increment-vs-history dedup over a
  * TxTable fingerprint state: exact and near dups against prior
  * batches are rejected, admissions fold in idempotently (a
  * redelivered batch is a version-preserving no-op), and the change
  * feed carries exactly the admitted fingerprints.
  */
class IncrementalDedupSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def table() = new TxTable(spark,
    java.nio.file.Files.createTempDirectory("incdedup").toString)

  private val longA = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
  private val longB = ("one two three four five six seven eight nine ten " * 4).trim

  test("exact and near dups vs history rejected; fresh admitted; redelivery is a no-op") {
    val t = table()
    val b1 = Seq((1L, longA), (2L, longB)).toDF("id", "text")
    val a1 = IncrementalDedup.admit(t, b1, col("id"), col("text"), "2021-01-01")
    assert(a1.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))

    val nearA = longA.split(" ").dropRight(3).mkString(" ") // minhash near-dup of doc 1
    val b2 = Seq(
      (10L, longA),                       // exact dup of history
      (11L, nearA),                       // near dup of history
      (12L, "completely different words about ships and storms and salt"),
      (13L, "completely different words about ships and storms and salt") // in-batch dup
    ).toDF("id", "text")
    val v1 = t.version
    val a2 = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02")
    assert(a2.select("doc_id").as[Long].collect().toSeq === Seq(12L),
      "only the genuinely fresh doc may be admitted")
    assert(t.read().count() === 3)

    // change feed: the increment delivered exactly doc 12's fingerprint
    val fed = t.readChangesSince(v1).select("doc_id").as[Long].collect().toSeq
    assert(fed === Seq(12L))

    // crash-redelivery of the same batch: everything already folded,
    // so NOTHING re-admits (downstream double delivery impossible)
    // and the no-op upsert does not even bump the table version
    val v2 = t.version
    val a2again = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02")
    assert(a2again.count() === 0, "redelivered batch must admit nothing")
    assert(t.version === v2, "idempotent redelivery must not commit")
    assert(t.read().count() === 3)
  }

  test("docs too short to shingle dedup exactly but never near-match") {
    val t = table()
    IncrementalDedup.admit(t, Seq((1L, "tiny doc")).toDF("id", "text"),
      col("id"), col("text"), "2021-01-01")
    val b2 = Seq((2L, "tiny doc"), (3L, "tiny document")).toDF("id", "text")
    val a = IncrementalDedup.admit(t, b2, col("id"), col("text"), "2021-01-02")
    assert(a.select("doc_id").as[Long].collect().sorted.toSeq === Seq(3L))
  }
}
