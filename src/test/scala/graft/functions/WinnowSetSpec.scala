package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSetSpec extends SparkSpec {
  import WinnowSet.winnowSet

  private def localWinnow(t: String, k: Int, w: Int): Set[String] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    if (t.length < k + w - 1) Set.empty
    else {
      val hs = (0 to t.length - k).map(i => md5hex(t.substring(i, i + k)))
      (0 to t.length - k - w + 1).map(j => hs.slice(j, j + w).min).toSet
    }
  }

  test("matches brute-force selection on real docs (k=8, w=4)") {
    import graft.SparkSpec.spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val got = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), winnowSet(col("text"), 8, 4).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    for ((id, t) <- docs.take(50))
      assert(got(id).toSet == localWinnow(t, 8, 4), s"doc $id")
    assert(got.forall { case (_, fps) => fps.distinct.size == fps.size })
  }

  test("multi-byte UTF-8 slices by char position; short and null inputs") {
    import graft.SparkSpec.spark.implicits._
    // é (2 bytes), ∀ (3 bytes), 𝛼 (4 bytes = 2 chars in UTF-16 but 1
    // codepoint — UTF8String counts codepoints) interleaved with ASCII
    val uni = "é∀x𝛼yzé∀x𝛼yzé∀x𝛼yz padding so windows exist"
    val rows = Seq(uni, "tiny", null).toDF("t")
      .select(winnowSet(col("t"), 5, 3).as("fps")).collect()
    // brute-force over codepoints (String.substring is UTF-16-based, so
    // walk codepoints explicitly for the 4-byte char)
    val cps = uni.codePoints().toArray
    def sub(i: Int, n: Int) = new String(cps, i, n)
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val hs = (0 to cps.length - 5).map(i => md5hex(sub(i, 5)))
    val expect = (0 to cps.length - 5 - 3 + 1).map(j => hs.slice(j, j + 3).min).toSet
    assert(rows(0).getSeq[String](0).toSet == expect)
    assert(rows(1).getSeq[String](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }

  test("shared passage of length >= k+w-1 guarantees a shared fingerprint") {
    import graft.SparkSpec.spark.implicits._
    val shared = "0123456789ab" // length 12 >= k+w-1 = 11 for k=8,w=4
    val fps = Seq(s"xxxx $shared yyyy", s"qqqq $shared rrrr").toDF("t")
      .select(winnowSet(col("t"), 8, 4).as("fps"))
      .as[Seq[String]].collect()
    assert((fps(0).toSet & fps(1).toSet).nonEmpty)
  }
}
