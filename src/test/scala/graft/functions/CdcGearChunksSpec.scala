package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CdcGearChunks]] — native gear-hash content-defined chunking. */
class CdcGearChunksSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // entropic pseudo-text (hex words): gear candidates fire at their
  // expected 1/2^maskBits density, the regime CDC is designed for —
  // on degenerate all-repeats text candidates can vanish and the
  // maxLen forced cut (positional by nature) takes over
  private val text: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to 300).map { i =>
      md.reset()
      md.digest(s"w$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(7)
    }.mkString(" ")
  }

  private def chunksOf(ts: (Long, String)*): Map[Long, Seq[String]] =
    ts.toSeq.toDF("id", "t")
      .select(col("id"),
        CdcGearChunks.cdcGearChunks(col("t"), 16, 256, 6).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("chunks reassemble to the input; interior chunks respect [min, max]") {
    val c = chunksOf(1L -> text)(1L)
    assert(c.mkString === text)
    assert(c.size > 3)
    assert(c.dropRight(1).forall(s => s.length >= 16 && s.length <= 256))
    assert(c.last.length <= 256)
  }

  test("multi-byte UTF-8 never splits a character") {
    val uni = ("héllo wörld 日本語テキスト καλημέρα مرحبا " * 40)
    val c = chunksOf(1L -> uni)(1L)
    assert(c.mkString === uni) // a split code point would corrupt reassembly
    assert(c.size > 1)
  }

  test("a prefix insertion preserves chunks once the gear window passes it") {
    val m = chunksOf(1L -> text, 2L -> ("XYZ " + text))
    val (a, b) = (m(1L), m(2L))
    // gear influence spans 64 bytes: boundaries beyond the first
    // post-insertion window realign, so the shared suffix dominates
    val shared = a.toSet.intersect(b.toSet).size
    assert(shared >= a.size - 3, s"shared $shared of ${a.size}")
  }

  test("mean chunk length tracks 2^maskBits + minLen") {
    val long = (text + " ") * 10
    val c = chunksOf(1L -> long)(1L)
    val mean = long.length.toDouble / c.size
    assert(mean > 40 && mean < 220, s"mean chunk $mean") // expect ~80
  }

  test("empty and sub-minLen inputs: no chunks / one chunk") {
    val m = chunksOf(1L -> "", 2L -> "short")
    assert(m(1L) === Seq.empty)
    assert(m(2L) === Seq("short"))
  }

  test("SQL surface agrees with the Column API") {
    graft.GraftExtensions.register(graft.SparkSpec.spark)
    val viaSql = graft.SparkSpec.spark
      .sql(s"SELECT cdc_gear_chunks('${text.take(200)}', 16, 256, 6) AS c")
      .collect().head.getSeq[String](0)
    val viaCol = chunksOf(1L -> text.take(200))(1L)
    assert(viaSql === viaCol)
  }
}
