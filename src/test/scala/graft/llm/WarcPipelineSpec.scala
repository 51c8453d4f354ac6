package graft.llm

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.storage.TxTable

/** [[CuratePipeline.runWarc]] — the crawl-native end-to-end: landing
  * .warc files → record split → HTML→text extraction → canonical-URL
  * doc ids + registered-domain source → error routing → quality gate →
  * history-aware dedup → corpus TxTable. Pins the WARC-specific
  * contracts on top of what CrawlPipelineSpec already proves for the
  * batch body: a URI-less record is a countable error, not a silent
  * drop; a RECRAWL of the same page under a differently-spelled URL
  * (case, tracking params) maps to the same doc_id and is collapsed
  * as an exact dup by history; a near-dup page under a genuinely new
  * URL is still caught by the MinHash state; `source` is the
  * registered domain the downstream quota/profile stages expect.
  */
class WarcPipelineSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def rec(uri: String, html: String): String =
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n" +
      s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html\r\n\r\n"

  private def page(text: String): String =
    s"<html><head><title>T</title></head><body><p>$text</p></body></html>"

  private val longA = (1 to 80).map(i => s"alpha$i").mkString(" ")
  private val longB = (1 to 80).map(i => s"beta$i").mkString(" ")
  private val longADup = (1 to 77).map(i => s"alpha$i").mkString(" ")
  private val longC = (1 to 80).map(i => s"gamma$i").mkString(" ")

  test("warc drops -> extraction/errors/quality/dedup, recrawl-stable ids") {
    val land = Files.createTempDirectory("warc_land").toString
    val base = Files.createTempDirectory("warc_tbl").toString
    val state = new TxTable(spark, s"$base/state")
    val sink = new TxTable(spark, s"$base/sink")
    val errs = new TxTable(spark, s"$base/errs")
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val bi = new BandIndex(spark, s"warc_b_$run")
    val di = new DigestIndex(spark, s"warc_d_$run")

    val q = CuratePipeline.runWarc(spark, land, state, sink, errs,
      Files.createTempDirectory("warc_ck").toString,
      bands = Some(bi), digests = Some(di))
    try {
      // drop 1: two good pages on different registered domains, a
      // URI-less metadata record (countable error), a too-short page
      // (quality reject — extracted fine, gated before admission)
      Files.writeString(Paths.get(land, "drop-1.warc"),
        rec("https://www.NewsA.com/Articles/1?utm_source=f&b=2", page(longA)) +
          rec("https://blog.SiteB.co.uk/posts/2", page(longB)) +
          "WARC/1.0\r\nWARC-Type: metadata\r\n\r\nignored payload\r\n\r\n" +
          rec("https://www.NewsA.com/short", page("too short")))
      q.processAllAvailable()
      // drop 2: a RECRAWL of page 1 under a differently-spelled URL
      // (scheme/host case, tracking params reordered — same canonical
      // => same doc_id => exact dup vs history), a near-dup of longA
      // under a new URL, and a genuinely new page
      Files.writeString(Paths.get(land, "drop-2.warc"),
        rec("HTTPS://WWW.NewsA.COM:443/Articles/1?b=2&fbclid=zz", page(longA)) +
          rec("https://www.NewsA.com/Articles/99", page(longADup)) +
          rec("https://docs.SiteC.com/intro", page(longC)))
      q.processAllAvailable()
    } finally q.stop()

    // errors: exactly the URI-less record, with its head as raw_line
    val errLines = errs.read().select("raw_line").as[String].collect()
    assert(errLines.length === 1)
    assert(errLines.head.contains("WARC-Type: metadata"))

    // admitted: longA + longB from drop 1, longC from drop 2 — the
    // recrawl collapsed by canonical-URL id, the near-dup by state.
    // The sink keeps (doc_id, text, p_date): the registered-domain
    // source IS the partition value (CuratePipeline.sinkPartition)
    val admitted = sink.read()
      .select($"p_date", $"text").as[(String, String)].collect().toMap
    assert(admitted.keySet === Set("newsa.com", "siteb.co.uk", "sitec.com"))
    assert(admitted("newsa.com").contains("alpha80") &&
      !admitted("newsa.com").contains("<p>"),
      "extraction must strip markup and keep the body text")
    assert(admitted("sitec.com").contains("gamma80"))
    // title text rides the extraction (visible text), markup does not
    assert(admitted("siteb.co.uk").startsWith("T "))

    // recrawl stability: both spellings canonicalize to one id —
    // 3 admitted rows, 3 distinct ids, none from the dup spelling
    assert(sink.read().select($"doc_id").distinct().count() === 3L)
    // the quality reject never reached the dedup state
    val shortId = Seq("https://www.NewsA.com/short").toDF("u")
      .select(org.apache.spark.sql.functions.xxhash64(
        WebOps.canonicalUrl($"u"))).head().getLong(0)
    assert(!state.read().select($"doc_id").as[Long].collect().contains(shortId))

    spark.sql(s"DROP TABLE IF EXISTS ${bi.table}")
    spark.sql(s"DROP TABLE IF EXISTS ${di.table}")
  }
}
