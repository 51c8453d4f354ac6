package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WebOps]] — HTML→text extraction and URL canonicalization
  * semantics on hand-built cases, including the edges the catalog
  * fixture doesn't exercise (no query string, all-tracking query,
  * empty path, http default port, bare hosts).
  */
class WebOpsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def one(s: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(s).toDF("v").select(f(col("v")).as("r")).head().getString(0)

  test("decodeEntities decodes the five entities, &amp; last") {
    assert(one("a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp; f",
      WebOps.decodeEntities) == "a <b> \"c\" 'd' e & f")
    // double-encoded: the author wrote the literal string "&lt;"
    assert(one("&amp;lt;", WebOps.decodeEntities) == "&lt;")
  }

  test("htmlText drops script/style/comment subtrees and flattens tags") {
    val html = "<html><head><title>T</title>" +
      "<style>p { color: red; }</style>" +
      "<script>if (1 < 2) { x = \"a&b\"; }</script></head>" +
      "<body><!-- c1 --><p>Hello <b>world</b></p><!-- c2 --></body></html>"
    assert(one(html, WebOps.htmlText) == "T Hello world")
    assert(one(html, WebOps.htmlTitle) == "T")
  }

  test("htmlTitle is empty without a title and collapses whitespace") {
    assert(one("<html><body>x</body></html>", WebOps.htmlTitle) == "")
    assert(one("<title>  A\n  B </title>", WebOps.htmlTitle) == "A B")
  }

  test("canonicalUrl: case, default ports, www, fragment, tracking, sort") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag" ->
        "https://example.com/A/b?a=1&b=2",
      "http://Example.com:80" -> "http://example.com/",
      // non-default port survives; path case preserved
      "https://api.Example.com:8443/V1" -> "https://api.example.com:8443/V1",
      // all-tracking query → no '?'
      "https://a.com/p?utm_source=x&fbclid=y&gclid=z&msclkid=w&mc_eid=v" ->
        "https://a.com/p",
      // 'utm=x' is NOT a tracking prefix ('utm_' is)
      "https://a.com/p?utm=x" -> "https://a.com/p?utm=x",
      "https://a.com///" -> "https://a.com/")
    val got = cases.map(_._1).toDF("v")
      .select(col("v"), WebOps.canonicalUrl(col("v")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"canonicalUrl($in)")
    }
  }

  test("two spellings of one resource canonicalize equal") {
    val a = WebOps.canonicalUrl(lit("HTTPS://WWW.Site.COM:443/x/?b=2&a=1&utm_source=f#s"))
    val b = WebOps.canonicalUrl(lit("https://site.com/x?a=1&fbclid=q&b=2"))
    val r = Seq(1).toDF("i").select(a.as("a"), b.as("b")).head()
    assert(r.getString(0) == r.getString(1))
  }

  test("warcRecords/warcHeader/warcHttpBody round-trip a 2-record blob") {
    def rec(uri: String, body: String): String =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n" +
        s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body\r\n\r\n"
    val blob = rec("https://a.com/1", "<p>alpha</p>") +
      rec("https://b.com/2", "beta & <b>gamma</b>")
    val rows = Seq(blob).toDF("v")
      .select(explode(WebOps.warcRecords(col("v"))).as("r"))
      .select(WebOps.warcHeader(col("r"), "WARC-Target-URI").as("uri"),
        WebOps.warcHeader(col("r"), "Content-Length").cast("long").as("clen"),
        WebOps.warcHttpBody(col("r")).as("body"))
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "https://a.com/1")
    assert(rows(0).getString(2) == "<p>alpha</p>")
    assert(rows(1).getString(2) == "beta & <b>gamma</b>")
    rows.foreach(r => assert(r.getLong(1) == r.getString(2).length))
    // header lookup is case-insensitive (ANVL/HTTP convention)
    assert(one(blob.split("WARC/1\\.0\r\n")(1),
      c => WebOps.warcHeader(c, "content-length")) == "12")
  }

  test("robotsRules: group scope, comments, case, blank-disallow idiom") {
    val body = Seq(
      "# our crawler's group",
      "User-Agent: graftbot",
      "user-agent: otherbot",      // run-mate: shares the group
      "Disallow: /private",
      "Allow: /private/ok  # inline comment",
      "",
      "User-agent: evilbot",       // not us: rules ignored
      "Disallow: /",
      "",
      "User-agent: *",             // star group also collected
      "Disallow: /tmp",
      "Disallow:",                 // allow-all idiom: no rule
      "Crawl-delay: 10"            // unknown directive: ignored
    ).mkString("\r\n")
    val rules = Seq(body).toDF("b")
      .select(explode(WebOps.robotsRules(col("b"), "GraftBot")).as("r"))
      .select(col("r.prefix"), col("r.allow"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(rules === Seq(("/private", false), ("/private/ok", true),
      ("/tmp", false)))
  }

  test("robotsMatchRank: longest match wins, Allow wins ties, no-match allows") {
    val rules = Seq(
      ("/Articles", true), ("/Articles/item1", false),
      ("/x", false), ("/x", true)).toDF("prefix", "allow")
    def decide(path: String): Boolean = {
      val rk = rules
        .agg(max(WebOps.robotsMatchRank(lit(path), col("prefix"), col("allow"))))
        .head().get(0)
      rk == null || rk.asInstanceOf[Long] % 2 == 1
    }
    assert(decide("/Articles/item2"))          // short Allow matches
    assert(!decide("/Articles/item1"))         // longer Disallow wins
    assert(decide("/x"))                       // equal length: Allow wins
    assert(decide("/elsewhere"))               // no rule: allowed
  }

  test("registeredDomain: two labels, ccSLD three labels, bare host") {
    val cases = Seq(
      "a.b.example.com" -> "example.com",
      "example.com" -> "example.com",
      "news.site1.co.uk" -> "site1.co.uk",
      "deep.a.b.com.au" -> "b.com.au",
      // the ccSLD itself has no registrable label below it — stays as-is
      "co.uk" -> "co.uk",
      "localhost" -> "localhost")
    val got = cases.map(_._1).toDF("v")
      .select(col("v"), WebOps.registeredDomain(col("v")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"registeredDomain($in)")
    }
  }
}
