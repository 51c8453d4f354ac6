package graft.catalog

import graft.core.Tables
import graft.llm.WebOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-ingest front-end queries ([[graft.llm.WebOps]]): HTML→text
  * extraction, URL canonicalization + dedup, registered-domain stats
  * behind a blocklist — the crawl-side stage of a C4/CCNet-style
  * curation pipeline, upstream of everything else in the catalog.
  *
  * `documents` carries clean text, so each query synthesizes its
  * crawl-shaped input (HTML wrapper, messy URL) DETERMINISTICALLY from
  * `doc_id`/`text` inside both the Spark plan and the DuckDB oracle —
  * the established perturbed-fixture discipline (LlmQueries header).
  * Every WebOps primitive is a per-row codegen'd expression; the only
  * shuffles below are the final aggregations, so the shapes hold
  * unchanged at 100 TB (narrow transform in the scan span → one
  * hash-aggregate on the canonical key / domain).
  */
object WebQueries {

  private def num(c: Column): Column = c.cast("string")

  // ------------------------------------------------- HTML extraction
  /** A crawl page per document: title + style/script subtrees (whose
    * character data must NOT leak into the text — the script contains
    * a bare `<` and an `&`), an HTML comment, nav boilerplate, and
    * entity-encoded punctuation. The extraction recovers title and
    * visible text; hits on either are hash-verified per document.
    */
  private def htmlOf(doc: Column, text: Column): Column =
    concat(
      lit("<html><head><title> Doc "), num(doc), lit(" &amp; Notes </title>"),
      lit("<style>p { color: #333; }</style>"),
      lit("<script type=\"text/javascript\">if (1 < 2) { x = \"a&b\"; }</script>"),
      lit("</head><body><!-- header --><h1>Doc "), num(doc), lit("</h1>"),
      lit("<p>"), substring(text, 1, 240), lit("</p>"),
      lit("<div class=\"nav\"><a href=\"/home\">Home</a>&nbsp;|&nbsp;"),
      lit("<a href=\"/about\">About</a></div>"),
      lit("<p>See <a href=\"https://www.Example"), num((doc * 2 + 1) % 7),
      lit(".com/p"), num(doc % 5), lit("\">more</a> and "),
      lit("<a href=\"HTTP://News.Site"), num((doc + 2) % 4),
      lit(".CO.UK:80/q?utm_source=z\">source</a>.</p>"),
      lit("<p>&lt;fin&gt; &quot;ok&quot; &#39;done&#39;</p></body></html>"))

  private val htmlOfSql: String =
    """'<html><head><title> Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; Notes </title>' ||
      |      '<style>p { color: #333; }</style>' ||
      |      '<script type="text/javascript">if (1 < 2) { x = "a&b"; }</script>' ||
      |      '</head><body><!-- header --><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
      |      '<p>' || substring(text, 1, 240) || '</p>' ||
      |      '<div class="nav"><a href="/home">Home</a>&nbsp;|&nbsp;' ||
      |      '<a href="/about">About</a></div>' ||
      |      '<p>See <a href="https://www.Example' || CAST((doc_id * 2 + 1) % 7 AS VARCHAR) ||
      |      '.com/p' || CAST(doc_id % 5 AS VARCHAR) || '">more</a> and ' ||
      |      '<a href="HTTP://News.Site' || CAST((doc_id + 2) % 4 AS VARCHAR) ||
      |      '.CO.UK:80/q?utm_source=z">source</a>.</p>' ||
      |      '<p>&lt;fin&gt; &quot;ok&quot; &#39;done&#39;</p></body></html>'""".stripMargin

  /** DuckDB twin of [[WebOps.decodeEntities]] (same pass order —
    * `&amp;` last).
    */
  private def decodeSql(e: String): String = {
    val steps = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "''", "&amp;" -> "&")
    steps.foldLeft(e) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }
  }

  private def htmlExtractQ(s: SparkSession, d: String): DataFrame = {
    val html = htmlOf(col("doc_id"), col("text"))
    // single-element Generate barrier: three sibling consumers of the
    // extracted body would otherwise each get their own copy of the
    // regex chain via CollapseProject (the r16 sibling-duplication
    // trap, Dedup.docSigWithSet)
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"),
        WebOps.htmlTitle(html).as("title"),
        explode_outer(array(WebOps.htmlText(html))).as("body"))
      .select(col("doc_id"), col("title"),
        length(col("body")).cast("long").as("n_text_chars"),
        substring(col("body"), 1, 60).as("preview"),
        md5(col("body")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  private val htmlExtractSql: String = {
    val title = s"trim(regexp_replace(${decodeSql(
        "regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)")}, '\\s+', ' ', 'g'))"
    val text = {
      val noComment = "regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g')"
      val noScript = s"regexp_replace($noComment, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
      val noStyle = s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
      val noTags = s"regexp_replace($noStyle, '(?s)<[^>]*>', ' ', 'g')"
      s"trim(regexp_replace(${decodeSql(noTags)}, '\\s+', ' ', 'g'))"
    }
    s"""WITH pages AS (
       |  SELECT doc_id, $htmlOfSql AS html
       |  FROM documents
       |), ext AS (SELECT doc_id, $title AS title, $text AS body FROM pages)
       |SELECT doc_id, title, CAST(length(body) AS BIGINT) AS n_text_chars,
       |       substring(body, 1, 60) AS preview, md5(body) AS text_md5
       |FROM ext ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- URL canonical + dedup
  /** A messy crawl URL per document: scheme/host case noise, an
    * explicit default port, a ccSLD host class, an optional trailing
    * slash, tracking params around the real ones, and a fragment.
    * Every piece is a deterministic residue of `doc_id`, so the same
    * expression reproduces it in the oracle.
    */
  private def urlOf(doc: Column): Column =
    concat(
      when(doc % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
      lit("://"),
      when(doc % 3 === 0,
        concat(lit("News.Site"), num(doc % 4), lit(".CO.UK")))
        .otherwise(concat(lit("WWW.Example"), num(doc % 7), lit(".COM"))),
      when(doc % 4 === 0, lit(":443")).otherwise(lit("")),
      lit("/Articles/item"), num(doc % 13),
      when(doc % 6 === 0, lit("/")).otherwise(lit("")),
      lit("?b=2&utm_source=feed"),
      when(doc % 3 === 0, lit("&a=1")).otherwise(lit("")),
      lit("&fbclid=abc123"),
      when(doc % 5 === 0, lit("#sec2")).otherwise(lit("")))

  private val urlOfSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
      |      (CASE WHEN doc_id % 3 = 0
      |            THEN 'News.Site' || CAST(doc_id % 4 AS VARCHAR) || '.CO.UK'
      |            ELSE 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' END) ||
      |      (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
      |      '/Articles/item' || CAST(doc_id % 13 AS VARCHAR) ||
      |      (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
      |      '?b=2&utm_source=feed' ||
      |      (CASE WHEN doc_id % 3 = 0 THEN '&a=1' ELSE '' END) ||
      |      '&fbclid=abc123' ||
      |      (CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END)""".stripMargin

  /** DuckDB twin of [[WebOps.canonicalUrl]] over a column named `url`
    * — identical RE2 patterns, identical pass order.
    */
  private val canonSql: String = {
    val scheme = "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hostport = "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    val noPort = s"""CASE WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '', 'g')
                    |           WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '', 'g')
                    |           ELSE $hostport END""".stripMargin
    val host = s"regexp_replace($noPort, '^www\\.', '', 'g')"
    val rawPath = "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    val path = s"""CASE WHEN regexp_replace($rawPath, '/+$$', '', 'g') = '' THEN '/'
                  |           ELSE regexp_replace($rawPath, '/+$$', '', 'g') END""".stripMargin
    val rawQ = "regexp_extract(regexp_replace(url, '#.*$', '', 'g'), '\\?(.*)$', 1)"
    val tracked = WebOps.TrackingParams
      .map(t => s"starts_with(lower(p), '$t')").mkString(" OR ")
    val q = s"""array_to_string(list_sort(list_filter(string_split($rawQ, '&'),
               |        p -> p <> '' AND NOT ($tracked))), '&')""".stripMargin
    s"""$scheme || '://' || $host || $path ||
       |      (CASE WHEN $q = '' THEN '' ELSE '?' || $q END)""".stripMargin
  }

  /** URL-level dedup: raw spellings (plus a tracking-param variant of
    * every fifth URL) grouped by canonical form — `n_raw` is the
    * collapse factor, `first_doc` the keep-first representative. The
    * 100 TB shape is one narrow canonicalization in the scan span and
    * one hash-aggregate keyed by the canonical string.
    */
  private def urlCanonQ(s: SparkSession, d: String): DataFrame = {
    // NO Generate barrier here, deliberately (the domainStatsQ trap
    // does not bite): canonicalUrl references the url ~8 times, but
    // each reference is one cheap concat rebuild — linear, not the
    // ~40x nested-chain blowup registeredDomain∘urlHost caused — and
    // the barrier costs more than it saves (alternating PairBench
    // r17, 7 warm rounds: barrier 1.33 s vs inline 1.08 s — the
    // Generate blocks the variant branch's doc_id%5 scan pushdown)
    val base = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), urlOf(col("doc_id")).as("url"))
    val variant = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(regexp_replace(col("url"), "utm_source=feed", "utm_campaign=x"),
          lit("&gclid=zz")).as("url"))
    base.unionByName(variant)
      .select(col("doc_id"), WebOps.canonicalUrl(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_raw"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("canon_url"))
  }

  private val urlCanonSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, $urlOfSql AS url FROM documents
       |), withvar AS (
       |  SELECT doc_id, url FROM base
       |  UNION ALL
       |  SELECT doc_id + 100000,
       |         regexp_replace(url, 'utm_source=feed', 'utm_campaign=x', 'g')
       |           || '&gclid=zz'
       |  FROM base WHERE doc_id % 5 = 0
       |), canon AS (
       |  SELECT doc_id, $canonSql AS canon_url FROM (SELECT doc_id, url FROM withvar)
       |)
       |SELECT canon_url, CAST(count(*) AS BIGINT) AS n_raw,
       |       min(doc_id) AS first_doc
       |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- domain stats + blocklist
  private val blocklist = Seq("example3.com", "site1.co.uk")

  /** Per-registered-domain corpus profile behind a blocklist: the
    * decision table a crawl curator ranks and prunes by. The blocklist
    * is a LITERAL here and a broadcast anti-join at deployment; either
    * way the probe side never shuffles on it.
    */
  private def domainStatsQ(s: SparkSession, d: String): DataFrame = {
    // two Generate barriers (url, then host): registeredDomain
    // references its host ~6 times (split x3, ccSLD isin, slices) and
    // urlHost references the url ~6 more — without the barriers the
    // projection inlined the full url regex chain ~40 times (found
    // r17: 1.2-1.5 s for a 5k-row scan+agg; the plan printout alone
    // was 40 KB) and the blocklist filter then CLONED the whole
    // domain expression below the projection
    Tables.fanOut(Tables.documents(s, d))
      .select(col("lang"), col("n_chars"),
        explode_outer(array(urlOf(col("doc_id")))).as("url"))
      .select(col("lang"), col("n_chars"),
        explode_outer(array(WebOps.urlHost(col("url")))).as("host"))
      .select(col("lang"), col("n_chars"),
        WebOps.registeredDomain(col("host")).as("domain"))
      .filter(!col("domain").isin(blocklist: _*))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("domain"))
  }

  /** DuckDB twin of [[WebOps.urlHost]] over expression `e` — the
    * port strip is scheme-unconditional `:(443|80)$` (the fixtures
    * never pair http with :443 or https with :80).
    */
  private def hostSqlOf(e: String): String = {
    val hostport = s"lower(regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    val noPort = s"regexp_replace($hostport, ':(443|80)$$', '', 'g')"
    s"regexp_replace($noPort, '^www\\.', '', 'g')"
  }

  /** DuckDB twin of [[WebOps.registeredDomain]] over in-scope columns
    * `host` and `labels` (= string_split(host, '.')).
    */
  private val domainCaseSql: String = {
    val ccslds = WebOps.CcSlds.map(x => s"'$x'").mkString(", ")
    s"""CASE WHEN len(labels) <= 2 THEN host
       |              WHEN array_to_string(labels[len(labels)-1:len(labels)], '.')
       |                     IN ($ccslds) AND len(labels) >= 3
       |                THEN array_to_string(labels[len(labels)-2:len(labels)], '.')
       |              ELSE array_to_string(labels[len(labels)-1:len(labels)], '.')
       |         END""".stripMargin
  }

  private val domainStatsSql: String = {
    val host = hostSqlOf("url")
    val blocked = blocklist.map(x => s"'$x'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, lang, n_chars, $urlOfSql AS url FROM documents
       |), hosts AS (
       |  SELECT doc_id, lang, n_chars, $host AS host,
       |         string_split($host, '.') AS labels
       |  FROM base
       |), dom AS (
       |  SELECT doc_id, lang, n_chars,
       |         $domainCaseSql AS domain
       |  FROM hosts
       |)
       |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       |FROM dom WHERE domain NOT IN ($blocked)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------- link graph
  /** Domain→domain outlink edges: hrefs extracted from each page,
    * relative links dropped, the rest canonicalized to their
    * registered domain and aggregated against the page's own domain —
    * the edge list domain-level PageRank/HITS ([[graft.llm.GraphOps]])
    * rank at crawl-curation time. 100 TB shape: extraction and both
    * domain reductions are per-row expressions riding the scan; the
    * single shuffle is the (src, dst) hash-aggregate, whose key space
    * is domains², not pages².
    */
  private def linkGraphQ(s: SparkSession, d: String): DataFrame = {
    val html = htmlOf(col("doc_id"), col("text"))
    // host barriers on both sides before registeredDomain (the
    // domainStatsQ expression-duplication lesson); the link explode
    // is itself a Generate, so `link` is already an attribute
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"),
        explode_outer(array(WebOps.urlHost(urlOf(col("doc_id"))))).as("src_host"),
        col("text"))
      .select(col("doc_id"), col("src_host"),
        explode(WebOps.extractLinks(html)).as("link"))
      .filter(WebOps.urlScheme(col("link")).isin("http", "https"))
      .select(col("doc_id"),
        WebOps.registeredDomain(col("src_host")).as("src_domain"),
        explode_outer(array(WebOps.urlHost(col("link")))).as("dst_host"))
      .select(col("doc_id"), col("src_domain"),
        WebOps.registeredDomain(col("dst_host")).as("dst_domain"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("src_domain"), col("dst_domain"))
  }

  private val linkGraphSql: String = {
    val srcHost = hostSqlOf("url")
    val dstHost = hostSqlOf("link")
    s"""WITH pages AS (
       |  SELECT doc_id, $htmlOfSql AS html, $urlOfSql AS url FROM documents
       |), srch AS (
       |  SELECT doc_id, $srcHost AS host, string_split($srcHost, '.') AS labels
       |  FROM pages
       |), srcdom AS (
       |  SELECT doc_id, $domainCaseSql AS src_domain FROM srch
       |), links AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(html, '(?is)<a[^>]*href="([^"]*)"', 1)) AS link
       |  FROM pages
       |), absl AS (
       |  SELECT doc_id, link FROM links
       |  WHERE lower(regexp_extract(link, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |          IN ('http', 'https')
       |), dsth AS (
       |  SELECT doc_id, $dstHost AS host, string_split($dstHost, '.') AS labels
       |  FROM absl
       |), dstdom AS (
       |  SELECT doc_id, $domainCaseSql AS dst_domain FROM dsth
       |)
       |SELECT src_domain, dst_domain,
       |       CAST(count(*) AS BIGINT) AS n_links,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM dstdom JOIN srcdom USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------ WARC parse
  /** WARC round-trip gate: response records (WARC headers → HTTP
    * headers → HTML payload → CRLF CRLF terminator) are assembled into
    * one blob per `source` — `string_agg` ordered by doc_id, the
    * crawl-file analog — then [[graft.llm.WebOps.warcRecords]] splits
    * and the header/body accessors recover URI, record id, declared
    * length, and payload; `len_ok` pins the declared Content-Length
    * against the parsed body, `body_md5` hash-gates the payload
    * byte-for-byte. At 100 TB the blob step is the FILE, not a group
    * — thousands of ~1 GB WARCs scanned concurrently, each parsed by
    * this same per-blob column form.
    */
  private def warcParseQ(s: SparkSession, d: String): DataFrame = {
    val html = htmlOf(col("doc_id"), col("text"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
      urlOf(col("doc_id")),
      lit("\r\nWARC-Record-ID: <urn:uuid:"), num(col("doc_id")),
      lit(">\r\nContent-Length: "), num(length(html)),
      lit("\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
      html, lit("\r\n\r\n"))
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), rec.as("rec"))
      .groupBy(col("source"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")), "").as("blob"))
      .select(col("source"),
        explode(graft.llm.WebOps.warcRecords(col("blob"))).as("r"))
      .select(col("source"),
        regexp_extract(WebOps.warcHeader(col("r"), "WARC-Record-ID"),
          "<urn:uuid:([0-9]+)>", 1).cast("long").as("rec_no"),
        WebOps.warcHeader(col("r"), "WARC-Target-URI").as("uri"),
        WebOps.warcHeader(col("r"), "Content-Length").cast("long").as("clen"),
        WebOps.warcHttpBody(col("r")).as("body"))
      .select(col("source"), col("rec_no"), col("uri"), col("clen"),
        (col("clen") === length(col("body"))).as("len_ok"),
        md5(col("body")).as("body_md5"))
      .orderBy(col("rec_no"))
  }

  private val warcParseSql: String =
    s"""WITH pages AS (
       |  SELECT doc_id, source, $htmlOfSql AS html, $urlOfSql AS url FROM documents
       |), recs AS (
       |  SELECT doc_id, source,
       |         'WARC/1.0' || E'\\r\\n' || 'WARC-Type: response' || E'\\r\\n' ||
       |         'WARC-Target-URI: ' || url || E'\\r\\n' ||
       |         'WARC-Record-ID: <urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' || E'\\r\\n' ||
       |         'Content-Length: ' || CAST(length(html) AS VARCHAR) || E'\\r\\n\\r\\n' ||
       |         'HTTP/1.1 200 OK' || E'\\r\\n' || 'Content-Type: text/html' || E'\\r\\n\\r\\n' ||
       |         html || E'\\r\\n\\r\\n' AS rec
       |  FROM pages
       |), blobs AS (
       |  SELECT source, string_agg(rec, '' ORDER BY doc_id) AS blob
       |  FROM recs GROUP BY 1
       |), rs AS (
       |  SELECT source,
       |         unnest(list_filter(string_split_regex(blob, 'WARC/1\\.0\\r\\n'),
       |                            r -> r <> '')) AS r
       |  FROM blobs
       |), parsed AS (
       |  SELECT source,
       |         CAST(regexp_extract(regexp_extract(r, '(?im)^WARC-Record-ID: *([^\\r\\n]*)', 1),
       |                             '<urn:uuid:([0-9]+)>', 1) AS BIGINT) AS rec_no,
       |         regexp_extract(r, '(?im)^WARC-Target-URI: *([^\\r\\n]*)', 1) AS uri,
       |         CAST(regexp_extract(r, '(?im)^Content-Length: *([^\\r\\n]*)', 1) AS BIGINT) AS clen,
       |         regexp_replace(regexp_replace(regexp_replace(r,
       |           '(?s)^.*?\\r\\n\\r\\n', '', 'g'), '(?s)^.*?\\r\\n\\r\\n', '', 'g'),
       |           '(\\r\\n)+$$', '', 'g') AS body
       |  FROM rs
       |)
       |SELECT source, rec_no, uri, clen,
       |       (clen = length(body)) AS len_ok, md5(body) AS body_md5
       |FROM parsed ORDER BY rec_no""".stripMargin

  // ---------------------------------------------------- robots filter
  /** DuckDB twin of [[WebOps.urlPath]] over expression `e`. */
  private def pathSqlOf(e: String): String = {
    val raw = s"regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    s"""CASE WHEN regexp_replace($raw, '/+$$', '', 'g') = '' THEN '/'
       |              ELSE regexp_replace($raw, '/+$$', '', 'g') END""".stripMargin
  }

  /** The crawl-politeness gate: per-domain (prefix, allow) rules —
    * RFC 9309 longest-match / allow-wins-ties semantics — applied to
    * every URL via [[WebOps.robotsMatchRank]]'s one-integer-aggregate
    * decision. The rule table is a literal here (the parser that
    * produces it from robots.txt bodies is [[WebOps.robotsRules]],
    * spec-gated); at deployment it is a per-domain broadcast frame,
    * so the probe side is one broadcast join + one max aggregate —
    * no sort, no window, corpus-linear. The fixture exercises the
    * three decisive shapes: a longer Disallow under a shorter Allow,
    * an equal-length Allow/Disallow tie (Allow wins), and a
    * block-all domain.
    */
  private val robotsRules: Seq[(String, String, Boolean)] = Seq(
    ("example1.com", "/Articles", true),
    ("example1.com", "/Articles/item1", false),
    ("example2.com", "/Articles/item2", false),
    ("example2.com", "/Articles/item2", true),
    ("example3.com", "/", false),
    ("site1.co.uk", "/Articles/item", false))

  private def robotsFilterQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // url + host barriers (the domainStatsQ expression-duplication
    // lesson): domain and path both derive from the one url attribute
    val urls = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"),
        explode_outer(array(urlOf(col("doc_id")))).as("url"))
      .select(col("doc_id"), col("url"),
        explode_outer(array(WebOps.urlHost(col("url")))).as("host"))
      .select(col("doc_id"),
        WebOps.registeredDomain(col("host")).as("domain"),
        WebOps.urlPath(col("url")).as("path"))
    val rules = robotsRules.toDF("domain", "prefix", "allow")
    val ranked = urls.join(broadcast(rules), Seq("domain"), "left")
      .groupBy(col("doc_id"), col("domain"))
      .agg(max(WebOps.robotsMatchRank(col("path"), col("prefix"), col("allow")))
        .as("rk"))
    ranked
      .select(col("domain"),
        (col("rk").isNull || col("rk") % 2 === 1).as("ok"))
      .groupBy(col("domain"))
      .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("n_allowed"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_blocked"))
      .orderBy(col("domain"))
  }

  private val robotsFilterSql: String = {
    val host = hostSqlOf("url")
    val rulesValues = robotsRules
      .map { case (d, p, a) => s"('$d', '$p', $a)" }.mkString(",\n       |         ")
    s"""WITH base AS (
       |  SELECT doc_id, $urlOfSql AS url FROM documents
       |), hosts AS (
       |  SELECT doc_id, $host AS host, string_split($host, '.') AS labels,
       |         ${pathSqlOf("url")} AS path
       |  FROM base
       |), dom AS (
       |  SELECT doc_id, path, $domainCaseSql AS domain FROM hosts
       |), rules(domain, prefix, allow) AS (
       |  VALUES $rulesValues
       |), ranked AS (
       |  SELECT d.doc_id, d.domain,
       |         max(CASE WHEN starts_with(d.path, r.prefix)
       |             THEN CAST(length(r.prefix) * 2 +
       |                  CASE WHEN r.allow THEN 1 ELSE 0 END AS BIGINT) END) AS rk
       |  FROM dom d LEFT JOIN rules r ON d.domain = r.domain
       |  GROUP BY 1, 2
       |)
       |SELECT domain,
       |       CAST(sum(CASE WHEN rk IS NULL OR rk % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
       |       CAST(sum(CASE WHEN rk IS NULL OR rk % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_blocked
       |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_html_extract" -> htmlExtractQ,
    "llm_url_canon"    -> urlCanonQ,
    "llm_domain_stats" -> domainStatsQ,
    "llm_link_graph"   -> linkGraphQ,
    "llm_warc_parse"   -> warcParseQ,
    "llm_robots_filter" -> robotsFilterQ,
  )

  def oracleSql: Map[String, String] = Map(
    "llm_html_extract" -> htmlExtractSql,
    "llm_url_canon"    -> urlCanonSql,
    "llm_domain_stats" -> domainStatsSql,
    "llm_link_graph"   -> linkGraphSql,
    "llm_warc_parse"   -> warcParseSql,
    "llm_robots_filter" -> robotsFilterSql,
  )
}
