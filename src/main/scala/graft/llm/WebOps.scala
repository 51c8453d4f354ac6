package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-ingest front-end: HTML→text extraction, URL canonicalization,
  * registered-domain extraction. The stage UPSTREAM of everything else
  * in the LLM curation catalog — C4/CCNet-style pipelines start from
  * crawled HTML + a URL, and dedup/blocklist decisions key on the
  * canonical URL and the registered domain, not the raw string.
  *
  * Everything here is a narrow, per-row column expression built from
  * codegen'd built-ins (`regexp_replace`/`regexp_extract`/`replace`/
  * higher-order array ops) — no UDFs, no shuffle, no state. At 100 TB
  * these run inside the scan's whole-stage-codegen span at full
  * parallelism; the only shuffles in the catalog queries over them are
  * the final aggregations.
  *
  * Regex portability: every pattern is written in the RE2-compatible
  * subset (no backreferences, no lookaround) so the DuckDB oracle can
  * run the IDENTICAL pattern — which is also the subset that keeps
  * Java's engine in linear-ish territory on adversarial inputs.
  */
object WebOps {

  // ------------------------------------------------------ HTML → text

  /** Decode the five HTML entities that matter for text statistics
    * (plus nbsp); `&amp;` LAST so `&amp;lt;` decodes to the literal
    * `&lt;` the author wrote, not `<`.
    */
  def decodeEntities(c: Column): Column = {
    val nbsp = regexp_replace(c, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;", "'")
    regexp_replace(apos, "&amp;", "&")
  }

  /** `<title>` contents, entity-decoded and whitespace-collapsed;
    * empty string when the document has none.
    */
  def htmlTitle(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    trim(regexp_replace(decodeEntities(raw), "\\s+", " "))
  }

  /** Visible text: drop comments and script/style subtrees (their
    * character data is code, not prose), flatten every remaining tag
    * to a space, decode entities, collapse whitespace. Two separate
    * script/style passes instead of `<(script|style)>.*?</\1>` — RE2
    * (the oracle's engine) has no backreferences.
    */
  def htmlText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** All `href` targets of anchor tags, in document order. Double-
    * quoted hrefs only — the normal form crawlers emit; a production
    * variant adds the single-quote pattern as a second pass.
    */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?is)<a[^>]*href=\"([^\"]*)\""), lit(1))

  // ------------------------------------------------------ WARC parsing

  /** Records of a WARC file blob (the crawl-native container —
    * ISO 28500; Common Crawl's distribution format), split on the
    * `WARC/1.0` version line. Separator-based splitting assumes the
    * version line does not occur inside a payload — true for the
    * response-record normal form with text/html payloads this
    * targets; a byte-exact general parser must walk `Content-Length`
    * instead. At deployment the unit of parallelism is the WARC FILE
    * (thousands of ~1 GB files scanned concurrently); this column
    * form handles the per-blob step.
    */
  def warcRecords(blob: Column): Column =
    filter(split(blob, "WARC/1\\.0\r\n"), r => r =!= "")

  /** Value of a named (case-insensitive) header at a line start —
    * WARC headers and HTTP headers share the ANVL field shape.
    * First occurrence wins, which in a response record is the WARC
    * block (it precedes the HTTP block). `name` must be a literal
    * header name (letters/digits/hyphens), not a regex.
    */
  def warcHeader(rec: Column, name: String): Column =
    regexp_extract(rec, s"(?im)^$name: *([^\r\n]*)", 1)

  /** Everything after the first blank line (CRLF CRLF) — the WARC
    * record's payload. Applied twice on a response record it yields
    * the HTTP body; [[warcHttpBody]] does exactly that and trims the
    * record terminator.
    */
  def warcPayload(rec: Column): Column =
    regexp_replace(rec, "(?s)^.*?\r\n\r\n", "")

  /** HTTP body of a response record: skip the WARC header block, skip
    * the HTTP header block, trim the trailing CRLF CRLF record
    * terminator.
    */
  def warcHttpBody(rec: Column): Column =
    regexp_replace(warcPayload(warcPayload(rec)), "(\r\n)+$", "")

  // --------------------------------------------- URL canonicalization

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Tracking-parameter prefixes dropped by [[canonicalUrl]] — the
    * standard analytics/click identifiers that fragment crawl URL
    * space without changing the resource.
    */
  val TrackingParams: Seq[String] =
    Seq("utm_", "fbclid=", "gclid=", "msclkid=", "mc_eid=")

  /** Lowercased scheme (empty when the string has none). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, schemeRe, 1))

  /** Lowercased host WITHOUT default port (`:80` http / `:443` https)
    * and without a leading `www.`.
    */
  def urlHost(url: Column): Column = {
    val hostport = lower(regexp_extract(url, schemeRe + "([^/?#]*)", 2))
    val noPort = when(urlScheme(url) === "https",
        regexp_replace(hostport, ":443$", ""))
      .when(urlScheme(url) === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Path with trailing slashes trimmed, `/` when empty — case is
    * PRESERVED (paths are case-significant, unlike scheme/host).
    */
  def urlPath(url: Column): Column = {
    val raw = regexp_extract(url, schemeRe + "[^/?#]*([^?#]*)", 2)
    val trimmed = regexp_replace(raw, "/+$", "")
    when(trimmed === "", lit("/")).otherwise(trimmed)
  }

  /** Canonical query string: fragment-free, tracking params dropped,
    * remaining `k=v` pairs sorted bytewise; empty string when nothing
    * survives.
    */
  def urlQuery(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val raw = regexp_extract(noFrag, "\\?(.*)$", 1)
    val keep = filter(split(raw, "&"), p => {
      val tracked = TrackingParams
        .map(t => lower(p).startsWith(t))
        .reduce((a, b) => a || b)
      p =!= "" && !tracked
    })
    array_join(array_sort(keep), "&")
  }

  /** Canonical form: lowercased scheme/host, no default port, no
    * `www.`, no fragment, trailing slash trimmed, tracking params
    * dropped, surviving params sorted. Two raw spellings of the same
    * resource compare equal — the key URL-level dedup and blocklists
    * group on.
    */
  def canonicalUrl(url: Column): Column = {
    val q = urlQuery(url)
    concat(urlScheme(url), lit("://"), urlHost(url), urlPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  // ------------------------------------------------ robots.txt rules

  /** Parse a robots.txt body into (path_prefix, allow) rules for one
    * user-agent (RFC 9309 field shapes, NORMAL-FORM group scope): a
    * directive belongs to the most recent `User-agent` header run,
    * and a run is selected when any of its agents is `agent` or `*`.
    * The RFC's cross-group precedence (a named group anywhere
    * suppresses every `*` group) needs a second pass over the file —
    * a deployment that must honor adversarial robots files filters
    * to the named group first; crawl-corpus robots files are
    * overwhelmingly single-group. Case-insensitive field names,
    * `#` comments stripped, blank `Disallow:` (the allow-all idiom)
    * yields no rule per the RFC's "empty pattern matches nothing".
    * Returns array<struct<prefix,allow>> — explode into the
    * broadcastable per-host rule table the decision join uses.
    */
  def robotsRules(body: Column, agent: String): Column = {
    val lines = split(body, "\r?\n")
    val lcAgent = agent.toLowerCase(java.util.Locale.ROOT)
    aggregate(
      lines,
      struct(lit(false).as("inRun"), lit(false).as("sel"),
        array().cast("array<struct<prefix:string,allow:boolean>>").as("rules")),
      (st, raw) => {
        val line = trim(regexp_replace(raw, "#.*$", ""))
        val low = lower(line)
        val isAgent = low.rlike("^user-agent: *")
        val agentOf = trim(regexp_extract(low, "^user-agent: *(.*)$", 1))
        val hit = agentOf === lcAgent || agentOf === "*"
        val dir = when(low.rlike("^allow: *"), lit(true))
          .when(low.rlike("^disallow: *"), lit(false))
        val prefix = trim(regexp_extract(line, "(?i)^(?:dis)?allow: *([^ ]*)$", 1))
        // consecutive User-agent lines form ONE group: membership is
        // the OR over the run; any other line ends the run
        val sel = when(isAgent,
            when(st.getField("inRun"), st.getField("sel") || hit).otherwise(hit))
          .otherwise(st.getField("sel"))
        val addRule = sel && dir.isNotNull && prefix =!= ""
        struct(isAgent.as("inRun"), sel.as("sel"),
          when(addRule,
            concat(st.getField("rules"),
              array(struct(prefix.as("prefix"), dir.as("allow")))))
            .otherwise(st.getField("rules")).as("rules"))
      }).getField("rules")
  }

  /** RFC 9309 §2.2.2 match rank for a URL path against one rule: the
    * LONGEST matching prefix wins and `Allow` wins a length tie, so
    * `max(len(prefix)*2 + allow)` over a URL's matching rules decides
    * in ONE integer aggregate — no sort, no window; null when the
    * rule doesn't match (max ignores it). An odd maximum ⇒ allowed;
    * no matching rule (null max) ⇒ allowed.
    */
  def robotsMatchRank(path: Column, prefix: Column, allow: Column): Column =
    when(path.startsWith(prefix),
      (length(prefix) * 2 + when(allow, 1).otherwise(0)).cast("long"))

  /** Country-code second-level domains under which the registrable
    * name is three labels, not two. A deliberately small, fixed list —
    * the full public-suffix list is a broadcast-joined TABLE at
    * deployment, not a literal; this covers the common cases and the
    * test fixtures.
    */
  val CcSlds: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "co.in", "com.br")

  /** Registrable domain of a (already canonical, port-free) host:
    * last two labels, or last three when the last two form a known
    * ccSLD. A bare or single-label host maps to itself.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", slice(labels, -2, 2))
    val lastThree = concat_ws(".", slice(labels, -3, 3))
    when(n <= 2, host)
      .when(lastTwo.isin(CcSlds: _*) && n >= 3, lastThree)
      .otherwise(lastTwo)
  }
}
