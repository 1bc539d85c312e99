package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML MAIN-CONTENT EXTRACTION — the missing FRONT DOOR of the
  * curation chain: every text operator in this repo assumes extracted
  * plain text (`documents.text`), but real pre-training pipelines
  * start from crawled HTML, where the payload paragraph sits between
  * a nav bar, a script blob, a "read more" link wall and a footer.
  * This is the rule-based (trafilatura-lite / jusText-shaped)
  * extractor: deterministic tag mechanics + per-block length and
  * LINK-DENSITY rules — the two features that do most of the work in
  * published boilerplate-removal evaluations (Kohlschütter et al.
  * WSDM'10 "boilerplate detection using shallow text features";
  * Pomikálek's jusText thesis 2011). Rule-based on purpose: the
  * whole pipeline stays oracle-expressible (same regex chain in
  * DuckDB), engine-replayable, and cheap enough to run at crawl
  * scale — a learned extractor drops in behind the same columns.
  *
  * Mechanics (identical literals both engines, RE2 ∩ Java regex — no
  * backreferences, no lookaround):
  *   1. `<script>…</script>`/`<style>…</style>` blobs, then HTML
  *      comments (which may contain '>'), → ' '
  *   2. every BLOCK-LEVEL closing tag (and `<br>`) → '\n': blocks
  *      are the candidate units, exactly jusText's segmentation
  *   3. per block: anchor-text length (chars inside `<a>…</a>`,
  *      inner tags stripped) BEFORE tag stripping, then strip all
  *      tags, decode the six commonest entities, collapse whitespace
  *   4. keep a block iff `len(text) >= 25` AND
  *      `anchor_len * 3 <= len(text)` (link density ≤ 1/3 — the
  *      jusText default neighborhood); main_text = kept blocks
  *      joined with '\n'
  *
  * Scale shape: a PURE NARROW PROJECTION — regex chain + higher-order
  * array ops per row, all `org.apache.spark.sql.functions` built-ins,
  * ZERO exchanges, zero joins, zero windows. 100 TB of crawl extracts
  * at scan speed and composes with the quality/dedup gates downstream
  * (q195's curation-v4 chain) before anything ever shuffles.
  */
object HtmlExtract {

  /** Minimum stripped-block length (chars) to survive. */
  val minBlockChars = 25

  /** Link-density gate: keep iff anchor_len * LinkDenom <= len. */
  val linkDenom = 3

  // -- shared regex literals (kept to the RE2 ∩ Java dialect) --------
  val scriptPat = "(?is)<script[^>]*>.*?</script>"
  val stylePat = "(?is)<style[^>]*>.*?</style>"
  /** Stripped AFTER script/style (whose bodies may quote comment
    * openers); a comment may contain '>' — the bare tag regex would
    * leave its tail behind as phantom text. */
  val commentPat = "(?s)<!--.*?-->"
  val blockClosePat =
    "(?i)</(p|div|li|h1|h2|h3|h4|h5|h6|tr|ul|ol|table|blockquote|nav|footer|header|section|article|head|body|html|title)>|<br[^>]*>"
  val anchorPat = "(?is)<a[^>]*>(.*?)</a>"
  val tagPat = "<[^>]*>"
  val wsPat = "\\s+"

  /** The six commonest entities, decoded in this FIXED order (amp
    * last; a fixed order is what makes both engines identical —
    * "correct" HTML entity semantics is not the contract here). */
  val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }

  /** Per-block struct array for one html column: (txt = stripped,
    * entity-decoded, whitespace-collapsed block text; alen = chars of
    * anchor inner text, inner tags stripped). */
  def blocks(html: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(regexp_replace(html, scriptPat, " "), stylePat, " "),
      commentPat, " ")
    val lines = split(regexp_replace(noScript, blockClosePat, "\n"), "\n")
    transform(lines, l => {
      val txt = trim(regexp_replace(
        decodeEntities(regexp_replace(l, tagPat, " ")), wsPat, " "))
      val alen = aggregate(
        regexp_extract_all(l, lit(anchorPat), lit(1)),
        lit(0), (acc, a) => acc + length(regexp_replace(a, tagPat, "")))
      struct(txt.as("txt"), alen.as("alen"))
    })
  }

  /** Extraction verdict columns appended to `df`: n_blocks (non-empty
    * candidate blocks), n_kept, main_text (kept blocks joined '\n'),
    * main_len. All other input columns pass through. */
  def extract(df: DataFrame, htmlCol: String): DataFrame = {
    val keepRule = (s: Column) =>
      length(s.getField("txt")) >= minBlockChars &&
        s.getField("alen") * linkDenom <= length(s.getField("txt"))
    df.withColumn("__blocks", blocks(col(htmlCol)))
      .withColumn("__kept", filter(col("__blocks"), keepRule))
      .withColumn("n_blocks",
        size(filter(col("__blocks"), s => length(s.getField("txt")) > 0)).cast("long"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("main_text",
        array_join(transform(col("__kept"), s => s.getField("txt")), "\n"))
      .withColumn("main_len", length(col("main_text")).cast("long"))
      .drop("__blocks", "__kept")
  }

  // -- link extraction (the WAT side of a crawl: web-graph + anchors) --

  /** Whole-anchor-tag pattern (group 0 = `<a …>…</a>`). */
  val anchorTagPat = "(?is)<a[^>]*>.*?</a>"

  /** href attribute inside one anchor tag (group 1 = the URL; the
    * double-quoted form only — the fixture and real canonical HTML
    * emit it, and a laxer pattern would diverge across engines on
    * pathological markup). */
  val hrefPat = "(?is)href=\"([^\"]*)\""

  /** Per-anchor struct array for one html column: (href = the raw
    * href attribute, '' when absent; atxt = the anchor's inner text,
    * tags stripped, entities decoded, whitespace collapsed). This is
    * the WAT-extraction primitive (Common Crawl ships exactly these
    * per-page link records): the web graph, anchor-text retrieval
    * signals, and frontier discovery all start here. Pure narrow
    * projection — regex + array ops per row, zero exchanges. */
  def links(html: Column): Column =
    transform(regexp_extract_all(html, lit(anchorTagPat), lit(0)), a => {
      val inner = regexp_extract(a, anchorPat, 1)
      val atxt = trim(regexp_replace(
        decodeEntities(regexp_replace(inner, tagPat, " ")), wsPat, " "))
      struct(regexp_extract(a, hrefPat, 1).as("href"), atxt.as("atxt"))
    })

  /** Resolve an href against its page's host (ADVICE r12 — the
    * operator is a general API, not just the fixture's shape):
    * absolute `http(s)://…` keeps its own (host, path);
    * protocol-relative `//host/path` inherits the page's scheme and
    * keeps its own (host, path); any OTHER scheme (`mailto:`,
    * `javascript:`, `ftp:`, …) is not a web link — it resolves to the
    * `("", "")` sentinel so callers can filter `host <> ''` instead
    * of attributing foreign links to the source host; everything else
    * is host-relative. Returns a (host, path) struct; an empty path
    * on a web link normalizes to "/". A fuller RFC 3986 resolver
    * (dot-segment removal, relative-path merges) drops in behind the
    * same two columns. */
  def resolveHref(srcHost: Column, href: Column): Column = {
    val isHttp = href.rlike("^https?://")
    val isProtoRel = href.startsWith("//")
    // http(s):// matches the generic scheme pattern too — non-web is
    // "has a scheme AND that scheme is not http(s)"
    val isNonWeb = href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:") && !isHttp
    val host = when(isHttp, regexp_extract(href, "^https?://([^/?#]+)", 1))
      .when(isProtoRel, regexp_extract(href, "^//([^/?#]+)", 1))
      .when(isNonWeb, lit(""))
      .otherwise(srcHost)
    val path0 = when(isHttp, regexp_replace(href, "^https?://[^/?#]+", ""))
      .when(isProtoRel, regexp_replace(href, "^//[^/?#]+", ""))
      .otherwise(href)
    // the non-web sentinel bypasses the ''→'/' normalization: ("", "")
    // must stay distinguishable from a root link ("host", "/")
    val path = when(isNonWeb, lit(""))
      .otherwise(when(path0 === "", "/").otherwise(path0))
    struct(host.as("host"), path.as("path"))
  }

  // -- DuckDB twins (same literals, spliced by reference) -------------

  /** SQL expression for the per-block struct list over `htmlExpr` —
    * the [[blocks]] twin. */
  def blocksSql(htmlExpr: String): String = {
    val decoded = entities.foldLeft(
      s"regexp_replace(l, '$tagPat', ' ', 'g')") { case (acc, (e, r)) =>
      val rr = if (r == "'") "chr(39)" else s"'$r'"
      s"replace($acc, '$e', $rr)"
    }
    s"""list_transform(
       |  string_split(regexp_replace(regexp_replace(regexp_replace(regexp_replace($htmlExpr,
       |    '$scriptPat', ' ', 'g'), '$stylePat', ' ', 'g'),
       |    '$commentPat', ' ', 'g'),
       |    '$blockClosePat', chr(10), 'g'), chr(10)),
       |  l -> struct_pack(
       |    txt := trim(regexp_replace($decoded, '$wsPat', ' ', 'g')),
       |    alen := CAST(coalesce(list_sum(list_transform(
       |      regexp_extract_all(l, '$anchorPat', 1),
       |      a -> length(regexp_replace(a, '$tagPat', '', 'g')))), 0) AS BIGINT)))""".stripMargin
  }

  /** SQL expression for the per-anchor struct list over `htmlExpr` —
    * the [[links]] twin (same literals, same decode order). */
  def linksSql(htmlExpr: String): String = {
    val decoded = entities.foldLeft(
      s"regexp_replace(regexp_extract(a, '$anchorPat', 1), '$tagPat', ' ', 'g')") {
      case (acc, (e, r)) =>
        val rr = if (r == "'") "chr(39)" else s"'$r'"
        s"replace($acc, '$e', $rr)"
    }
    s"""list_transform(
       |  regexp_extract_all($htmlExpr, '$anchorTagPat', 0),
       |  a -> struct_pack(
       |    href := regexp_extract(a, '(?is)href="([^"]*)"', 1),
       |    atxt := trim(regexp_replace($decoded, '$wsPat', ' ', 'g'))))""".stripMargin
  }

  /** SQL (host, path) resolution twin of [[resolveHref]] over columns
    * `srcHost` and an href expression `h`. */
  def resolveHrefSql(srcHost: String, h: String): String = {
    // same branch ORDER as [[resolveHref]]: http(s) and // match the
    // other-scheme regex too, so the CASE must test them first
    val path0 =
      s"""CASE WHEN regexp_matches($h, '^https?://')
         |       THEN regexp_replace($h, '^https?://[^/?#]+', '')
         |     WHEN starts_with($h, '//')
         |       THEN regexp_replace($h, '^//[^/?#]+', '')
         |     ELSE $h END""".stripMargin
    s"""struct_pack(
       |  host := CASE WHEN regexp_matches($h, '^https?://')
       |               THEN regexp_extract($h, '^https?://([^/?#]+)', 1)
       |               WHEN starts_with($h, '//')
       |               THEN regexp_extract($h, '^//([^/?#]+)', 1)
       |               WHEN regexp_matches($h, '^[A-Za-z][A-Za-z0-9+.-]*:')
       |               THEN ''
       |               ELSE $srcHost END,
       |  path := CASE WHEN regexp_matches($h, '^[A-Za-z][A-Za-z0-9+.-]*:')
       |                    AND NOT regexp_matches($h, '^https?://')
       |                    AND NOT starts_with($h, '//') THEN ''
       |               WHEN $path0 = '' THEN '/'
       |               ELSE $path0 END)""".stripMargin
  }

  /** SQL keep-rule over a block struct `s` — the [[extract]] twin. */
  def keepRuleSql(s: String): String =
    s"length(struct_extract($s, 'txt')) >= $minBlockChars AND " +
      s"struct_extract($s, 'alen') * $linkDenom <= length(struct_extract($s, 'txt'))"

  // -- deterministic HTML fixture (both engines build the same page) --

  /** Words-per-paragraph in the synthesized page. */
  val paraWords = 12

  /** Synthesize a deterministic HTML page from a doc's normalized word
    * array: title + nav chrome, `paraWords`-word `<p>` paragraphs, a
    * link-wall "read more" block, an entity-bearing tag line, an "Ad"
    * stub, and a link-heavy footer — every boilerplate class the
    * extractor's two rules must reject, planted identically in Spark
    * and the oracle ([[synthHtmlSql]]). */
  def synthHtml(docId: Column, words: Column, lang: Column): Column = {
    val n = size(words)
    val nPara = floor((n + paraWords - 1).cast("double") / paraWords).cast("int")
    val paras = array_join(
      transform(sequence(lit(0), nPara - 1),
        k => concat(lit("<p>"),
          array_join(slice(words, k * paraWords + 1, lit(paraWords)), " "),
          lit("</p>"))), "")
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"), lit("</title>"),
      lit("<style>body { margin: 0; font: 14px serif }</style>"),
      lit("<script>var t = \""), md5(docId.cast("string")), lit("\"; track(t);</script></head>"),
      lit("<body><nav><a href=\"/\">Home</a> | <a href=\"/"), lang,
      lit("/\">"), lang, lit(" edition</a> | <a href=\"/about/\">About us</a></nav>"),
      lit("<div id=\"main\"><!-- rendered v2; cache ttl > 60s -->"), paras,
      lit("<p>Read more: <a href=\"/doc/"), docId.cast("string"),
      lit("/next\">continue reading this article</a></p>"),
      lit("<p>Tags &amp; topics:&nbsp;"), lang,
      lit(" section with &#39;curated&#39; weekly updates</p>"),
      lit("<p>Ad</p></div>"),
      lit("<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a> "),
      lit("<a href=\"/contact\">Contact our editorial team</a> (c) example-"),
      lang, lit(".com</footer></body></html>"))
  }

  /** DuckDB twin of [[synthHtml]] over columns (doc_id, w, lang). */
  def synthHtmlSql: String =
    s"""'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>' ||
       |'<style>body {{ margin: 0; font: 14px serif }}</style>' ||
       |'<script>var t = "' || md5(CAST(doc_id AS VARCHAR)) || '"; track(t);</script></head>' ||
       |'<body><nav><a href="/">Home</a> | <a href="/' || lang || '/">' || lang ||
       |' edition</a> | <a href="/about/">About us</a></nav>' ||
       |'<div id="main"><!-- rendered v2; cache ttl > 60s -->' ||
       |array_to_string(list_transform(range(0, (len(w) + ${paraWords - 1}) // $paraWords),
       |  k -> '<p>' || array_to_string(w[(k * $paraWords + 1):(k * $paraWords + $paraWords)], ' ') || '</p>'), '') ||
       |'<p>Read more: <a href="/doc/' || CAST(doc_id AS VARCHAR) ||
       |'/next">continue reading this article</a></p>' ||
       |'<p>Tags &amp; topics:&nbsp;' || lang ||
       |' section with &#39;curated&#39; weekly updates</p>' ||
       |'<p>Ad</p></div>' ||
       |'<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> ' ||
       |'<a href="/contact">Contact our editorial team</a> (c) example-' ||
       |lang || '.com</footer></body></html>'""".stripMargin
      .replace("{{", "{").replace("}}", "}")
}
