package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract

/** [[graft.operators.HtmlExtract]] — rule-by-rule on planted pages,
  * plus the fixture round-trip the q194 oracle relies on. */
class HtmlExtractSpec extends SparkSuite {
  import spark.implicits._

  private def extractOne(html: String): (Long, Long, String) = {
    val r = HtmlExtract.extract(Seq(html).toDF("html"), "html")
      .select("n_blocks", "n_kept", "main_text").head
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  test("script/style bodies vanish entirely — code never reads as content") {
    val (_, kept, txt) = extractOne(
      "<html><body><script>var this_is_a_long_tracking_payload = 12345;" +
        "</script><style>.very-long-selector-name { color: #333344 }</style>" +
        "<p>an actual paragraph of readable content here</p></body></html>")
    assert(kept === 1L)
    assert(txt === "an actual paragraph of readable content here")
  }

  test("HTML comments vanish even when they contain '>' — no phantom text") {
    val (_, kept, txt) = extractOne(
      "<body><!-- rendered by builder; ttl > 60s; do not edit -->" +
        "<p>the real paragraph content is long enough to survive here</p>" +
        "<p>second block <!-- inline note > marker --> keeps its own words around it</p></body>")
    assert(kept === 2L)
    assert(txt === "the real paragraph content is long enough to survive here\n" +
      "second block keeps its own words around it")
  }

  test("block-closing tags segment; short blocks and link walls drop; " +
      "long low-link-density blocks survive") {
    val (blocks, kept, txt) = extractOne(
      "<body><nav><a href='/'>Home</a> | <a href='/x'>Section</a></nav>" +
        "<p>Ad</p>" + // short -> dropped
        "<p>Read all: <a href='/n'>continue with this full story today</a></p>" + // link wall
        "<p>the payload paragraph with enough characters to clear the floor</p>" +
        "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy and data choices</a></footer></body>")
    assert(blocks === 5L)
    assert(kept === 1L)
    assert(txt === "the payload paragraph with enough characters to clear the floor")
  }

  test("link density counts ANCHOR INNER TEXT (inner tags stripped), not markup") {
    // 39 anchor chars * 3 > 59 text chars -> dropped even though long
    val linky = "<p><a href='/a'><b>thirty-nine characters of anchor text</b></a>" +
      " and twenty more here</p>"
    val (_, kept1, _) = extractOne(linky)
    assert(kept1 === 0L)
    // same sentence unlinked survives
    val (_, kept2, _) = extractOne(
      "<p>thirty-nine characters of anchor text and twenty more here</p>")
    assert(kept2 === 1L)
  }

  test("the six entities decode in the fixed order, amp last") {
    val (_, _, txt) = extractOne(
      "<p>a &lt;b&gt; c &quot;d&quot; e&nbsp;f &#39;g&#39; h &amp; i padded out</p>")
    assert(txt === "a <b> c \"d\" e f 'g' h & i padded out")
  }

  test("whitespace collapses and trims; empty blocks don't count") {
    val (blocks, kept, txt) = extractOne(
      "<div>   </div><p>  spaced   out\t\tcontent   across the   line  </p><div></div>")
    assert(blocks === 1L)
    assert(kept === 1L)
    assert(txt === "spaced out content across the line")
  }

  test("fixture round-trip on real docs: chrome never leaks, paragraphs and " +
      "the entity line are exactly what survives") {
    val d = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.normalizedWords(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
    val out = HtmlExtract.extract(
      d.withColumn("html", HtmlExtract.synthHtml(col("doc_id"), col("w"), col("lang"))),
      "html")
    assert(out.filter(col("main_text").contains("About us") ||
      col("main_text").contains("Read more") ||
      col("main_text").contains("Terms") ||
      col("main_text").contains("track(")).count() === 0L,
      "nav/link-wall/footer/script must never reach main_text")
    assert(out.filter(col("main_text").contains("&amp;")).count() === 0L, "entities decode")
    assert(out.filter(col("n_kept") >= 1).count() === out.count(),
      "every doc keeps at least its tag line")
    // the tag line survives per doc (it is > 25 chars, zero links)
    assert(out.filter(col("main_text").contains("Tags & topics:")).count() === out.count())
  }

  // ---- link extraction (q212's WAT primitive) ------------------------

  private def linksOf(html: String): Seq[(String, String)] =
    Seq(html).toDF("html")
      .select(explode(HtmlExtract.links(col("html"))).as("l"))
      .select(col("l.href"), col("l.atxt"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("links: href + inner text per anchor, inner tags stripped, entities decoded") {
    val got = linksOf(
      "<body><p>See <a href=\"/a/b\">the <b>first</b> page</a> and " +
        "<a class='x' href=\"https://h2.example.com/c\">Q&amp;A  archive</a>; " +
        "also <a name='no-href-anchor'>unlinked text</a>.</p></body>")
    assert(got === Seq(
      ("/a/b", "the first page"),
      ("https://h2.example.com/c", "Q&A archive"),
      ("", "unlinked text")))
  }

  test("links: the synthetic fixture page yields exactly its planted anchors") {
    val d = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.normalizedWords(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
    val n = d.count()
    val anchors = d
      .select(col("lang"), explode(HtmlExtract.links(
        HtmlExtract.synthHtml(col("doc_id"), col("w"), col("lang")))).as("l"))
    // 7 anchors per fixture page: 3 nav + read-more + 3 footer
    assert(anchors.count() === 7L * n)
    assert(anchors.filter(col("l.atxt") === "Home").count() === n)
    assert(anchors.filter(col("l.href") === "/contact").count() === n)
    assert(anchors.filter(col("l.atxt") === concat(col("lang"), lit(" edition")))
      .count() === n)
  }

  test("resolveHref: absolute keeps its host/path, relative inherits, empty -> '/'") {
    val rows = Seq(
      ("h1.example.com", "https://h9.example.com/x/y"),
      ("h1.example.com", "/about/"),
      ("h1.example.com", "https://h9.example.com"))
      .toDF("src", "href")
      .select(HtmlExtract.resolveHref(col("src"), col("href")).as("t"))
      .select(col("t.host"), col("t.path"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(
      ("h9.example.com", "/x/y"),
      ("h1.example.com", "/about/"),
      ("h9.example.com", "/")))
  }

  test("resolveHref: http/protocol-relative keep their host; non-web schemes -> sentinel") {
    val cases = Seq(
      ("h1.example.com", "http://h2.example.com/a"),    // plain http: foreign host kept
      ("h1.example.com", "//h3.example.com/b?q=1"),     // protocol-relative: foreign host kept
      ("h1.example.com", "//h3.example.com"),           // protocol-relative, empty path -> '/'
      ("h1.example.com", "mailto:x@example.com"),       // non-web scheme -> ("", "")
      ("h1.example.com", "javascript:void(0)"),         // non-web scheme -> ("", "")
      ("h1.example.com", "git+ssh://host/repo"),        // exotic scheme -> ("", "")
      ("h1.example.com", "about/relative"))             // no scheme: host-relative
    val rows = cases.toDF("src", "href")
      .select(HtmlExtract.resolveHref(col("src"), col("href")).as("t"))
      .select(col("t.host"), col("t.path"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(
      ("h2.example.com", "/a"),
      ("h3.example.com", "/b?q=1"),
      ("h3.example.com", "/"),
      ("", ""),
      ("", ""),
      ("", ""),
      ("h1.example.com", "about/relative")))
  }
}
