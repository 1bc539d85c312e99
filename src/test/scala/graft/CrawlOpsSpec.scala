package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis, UrlCanon}

/** Crawl-side operators: URL canonicalization rules, Luhn screening on
  * known vectors, within-doc line dedup order preservation, code
  * detection signals. */
class CrawlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlCanon.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("url canonicalization: case, default ports, fragments, trackers, trailing slash") {
    assert(canon(
      "https://Shop.Example.COM:443/products/7/?utm_source=feed&fbclid=ab12",
      "https://shop.example.com/products/7/",
      "https://SHOP.example.com/products/7?gclid=z#frag")
      .toSet === Set("https://shop.example.com/products/7"))
    // real params survive in order; tracking params vanish from the middle
    assert(canon("https://x.com/a?utm_source=s&page=2&ref=r&sort=asc")
      === Seq("https://x.com/a?page=2&sort=asc"))
    // http :80 strips; https :8443 (non-default) does NOT
    assert(canon("http://Host.example.com:80/a#x") === Seq("http://host.example.com/a"))
    assert(canon("https://host.example.com:8443/a") === Seq("https://host.example.com:8443/a"))
    // bare host with trailing slash
    assert(canon("https://x.com/") === Seq("https://x.com"))
    // UPPERCASE scheme still lowercases and strips the default port
    assert(canon("HTTPS://Host.Example.com:443/a", "Https://X.COM/b#f")
      === Seq("https://host.example.com/a", "https://x.com/b"))
    // a second '?' is query CONTENT (RFC 3986), never a split point
    assert(canon("https://x.com/r?target=https://y.com/p?a=1&utm_source=s&b=2")
      === Seq("https://x.com/r?target=https://y.com/p?a=1&b=2"))
    // whitespace pollution (trailing newline / embedded tab / leading
    // space) is pre-stripped BEFORE the $-anchored rules — without the
    // pre-strip, Java '$' matches before a final newline while RE2
    // (the DuckDB twin) matches only end-of-text, splitting the engines
    assert(canon("https://x.com/a/\n", " https://x.com/a#f\n", "https://x.com/\ta")
      === Seq("https://x.com/a", "https://x.com/a", "https://x.com/a"))
  }

  test("luhn: known-valid test PANs pass, off-by-one twins fail") {
    val rows = Seq(
      "4111111111111111", // classic Visa test number: valid
      "4111111111111112", // last digit bumped: invalid
      "5500005555555559", // valid MC test number
      "5500005555555550").toDF("c")
      .select(col("c"), TextAnalysis.luhnValid16(col("c")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows("4111111111111111") && rows("5500005555555559"))
    assert(!rows("4111111111111112") && !rows("5500005555555550"))
  }

  test("luhnScreen: counts candidates, validates only real checksums") {
    val df = Seq((1L, "order 1234567890123456 card 4111111111111111 ok"))
      .toDF("id", "text")
    val r = TextAnalysis.luhnScreen(df, "id", "text").head
    assert(r.getAs[Long]("n_candidates") === 2L)
    assert(r.getAs[Long]("n_valid") === 1L)
    assert(r.getAs[String]("valid_pans") === "4111111111111111")
  }

  test("dedupLinesKeepFirst: keeps FIRST occurrence, preserves order") {
    val df = Seq((1L, Seq("b line", "a line", "b line", "c line", "a line")))
      .toDF("id", "lines")
    val r = Dedup.dedupLinesKeepFirst(df, "lines").head
    assert(r.getAs[Long]("n_lines") === 5L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[String]("dedup_text") === "b line\na line\nc line",
      "order must be first-occurrence order, not sorted")
  }

  test("keep-first native kernel == composed position-filter on random arrays " +
      "(incl. empty, all-dup, all-distinct)") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[Seq[String]] = Seq(
      Seq.empty[String], Seq("x"), Seq.fill(50)("same"),
      (1 to 60).map(_.toString)) ++
      (1 to 30).map(_ => Seq.fill(rnd.nextInt(40))(s"w${rnd.nextInt(8)}"))
    val df = cases.zipWithIndex.map { case (ls, i) => (i.toLong, ls) }.toDF("id", "lines")
    val native = Dedup.dedupLinesKeepFirst(df, "lines")
      .select("id", "n_lines", "n_kept", "dedup_text").collect().map(_.toSeq).toSet
    val composed = Dedup.dedupLinesKeepFirstComposed(df, "lines")
      .select("id", "n_lines", "n_kept", "dedup_text").collect().map(_.toSeq).toSet
    assert(native === composed)
  }

  test("robots gate: longest prefix wins, allow beats deny on ties, " +
      "default-allow without a match") {
    import graft.operators.Robots
    val urls = Seq(
      (1L, "a.com", "/private/reports/r1"), // allow overrides /private/ by length
      (2L, "a.com", "/private/other"),      // deny
      (3L, "a.com", "/public/x"),           // no rule -> allow
      (4L, "b.com", "/private/reports/r2"), // b.com has no allow rule -> deny
      (5L, "a.com", "/dup/tie")             // equal-length allow+deny -> allow wins
    ).toDF("id", "host", "path")
    val rules = Seq(
      ("a.com", "/private/", false), ("a.com", "/private/reports/", true),
      ("a.com", "/dup/", false), ("a.com", "/dup/", true),
      ("b.com", "/private/", false)).toDF("host", "prefix", "allow")
    val got = Robots.gate(urls, rules, "id", "host", "path")
      .select("id", "allowed", "matched").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got(1L) === ((true, Some("/private/reports/"))))
    assert(got(2L) === ((false, Some("/private/"))))
    assert(got(3L) === ((true, None)))
    assert(got(4L) === ((false, Some("/private/"))))
    assert(got(5L) === ((true, Some("/dup/"))))
  }

  test("magic sniff: real signatures classify, unknown falls through, null stays null") {
    import graft.operators.Multimodal
    val df = Seq(
      ("89504E470D0A1A0A" + "00" * 8, "image/png"),
      ("FFD8FFE1002845786966", "image/jpeg"),
      ("255044462D312E37", "application/pdf"),
      ("504B030414000000", "application/zip"),
      ("474946383961AABB", "image/gif"),
      ("CAFEBABE00000000", "application/octet-stream"))
      .toDF("hex", "expected")
      .select(unhex(col("hex")).as("payload"), col("expected"))
    val got = Multimodal.sniffType(df, "payload").collect()
    got.foreach(r => assert(r.getAs[String]("sniffed_type") === r.getAs[String]("expected")))
    val nul = Multimodal.sniffType(
      Seq(Tuple1(null: Array[Byte])).toDF("payload"), "payload").head
    assert(nul.isNullAt(nul.fieldIndex("sniffed_type")))
  }

  test("codeSignals: snippet flags, prose doesn't") {
    val df = Seq(
      (1L, "def load(x): return x*2; import os; {key: val} => arr[i] == 0"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    val m = TextAnalysis.codeSignals(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_code")).toMap
    assert(m(1L) && !m(2L))
  }
}
