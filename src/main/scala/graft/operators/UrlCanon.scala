package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL CANONICALIZATION — the crawl-frontier companion of
  * [[HtmlExtract]]: a crawler sees the same resource under
  * mixed-case hosts, explicit default ports, tracking parameters and
  * fragments; URL-level dedup (and polite refetch scheduling, and
  * host-level aggregation) all need ONE canonical spelling first.
  * Rules (the conservative, semantics-preserving subset of RFC 3986
  * normalization + the universal tracking-param strip):
  *   1. drop the fragment (`#…` — never sent to the server)
  *   2. lowercase scheme and host (case-insensitive by spec —
  *      including an UPPERCASE scheme, matched with (?i))
  *   3. strip explicit default ports (`:443` on https, `:80` on http)
  *   4. drop tracking query params (`utm_*`, `gclid`, `fbclid`,
  *      `ref`), preserving the relative order of the survivors; a
  *      query left empty loses its `?`
  *   5. strip one trailing `/`
  *
  * Deterministic string mechanics only — regex literals kept to the
  * RE2 ∩ Java dialect and shared with the SQL twin, so the DuckDB
  * oracle replays every rule byte-for-byte. Scale shape: pure narrow
  * per-row expressions; canonical-group dedup downstream is the only
  * exchange, keyed on the (much smaller) canonical string.
  */
object UrlCanon {

  /** Pre-strip: raw control chars / space / DEL are illegal in a URL
    * (RFC 3986 requires percent-encoding), and a trailing `\n` would
    * otherwise split the dialects on every `$`-anchored rule below —
    * Java `$` matches before a final line terminator, RE2 (DuckDB)
    * only at end-of-text. Removing them FIRST (plain char class, no
    * anchors — identical semantics in both engines) makes the
    * byte-for-byte parity claim hold for whitespace-polluted input. */
  val wsCtlPat = "[\\x00-\\x20\\x7f]"
  val fragPat = "#.*$"
  val schemeHostPat = "(?i)^(https?://[^/?#]*)"
  val port443Pat = "^(https://[^/?#:]*):443([/?#].*)?$"
  val port80Pat = "^(http://[^/?#:]*):80([/?#].*)?$"
  val trackerPat = "^(utm_[a-zA-Z0-9_]*|gclid|fbclid|ref)="
  val trailingSlashPat = "/$"

  /** Canonical form of one URL column (Spark spelling). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(regexp_replace(u, wsCtlPat, ""), fragPat, "")
    // lowercase scheme+host, keep the rest byte-identical ($ vs \
    // replacement syntax is the ONLY engine difference — patterns are
    // the shared constants above)
    val lowered = concat(
      lower(regexp_extract(noFrag, schemeHostPat, 1)),
      regexp_replace(noFrag, schemeHostPat, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, port443Pat, "$1$2"), port80Pat, "$1$2")
    // split at the FIRST '?' only: '?' is legal inside a query
    // (RFC 3986), so a plain split would silently truncate everything
    // after a second one
    val parts = split(noPort, "\\?", 2)
    val path = regexp_replace(element_at(parts, 1), trailingSlashPat, "")
    val kept = when(size(parts) >= 2,
      filter(split(element_at(parts, 2), "&"), p => !p.rlike(trackerPat)))
      .otherwise(array().cast("array<string>"))
    concat(path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** DuckDB twin, step 1 (fragment → lowercase scheme+host → default
    * ports), over a VARCHAR expression — same pattern literals, `\1\2`
    * instead of `$1$2` in replacements (dialect, not rule). Meant for
    * a CTE column; [[canonFromNoPortSql]] finishes from that column. */
  def noPortSql(expr: String): String = {
    val noFrag = s"regexp_replace(regexp_replace($expr, '$wsCtlPat', '', 'g'), '$fragPat', '', 'g')"
    val lowered = s"lower(regexp_extract($noFrag, '$schemeHostPat', 1)) || " +
      s"regexp_replace($noFrag, '$schemeHostPat', '', 'g')"
    s"regexp_replace(regexp_replace($lowered, '$port443Pat', '\\1\\2', 'g'), " +
      s"'$port80Pat', '\\1\\2', 'g')"
  }

  /** DuckDB twin, step 2 (tracker strip + trailing slash) over the
    * [[noPortSql]] CTE column. Splits at the FIRST '?' only (strpos),
    * matching the Spark side's limit-2 split — '?' is legal inside a
    * query string. */
  def canonFromNoPortSql(expr: String): String =
    s"""regexp_replace(CASE WHEN strpos($expr, '?') > 0
       |    THEN substr($expr, 1, strpos($expr, '?') - 1) ELSE $expr END,
       |    '$trailingSlashPat', '', 'g') ||
       |  CASE WHEN strpos($expr, '?') > 0
       |       AND len(list_filter(string_split(substr($expr, strpos($expr, '?') + 1), '&'),
       |             p -> NOT regexp_matches(p, '$trackerPat'))) > 0
       |  THEN '?' || array_to_string(list_filter(string_split(substr($expr, strpos($expr, '?') + 1), '&'),
       |             p -> NOT regexp_matches(p, '$trackerPat')), '&')
       |  ELSE '' END""".stripMargin

  /** Per-canonical-URL rollup of a (id, url) relation: how many raw
    * spellings collapsed, over how many distinct raws/ids. */
  def canonicalGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), col(urlCol).as("raw"),
        canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("raw")).as("n_raw_variants"),
        countDistinct(col(idCol)).as("n_ids"))
}
