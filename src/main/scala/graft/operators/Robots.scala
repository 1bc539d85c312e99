package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** ROBOTS EXCLUSION GATE — the crawl-frontier policy step between
  * [[UrlCanon]] (one canonical spelling per URL) and the fetcher: per
  * host, a rule set of (path prefix, allow/deny); a URL's verdict is
  * decided by the MOST SPECIFIC (longest) matching prefix, allow
  * winning length ties — the REP rule-precedence of RFC 9309 §2.2.2
  * (the "Google rule"), restricted to the prefix subset (no `*`/`$`
  * wildcards — stated, and the dominant case in real robots files).
  * No matching rule → allowed (RFC 9309 default-allow).
  *
  * Scale shape: rules are a per-host relation orders of magnitude
  * smaller than the frontier — broadcast; the prefix match is a
  * broadcast equi-join on host with `startswith` as the join-level
  * post-filter; the winner is a struct-MAX AGGREGATE per URL
  * (max(struct(prefix_len, allow, prefix))) — map-side combinable,
  * never a window over the frontier. Unmatched URLs ride a left join.
  */
object Robots {

  /** Gate a (idCol, hostCol, pathCol) frontier against a
    * (hostCol, "prefix", "allow") rule relation. Output: input columns
    * + matched ("prefix" or null), allowed (boolean). */
  def gate(urls: DataFrame, rules: DataFrame, idCol: String,
      hostCol: String, pathCol: String): DataFrame = {
    val r = rules.select(col(hostCol), col("prefix"),
      col("allow").cast("boolean").as("allow"))
    val matched = urls
      .join(F.broadcast(r), Seq(hostCol))
      .filter(col(pathCol).startsWith(col("prefix")))
      // most-specific wins; allow beats deny on equal length; prefix
      // string last for a total deterministic order
      .groupBy(col(idCol).as("__id"))
      .agg(max(struct(length(col("prefix")).as("len"),
        col("allow").as("allow"), col("prefix").as("prefix"))).as("__w"))
      .select(col("__id"),
        col("__w").getField("prefix").as("matched"),
        col("__w").getField("allow").as("__allow"))
    urls.join(matched, urls(idCol) === matched("__id"), "left")
      .drop("__id")
      .withColumn("allowed", coalesce(col("__allow"), lit(true)))
      .drop("__allow")
  }
}
