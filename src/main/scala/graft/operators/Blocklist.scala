package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AhoCorasickExpr

/** Blocklist screening — the "contains any of these N terms?" gate of
  * a curation pipeline (toxic-term lists, license markers, spam
  * templates, benchmark canaries), built on the single-pass
  * [[graft.plans.AhoCorasick]] DFA expression.
  *
  * Why not N `contains` columns: the composed form scans each document
  * once per pattern (O(N·len) plus a plan column per term — at a
  * 10k-term blocklist the projection itself stops fitting). The DFA
  * screen is ONE narrow per-row map with O(len + matches) work
  * regardless of pattern count; nothing shuffles until the caller
  * aggregates. That is the shape that survives a 100 TB corpus × a
  * production blocklist.
  */
object Blocklist {

  /** Per-document screen: occurrence counts per pattern (overlapping,
    * byte-exact — see [[graft.plans.AhoCorasick]]), total hits, number
    * of distinct patterns hit, and the keep/flag verdict. NULL text
    * yields NULL counts and `flagged = false` (screens don't reject
    * what they can't read; the null-text rows are the profiler's
    * problem). Narrow per-row map — zero exchanges. */
  def screen(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    docs
      .select(col(idCol),
        AhoCorasickExpr.multiPatternCounts(col(textCol), patterns).as("hits"))
      .withColumn("total_hits",
        aggregate(col("hits"), lit(0L), (acc, x) => acc + x))
      .withColumn("n_patterns_hit",
        size(filter(col("hits"), _ > lit(0L))).cast("int"))
      .withColumn("flagged", coalesce(col("total_hits") > 0L, lit(false)))

  /** Per-pattern audit: how many documents each blocklist term hits
    * and how often — the list-curation feedback loop (dead terms get
    * retired, hot terms get reviewed). One narrow screen + posexplode
    * (patterns-sized fanout per row) into ONE map-side-combinable
    * aggregation; every pattern appears in the output even at zero
    * hits. */
  def summary(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pat = array(patterns.map(lit): _*)
    screen(docs, idCol, textCol, patterns)
      .select(posexplode(col("hits")).as(Seq("pos", "cnt")))
      .select(element_at(pat, col("pos") + 1).as("pattern"), col("cnt"))
      .groupBy("pattern")
      .agg(sum(when(col("cnt") > 0L, 1L).otherwise(0L)).as("n_docs"),
        sum(col("cnt")).as("n_hits"))
  }
}
