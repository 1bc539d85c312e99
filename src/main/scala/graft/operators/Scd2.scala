package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: turn an attribute CHANGELOG
  * (key, change_ts, attrs…) into versioned interval rows
  * `[valid_from, valid_to)` — the standard warehouse shape for
  * "what did this dimension row look like when the fact happened" —
  * plus the point-in-time (PIT) join that consumes it.
  *
  * Scale shape: the version build shuffles the CHANGELOG once by key
  * for the lead() window — the changelog is dimension-sized (users,
  * products), orders of magnitude below the fact stream, so this is
  * the cheap side. The PIT join is a plain hash equi-join on the key
  * with the interval predicate applied post-match: per fact row the
  * candidate multiplicity is that key's version count (bounded, small
  * for real dimensions), and exactly one version survives the filter.
  * Nothing here is a range/theta join, so the plan stays
  * hash-partitionable at 100 TB of facts.
  *
  * Determinism: versions are ordered by (ts, tiebreak); two changes at
  * the same instant produce a zero-width interval `[t, t)` for the
  * earlier tiebreak, which matches no fact — both engines agree on
  * which change "wins" without any engine-specific row order.
  */
object Scd2 {

  /** Changelog → SCD-2 version rows: every input column is kept and
    * `valid_from` / `valid_to` are added; `valid_to` is NULL for each
    * key's open (current) version. */
  def build(changelog: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    changelog
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** Point-in-time join: each fact row picks up the dimension version
    * valid at `factTs` (left join — facts before the key's first
    * version survive with NULL attributes). `dim` must be the output
    * of [[build]]. */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTs: Column): DataFrame = {
    val d = dim.withColumnRenamed(keyCol, "__dim_key")
    facts.join(d,
      facts(keyCol) === d("__dim_key") &&
        factTs >= d("valid_from") &&
        (d("valid_to").isNull || factTs < d("valid_to")),
      "left")
      .drop("__dim_key")
  }
}
