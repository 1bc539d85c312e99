package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * shape): a publish gate evaluates a rule set against a snapshot and
  * blocks the release on violations — the CHECK layer that sits next
  * to [[Profile]]'s statistics and the q107 referential-integrity
  * audit.
  *
  * Scale shape: every row-level rule is a violation-indicator sum, so
  * the whole rule set evaluates in ONE map-side-combinable aggregate
  * pass over the table — adding a rule adds a column, not a job.
  * Uniqueness rules need a distinct count and are declared separately
  * ([[unique]]); they share the same single aggregate (Catalyst plans
  * the distinct via Expand in the same pass, the q119 trade-off, with
  * approx_count_distinct as the at-scale swap).
  */
object Expectations {

  /** A row-level rule: rows where `holds` is false (or null) violate. */
  final case class Rule(name: String, holds: Column)

  /** Evaluate row-level rules plus optional uniqueness rules in one
    * aggregate pass. Returns (rule, n_rows, n_violations, pass) per
    * rule, ordered by rule name. */
  def check(df: DataFrame, rules: Seq[Rule], unique: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty || unique.nonEmpty, "need at least one expectation")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        (rules.map(r =>
          sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)).as(s"__v_${r.name}")) ++
          unique.map(c => countDistinct(col(c)).as(s"__d_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      rules.map(r => struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_${r.name}").as("n_violations"))) ++
        unique.map(c => struct(lit(s"unique($c)").as("rule"), col("__n").as("n_rows"),
          (col("__n") - col(s"__d_$c")).as("n_violations")))
    one.select(explode(array(rows: _*)).as("e")).select("e.*")
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }
}
