package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Advanced, Extensions, QueryDef, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry pairs a Spark implementation with (where SQL-expressible)
  * a DuckDB oracle over the same parquet tables; names/columns/row order
  * agree on both sides.
  */
object SparkEntry {
  /** Every declared query (SURVEY.md §2.3 + extensions). */
  def registry: Seq[QueryDef] = Relational.all ++ Extensions.all ++ Advanced.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
