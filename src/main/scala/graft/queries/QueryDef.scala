package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (where SQL-expressible)
  * an ANSI/DuckDB oracle over the same parquet tables. Column names and
  * row order must agree between the two — every query ends in a total
  * ORDER BY and aliases each computed column identically on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle.stripMargin.trim))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
