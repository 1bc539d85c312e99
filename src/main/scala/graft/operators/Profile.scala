package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column (rows, nulls, exact NDV, min, max) in
  * ONE aggregation pass — the publish-gate summary every curated
  * snapshot ships with (and the statistics a cost-based optimizer
  * would ingest).
  *
  * Scale shape: a single global aggregate over the table; everything
  * except the exact NDVs reduces map-side to one scalar row. Exact
  * multi-column count-distinct is the one genuinely expensive piece
  * (Catalyst plans it as an Expand — one shuffled pass per distinct
  * column set); it is kept exact here because the oracle demands
  * bit-equality, and the 100 TB swap is one word:
  * `approx_count_distinct` (the mergeable HLL the q04b entry already
  * gates), which collapses the whole profile to a single scalar-row
  * aggregate. min/max are taken in the column's NATIVE type and cast
  * to string only for display (string-min of numbers would order
  * "10" < "9").
  */
object Profile {

  /** One row per profiled column: (col_name, n_rows, n_null, ndv,
    * min_s, max_s) — min/max rendered as strings truncated to
    * `maxLen`. */
  def table(df: DataFrame, cols: Seq[String], maxLen: Int = 40): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nnull_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        substring(min(col(c)).cast("string"), 1, maxLen).as(s"__min_$c"),
        substring(max(col(c)).cast("string"), 1, maxLen).as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nnull_$c").as("n_null"),
        col(s"__ndv_$c").as("ndv"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
