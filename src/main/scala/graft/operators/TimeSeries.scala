package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completion for per-key daily metrics: the
  * gap-fill + last-observation-carried-forward (LOCF) pass every
  * metrics/feature pipeline runs before training on activity data —
  * a day with no events must exist as a row (count 0), and stateful
  * values carry forward until the next observation.
  *
  * Scale shape: the grid explode is a narrow map over the KEY-sized
  * span table (one row per key, exploding to span-days rows — never
  * touching the event log); the fill join is hash-equi on (key, day);
  * LOCF is one window partitioned by the HIGH-CARDINALITY key (users,
  * devices), so partitions are small and numerous — the opposite
  * regime from the few-groups funnel [[Sampling.epochMix]] avoids.
  */
object TimeSeries {

  /** Per-key daily span (first..last observed day) from an event log —
    * the grid driver for [[gapFillLocf]]. */
  def dailySpan(events: DataFrame, keyCol: String, tsCol: String): DataFrame =
    events.groupBy(keyCol)
      .agg(to_date(min(col(tsCol))).as("d0"), to_date(max(col(tsCol))).as("d1"))

  /** Complete each key's daily grid and fill: `countCol` gaps become 0,
    * `valueCol` carries the last non-null observation forward (NULL
    * before a key's first observation — the honest "no state yet",
    * not a fabricated zero). Adds `is_gap`. */
  def gapFillLocf(daily: DataFrame, span: DataFrame, keyCol: String,
      dayCol: String, countCol: String, valueCol: String): DataFrame = {
    val grid = span.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"))).as(dayCol))
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        coalesce(col(countCol), lit(0L)).as(countCol),
        col(valueCol))
      .withColumn(s"${valueCol}_locf",
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(countCol) === 0)
      .drop(valueCol)
  }
}
