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

  /** Per-key EWMA anomaly detection: an exponentially-weighted moving
    * average over each key's ordered event values, flagging events
    * whose value jumps past 1.5× the running average BEFORE the event
    * (2·x > 3·ewma_prev) — the standard cheap drift/spike monitor a
    * metrics pipeline runs per entity.
    *
    * Exactness: the recurrence is integer fixed-point —
    * `ew' = ⌊(x + 7·ew) / 8⌋` over 1e-6-scaled units (α = 1/8) — so
    * both engines replay it bit-for-bit (the oracle steps the same
    * recurrence with a recursive CTE). The first event seeds the
    * average and is never flagged (no state yet — the [[gapFillLocf]]
    * convention).
    *
    * Scale shape: an EWMA is inherently a SEQUENTIAL scan per key — no
    * window/aggregate expresses a linear recurrence — so this is the
    * textbook per-key imperative carve-out: `groupByKey(key)` +
    * `flatMapGroups`, one shuffle by the HIGH-cardinality key, each
    * group sorted and scanned in memory (bounded: one entity's
    * events). The same recurrence drops into
    * `mapGroupsWithState` for the streaming twin — the state is the
    * single (ew) long per key. */
  def ewmaAnomalies(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, valueUnits: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.select(col(keyCol).cast("long").as("k"),
        col(tiebreakCol).cast("long").as("eid"),
        col(tsCol).as("ts"), valueUnits.cast("long").as("x"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
    ds.groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray
        java.util.Arrays.sort(rows, { (a: (Long, Long, java.sql.Timestamp, Long),
            b: (Long, Long, java.sql.Timestamp, Long)) =>
          val c = a._3.compareTo(b._3)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        })
        var prev = 0L
        var first = true
        rows.iterator.map { case (_, eid, _, x) =>
          val p: Option[Long] = if (first) None else Some(prev)
          val anomaly = p.exists(pv => 2L * x > 3L * pv)
          prev = if (first) x else (x + 7L * prev) / 8L
          first = false
          (k, eid, x, p, anomaly)
        }
      }
      .toDF(keyCol, tiebreakCol, "x", "ewma_prev", "anomaly")
  }

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
