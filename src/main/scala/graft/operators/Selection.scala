package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort — the
  * classic value-domain binary search ("median of a billion numbers"):
  * each round asks one filtered COUNT (a scalar), halving the value
  * range, so the exact k-th smallest of 100 TB costs O(log range)
  * counting scans over a pinned narrow column and ZERO shuffles — no
  * total-order exchange, no single-partition funnel, state on the
  * driver is two longs. The approximate complement is the GK sketch
  * (q77: one pass, ε-rank guarantee); this is the spelling for when
  * the answer must be EXACT (billing thresholds, SLA cut-offs) and a
  * few more scans are acceptable.
  *
  * Contract: `valueCol` must be integral (cast to LONG — callers scale
  * decimals to cents/micros first, the repo's exactness idiom). The
  * result is the true k-th smallest element (1-based, duplicates
  * counted), exactly the `ORDER BY v LIMIT 1 OFFSET k-1` row.
  */
object Selection {

  /** The k-th smallest value (1-based) of the pinned long column. */
  def kthSmallest(vals: DataFrame, k: Long): Long = {
    require(k >= 1, s"need k >= 1, got $k")
    val bounds = vals.agg(min("v"), max("v"), count(lit(1))).head
    require(k <= bounds.getLong(2), s"k=$k exceeds row count ${bounds.getLong(2)}")
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    while (lo < hi) {
      // avoid overflow on mixed-sign ranges
      val mid = lo + (hi - lo) / 2
      val c = vals.filter(col("v") <= mid).count()
      if (c >= k) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Pin a narrow long projection once for repeated counting scans. */
  def pin(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("v")).localCheckpoint()

  /** One-row frame of exact order statistics at the given 1-based
    * ranks: (n, then rank_i / value_i pairs named by `names`). */
  def orderStats(spark: SparkSession, vals: DataFrame,
      ranks: Seq[(String, Long => Long)]): DataFrame = {
    val n = vals.count()
    val cols = ranks.flatMap { case (name, rankOf) =>
      val k = rankOf(n)
      Seq(lit(k).as(s"k_$name"), lit(kthSmallest(vals, k)).as(name))
    }
    spark.range(1).select((lit(n).as("n") +: cols): _*)
  }
}
