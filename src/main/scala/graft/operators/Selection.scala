package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort — value-
  * domain HISTOGRAM REFINEMENT (the "median of a billion numbers"
  * pattern, radix-accelerated): each pass buckets the surviving value
  * range into B=4096 equal-width bins with ONE small aggregation
  * (≤B rows cross the wire), the driver walks the cumulative counts to
  * find the bin holding rank k, and the range shrinks 4096× per scan.
  * The exact k-th smallest of a full 64-bit domain therefore costs at
  * most ⌈64/12⌉ = 6 counting scans over a pinned narrow column — vs
  * ~64 for plain bisection (one count per halving) — zero total-order
  * exchanges, no single-partition funnel, and driver state of two longs
  * plus one ≤4096-row histogram. The approximate complement is the GK
  * sketch (q77: one pass, ε-rank guarantee); this is the spelling for
  * when the answer must be EXACT (billing thresholds, SLA cut-offs)
  * and a handful of scans is acceptable.
  *
  * Contract: `valueCol` must be integral (cast to LONG — callers scale
  * decimals to cents/micros first, the repo's exactness idiom). The
  * result is the true k-th smallest element (1-based, duplicates
  * counted), exactly the `ORDER BY v LIMIT 1 OFFSET k-1` row.
  */
object Selection {

  private val B = 4096L

  /** The k-th smallest value (1-based) of the pinned long column. */
  def kthSmallest(vals: DataFrame, k: Long): Long = {
    val bounds = vals.agg(min("v"), max("v"), count(lit(1))).head
    kthSmallestIn(vals, k, bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
  }

  /** Same, with the (min, max, count) scan already paid by the caller
    * — lets [[orderStats]] amortize one bounds pass across ranks. */
  private def kthSmallestIn(
      vals: DataFrame, k: Long, vmin: Long, vmax: Long, n: Long): Long = {
    require(k >= 1, s"need k >= 1, got $k")
    require(k <= n, s"k=$k exceeds row count $n")
    var lo = vmin
    var hi = vmax
    var below = 0L // exact count of values strictly below lo
    while (lo < hi) {
      val range = BigInt(hi) - BigInt(lo) + 1 // Long would overflow on mixed-sign extremes
      if (range > Long.MaxValue / 2) {
        // astronomically wide range (> 2^62): v - lo itself can overflow
        // Long, so pay one plain midpoint split before bucketing
        val mid = ((BigInt(lo) + BigInt(hi)) >> 1).toLong
        val c = below + vals.filter(col("v") >= lo && col("v") <= mid).count()
        if (c >= k) hi = mid else { below = c; lo = mid + 1 }
      } else {
        val w = ((range + B - 1) / B).toLong max 1L
        // one ≤B-row aggregation; v - lo is in [0, range) so the Long
        // subtraction and truncating `div` (== floor on non-negatives)
        // are exact
        val hist = vals
          .filter(col("v") >= lo && col("v") <= hi)
          .groupBy(expr(s"(v - ${lo}L) div ${w}L").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1)
        var cum = below
        var bkt = -1L
        val it = hist.iterator
        while (bkt < 0 && it.hasNext) {
          val (b, c) = it.next()
          if (cum + c >= k) bkt = b else cum += c
        }
        require(bkt >= 0, s"rank $k not found in [$lo,$hi] (cum=$cum)") // unreachable
        below = cum
        lo = lo + bkt * w
        hi = math.min(hi, lo + (w - 1))
      }
    }
    lo
  }

  /** Pin a narrow long projection once for repeated counting scans. */
  def pin(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("v")).localCheckpoint()

  /** One-row frame of exact order statistics at the given 1-based
    * ranks: (n, then rank_i / value_i pairs named by `names`). The
    * (min, max, n) bounds scan is paid once for all ranks. */
  def orderStats(spark: SparkSession, vals: DataFrame,
      ranks: Seq[(String, Long => Long)]): DataFrame = {
    val bounds = vals.agg(min("v"), max("v"), count(lit(1))).head
    val (vmin, vmax, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    val cols = ranks.flatMap { case (name, rankOf) =>
      val k = rankOf(n)
      Seq(lit(k).as(s"k_$name"),
        lit(kthSmallestIn(vals, k, vmin, vmax, n)).as(name))
    }
    spark.range(1).select((lit(n).as("n") +: cols): _*)
  }
}
