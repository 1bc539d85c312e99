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
    val n = bounds.getLong(2)
    // guard BEFORE unboxing min/max: on an empty relation they are
    // NULL and getLong would NPE ahead of the k<=n contract check
    require(n > 0, "kthSmallest needs a non-empty relation")
    kthSmallestIn(vals, k, bounds.getLong(0), bounds.getLong(1), n)
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

  /** ALL requested ranks in ONE shared histogram descent: each pass
    * runs a single aggregation whose bucket key is (range-id, bin) over
    * the union of the still-unfinished ranks' intervals — intervals
    * are sub-buckets of a common partition, so they are pairwise
    * disjoint-or-equal and a CASE chain routes each row to at most one.
    * B equi-depth boundaries of a 64-bit column therefore cost the
    * SAME ≤6 scans as one rank, not 6·B (ranks sharing a bin share the
    * descent for free). Falls back to per-rank [[kthSmallest]] when
    * the initial range exceeds 2^62 (the v−lo overflow guard). */
  def kthSmallestMulti(vals: DataFrame, ks: Seq[Long]): Map[Long, Long] = {
    val bounds = vals.agg(min("v"), max("v"), count(lit(1))).head
    require(bounds.getLong(2) > 0, "kthSmallestMulti needs a non-empty relation")
    val (vmin, vmax, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    val distinctKs = ks.distinct
    distinctKs.foreach { k =>
      require(k >= 1 && k <= n, s"rank $k outside [1, $n]")
    }
    if (BigInt(vmax) - BigInt(vmin) + 1 > Long.MaxValue / 2)
      return distinctKs.map(k => k -> kthSmallestIn(vals, k, vmin, vmax, n)).toMap
    // (k, lo, hi, below); resolved when lo == hi
    var active = distinctKs.map(k => (k, vmin, vmax, 0L))
    val done = Map.newBuilder[Long, Long]
    while (active.nonEmpty) {
      val ranges = active.map(iv => (iv._2, iv._3)).distinct.zipWithIndex
      val widths = ranges.map { case ((lo, hi), _) =>
        (((BigInt(hi) - BigInt(lo) + B) / B).toLong) max 1L
      }
      val bucket = ranges.zip(widths).foldLeft(lit(null).cast("struct<r:int,b:bigint>")) {
        case (acc, (((lo, hi), rid), w)) =>
          when(col("v") >= lo && col("v") <= hi,
            struct(lit(rid).as("r"), expr(s"(v - ${lo}L) div ${w}L").as("b")))
            .otherwise(acc)
      }
      val hist = vals
        .select(bucket.as("rb"))
        .filter(col("rb").isNotNull)
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
        .toMap
      val byRid = ranges.map { case (lohi, rid) => (lohi, rid) }.toMap
      active = active.flatMap { case (k, lo, hi, below) =>
        val rid = byRid((lo, hi))
        val w = widths(rid)
        val nb = ((BigInt(hi) - BigInt(lo) + w) / w).toLong // bins in this range
        var cum = below
        var bkt = -1L
        var b = 0L
        while (bkt < 0 && b < nb) {
          val c = hist.getOrElse((rid, b), 0L)
          if (cum + c >= k) bkt = b else { cum += c; b += 1 }
        }
        require(bkt >= 0, s"rank $k not found in [$lo,$hi] (cum=$cum)") // unreachable
        val nlo = lo + bkt * w
        val nhi = math.min(hi, nlo + (w - 1))
        if (nlo == nhi) { done += k -> nlo; None }
        else Some((k, nlo, nhi, cum))
      }
    }
    done.result()
  }

  /** One-row frame of exact order statistics at the given 1-based
    * ranks: (n, then rank_i / value_i pairs named by `names`). All
    * ranks share one bounds scan and ONE histogram descent. */
  def orderStats(spark: SparkSession, vals: DataFrame,
      ranks: Seq[(String, Long => Long)]): DataFrame = {
    val n = vals.count()
    val ks = ranks.map { case (_, rankOf) => rankOf(n) }
    val got = kthSmallestMulti(vals, ks)
    val cols = ranks.zip(ks).flatMap { case ((name, _), k) =>
      Seq(lit(k).as(s"k_$name"), lit(got(k)).as(name))
    }
    spark.range(1).select((lit(n).as("n") +: cols): _*)
  }

  /** EQUI-DEPTH HISTOGRAM (the ANALYZE/CBO statistic): the exact
    * values at ranks ⌈i·n/buckets⌉, i = 1..buckets — all boundaries
    * from one shared descent (≤6 scans on a 64-bit domain), plus one
    * counting pass for the per-bucket row counts. Returns
    * (bucket_idx 1-based, upper value, rows ≤ that boundary and >
    * the previous one). */
  def equiDepthHistogram(spark: SparkSession, vals: DataFrame,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val n = vals.count()
    require(n > 0, "equi-depth histogram of an empty relation")
    val ks = (1 to buckets).map(i => (BigInt(i) * n + buckets - 1).toLong / buckets)
    val bound = kthSmallestMulti(vals, ks)
    val bs = ks.map(bound)
    // one counting pass for all buckets: route each row to the FIRST
    // boundary ≥ v (boundaries are non-decreasing)
    val firstBucket = bs.zipWithIndex.reverse.foldLeft(lit(null).cast("int")) {
      case (acc, (ub, i)) => when(col("v") <= ub, lit(i + 1)).otherwise(acc)
    }
    val counts = vals.groupBy(firstBucket.as("bucket_idx"))
      .agg(count(lit(1)).as("rows_in"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    import spark.implicits._
    ks.indices.map { i =>
      (i + 1, ks(i), bs(i), counts.getOrElse(i + 1, 0L))
    }.toDF("bucket_idx", "k", "upper_v", "rows_in")
  }
}
