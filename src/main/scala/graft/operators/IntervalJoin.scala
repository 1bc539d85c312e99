package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join with NO equi key — the shape Spark itself
  * plans as a broadcast/cartesian nested loop and commercial engines
  * ship dedicated "range join" optimizations for: match every point p
  * to every interval [s, e] containing it, where both sides are big.
  *
  * Band-bucketing turns it into an equi-join: both sides key on
  * floor(t / width) — a point lands in exactly one bucket, an interval
  * replicates to each bucket it overlaps (`sequence` explode, bounded
  * by len/width + 1 copies) — then the exact containment predicate
  * filters the bucket-collocated candidates. Every true pair surfaces
  * EXACTLY once: the point's bucket is unique, and the interval has
  * exactly one copy in that bucket, so no post-dedup is needed.
  *
  * 100 TB properties: the bucket equi-join is hash-partitionable (no
  * nested loop, no broadcast of a big side); candidate volume is
  * points-per-bucket × interval-copies-per-bucket, tuned by `width` —
  * pick width ≈ the typical interval length so replication stays O(1)
  * per interval while buckets stay selective. Temporal skew (a hot
  * bucket) degrades to one fat join key, the standard salting target
  * ([[Skew.saltedJoin]] composes if measured).
  *
  * Columns must be integral (epoch seconds/days): `sequence` needs
  * integral bounds, and bucket arithmetic on exact integers is
  * engine-portable for the oracle.
  */
object IntervalJoin {

  /** All (point, interval) pairs with `s <= p <= e` (inclusive both
    * ends), as one row carrying both sides' columns. Point and interval
    * column names must be disjoint. Null points/bounds match nothing
    * (null bucket joins nothing, like the equi-join it builds on). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String, width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val b = "__graft_ij_bucket"
    val pb = points.withColumn(b, floor(col(pointCol) / width))
    val ib = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn(b, explode(sequence(
        floor(col(startCol) / width), floor(col(endCol) / width))))
    pb.join(ib, Seq(b))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(b)
  }

  /** All (left, right) interval pairs that OVERLAP: `ls <= re AND
    * rs <= le` (inclusive touch counts). Same banding idea, one extra
    * wrinkle: both sides replicate to their buckets, so an overlapping
    * pair can co-occur in SEVERAL buckets — the join attributes each
    * pair to ONE canonical bucket (the bucket of max(ls, rs), the
    * overlap's start, which both copies are guaranteed to cover) so
    * every true pair surfaces exactly once without a dedup pass.
    * Column names must be disjoint across the two sides. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val b = "__graft_ij_bucket"
    val lb = left.filter(col(lStart) <= col(lEnd))
      .withColumn(b, explode(sequence(
        floor(col(lStart) / width), floor(col(lEnd) / width))))
    val rb = right.filter(col(rStart) <= col(rEnd))
      .withColumn(b, explode(sequence(
        floor(col(rStart) / width), floor(col(rEnd) / width))))
    lb.join(rb, Seq(b))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // canonical-bucket attribution: keep the copy pair in the bucket
      // where the overlap starts
      .filter(col(b) === floor(greatest(col(lStart), col(rStart)) / width))
      .drop(b)
  }
}
