package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline, Börzsönyi et al. ICDE'01), maximizing
  * both metrics: keep rows no other row dominates (≥ on both
  * coordinates, > on at least one). The multi-criteria selection shape
  * of data curation — "no doc both higher-quality AND longer exists" —
  * where any single weighted score hides the trade-off.
  *
  * Algorithm: for 2-D the frontier is a PREFIX-MAX scan, not a
  * quadratic join — over distinct points in (x DESC, y DESC) order, a
  * point is on the frontier iff its y strictly exceeds the running max
  * of y over its predecessors. Every predecessor has x ≥ this point's
  * x (with same-x higher-y sorted first), so `y > runningMax` is
  * exactly non-dominance: an earlier point achieving runningMax ≥ y
  * either has x strictly greater (dominates) or equal x with y
  * strictly greater (dominates). Duplicated points are collapsed to
  * one before the scan, so coordinate ties keep every carrier row (no
  * self-domination).
  *
  * Scale shape: the scan is [[GlobalIds.prefixMax]] — ONE range
  * exchange + broadcast per-partition maxes + a narrow pass; the
  * frontier set is then a hash equi-join back to the carrier rows.
  * The quadratic NOT EXISTS spelling is the ORACLE, never the plan.
  */
object Skyline {

  /** Rows of `df` whose (xCol, yCol) point lies on the maximizing
    * Pareto frontier. Both metrics must be integral (cast to LONG). */
  def frontier2D(df: DataFrame, xCol: String, yCol: String,
      numParts: Int = 32): DataFrame = {
    val pts = df
      .select(col(xCol).cast("long").as("_sx"), col(yCol).cast("long").as("_sy"))
      .distinct()
    val scanned = GlobalIds.prefixMax(pts, "_sy", "_pm", numParts,
      col("_sx").desc, col("_sy").desc)
    val frontier = scanned
      .filter(col("_pm").isNull || col("_sy") > col("_pm"))
      .select("_sx", "_sy")
    df.join(frontier,
      df.col(xCol).cast("long") === col("_sx") &&
        df.col(yCol).cast("long") === col("_sy"))
      .drop("_sx", "_sy")
  }
}
