package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k) distinct-set sketch — the theta-
  * sketch family member (Beyer et al. SIGMOD'07; Dasgupta et al.'s
  * Theta sketches) that closes the set-OPERATION gap HLL leaves:
  * two sketches support a UNION estimate (like HLL) and an
  * INTERSECTION/Jaccard estimate (HLL cannot intersect) — "how much do
  * these two crawl snapshots overlap?" without joining them.
  *
  * State is the k smallest DISTINCT hash values of the set. Properties:
  *
  *  - **Mergeable** (PODS'12 sense): KMV_k(A ∪ B) = bottom-k of
  *    KMV_k(A) ∪ KMV_k(B) — exactly, not approximately — so partial
  *    aggregation, shuffle combining, and streaming Complete-mode all
  *    preserve the sketch. Only k hashes cross the wire per partition.
  *  - **Deterministic & engine-portable**: values hash through md5
  *    (the repo's oracle idiom), bottom-k is a total order on hex
  *    strings — DuckDB replays every sketch byte-for-byte, so the
  *    ESTIMATES (not just the mechanics) oracle-check exactly.
  *  - **Jaccard estimator**: with T = bottom-k of the union,
  *    Ĵ = |T ∩ KMV(A) ∩ KMV(B)| / |T| — an unbiased estimate with
  *    RMSE ≈ 1/√k (Beyer et al. §4). The declared query (q141) carries
  *    the exact Jaccard next to the estimate so the error is visible
  *    in the gated output at every scale.
  *
  * At 100 TB the sketch pass is one map-side-combined aggregate whose
  * state is k×16 bytes; the exact comparison column is the test-scale
  * certificate only — production runs the sketch alone.
  */
object Kmv {

  /** Typed Aggregator: bottom-k distinct hex-hash strings, ascending. */
  class BottomKSketch(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, Seq[String], Seq[String]] {
    require(k > 0, s"need k > 0, got $k")
    private def best(v: Seq[String]): Seq[String] = v.distinct.sorted.take(k)
    def zero: Seq[String] = Vector.empty
    def reduce(s: Seq[String], x: String): Seq[String] =
      if (x == null) s else best(s :+ x)
    def merge(a: Seq[String], b: Seq[String]): Seq[String] = best(a ++ b)
    def finish(s: Seq[String]): Seq[String] = best(s)
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** One-row frame (`kmv`: the bottom-k distinct md5 hashes of
    * `valueCol`, ascending). */
  def sketch(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(md5(valueCol.cast("string")).as("h")).as[String]
      .select(new BottomKSketch(k).toColumn.name("kmv")).toDF()
  }

  /** Columnar sketch merge: bottom-k of the two hash arrays' union —
    * exact (the mergeability property), no data repass. */
  def mergeSketches(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Jaccard estimate from two sketches: |T ∩ A ∩ B| / |T| with T the
    * merged bottom-k. |T| (not k) in the denominator keeps the
    * estimator exact when the union has fewer than k distinct values
    * — in that regime T IS the union and the "estimate" is the true
    * Jaccard. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val t = mergeSketches(a, b, k)
    size(array_intersect(array_intersect(t, a), b)).cast("double") /
      size(t).cast("double")
  }
}
