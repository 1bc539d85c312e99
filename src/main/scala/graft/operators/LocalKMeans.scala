package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Driver-local seeded Lloyd's k-means over a CAPPED training sample,
  * plus a zero-shuffle nearest-centroid assignment map.
  *
  * Deliberately not distributed: every caller here trains on an
  * explicitly capped sample (`trainCap` rows — bounded at ANY corpus
  * scale, the faiss idiom), so the fit is O(cap·k·d·iters) driver
  * flops and the fitted centers ride back into the plan as literals.
  * Replacing the per-subspace/coarse MLlib KMeans fits with this
  * removed ~maxIter scheduled Spark jobs per fit (m·maxIter for PQ's
  * m subspace fits) whose scheduling overhead dominated fixture-scale
  * benches, while keeping the identical bounded-sample scale argument
  * — and assignment becomes ONE narrow map (no transform pass, no
  * shuffle): the centroid matrix is a plan constant.
  */
object LocalKMeans {

  /** Lloyd's with seeded distinct-row init. Ties go to the lowest
    * center index; empty clusters keep their previous center; early
    * exit when assignments stop changing. `off`/`d` select a column
    * slice so PQ's m subspace fits share one collected sample. */
  def fit(pts: Array[Array[Double]], off: Int, d: Int, k: Int,
      seed: Long, maxIter: Int): Array[Array[Double]] = {
    require(pts.nonEmpty, "k-means needs a nonempty training sample")
    val n = pts.length
    val rnd = new java.util.Random(seed)
    val kk = math.min(k, n)
    val chosen = new java.util.LinkedHashSet[Integer]
    while (chosen.size < kk) chosen.add(Int.box(rnd.nextInt(n)))
    val seedIdx = chosen.toArray(new Array[Integer](kk)).map(_.intValue)
    // k > n (tiny fixtures): duplicate seed rows — duplicates attract
    // no points under ties-to-lowest and are harmless
    val centers = Array.tabulate(k)(j =>
      java.util.Arrays.copyOfRange(pts(seedIdx(j % kk)), off, off + d))
    val assign = Array.fill(n)(-1)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      changed = false
      // assignment — the O(n·k·d) step; rows are independent
      val flips = java.util.stream.IntStream.range(0, n).parallel().map { i =>
        val p = pts(i)
        var best = 0
        var bestD = Double.PositiveInfinity
        var j = 0
        while (j < k) {
          val c = centers(j)
          var dd = 0.0
          var t = 0
          while (t < d) { val x = p(off + t) - c(t); dd += x * x; t += 1 }
          if (dd < bestD) { bestD = dd; best = j }
          j += 1
        }
        if (assign(i) != best) { assign(i) = best; 1 } else 0
      }.sum()
      changed = flips > 0
      if (changed) {
        val sums = Array.ofDim[Double](k, d)
        val counts = new Array[Long](k)
        var i = 0
        while (i < n) {
          val j = assign(i); val p = pts(i); counts(j) += 1
          var t = 0
          while (t < d) { sums(j)(t) += p(off + t); t += 1 }
          i += 1
        }
        var j = 0
        while (j < k) {
          if (counts(j) > 0) {
            var t = 0
            while (t < d) { centers(j)(t) = sums(j)(t) / counts(j); t += 1 }
          } // empty cluster: keep previous center
          j += 1
        }
      }
      iter += 1
    }
    centers
  }

  /** Collect a capped training sample of `vecCol` (zero-norm rows
    * excluded; unitized when `unit`) — the ONE distributed action a
    * local fit pays. */
  def sample(emb: DataFrame, vecCol: String, trainCap: Int,
      unit: Boolean): Array[Array[Double]] = {
    val nz = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
    val v =
      if (unit) transform(col(vecCol),
        x => x.cast("double") / VectorFunctions.norm(col(vecCol)))
      else col(vecCol).cast("array<double>")
    nz.select(v.as("v")).limit(trainCap).collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** Nearest-centroid id by squared Euclidean distance of `vec`
    * against the literal centroid matrix — a pure per-row expression
    * (no join, no shuffle; native
    * [[graft.plans.VectorExprs.NearestCentroidExpr]], one primitive
    * loop per row); ties to the lowest centroid id, matching the
    * fit's assignment rule. */
  def nearestCentId(vec: Column, centers: Array[Array[Double]]): Column =
    graft.plans.VectorExprs.nearestCentroid(vec, centers)

  /** The fitted centers as a tiny (cent_id, centv) frame — broadcast
    * by every probe-side consumer. */
  def centersDf(spark: org.apache.spark.sql.SparkSession,
      centers: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cent_id", "centv")
  }
}
