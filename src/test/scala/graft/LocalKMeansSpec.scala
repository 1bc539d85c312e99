package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LocalKMeans

/** Driver-local Lloyd's (the capped-sample fit behind the whole ANN
  * family): convergence, determinism, and degenerate-input contracts.
  * Pure driver code — no Spark session needed. */
class LocalKMeansSpec extends AnyFunSuite {

  private def mkPts(n: Int, d: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rnd.nextDouble() * 10 - 5))
  }

  private def sse(pts: Array[Array[Double]], centers: Array[Array[Double]],
      off: Int, d: Int): Double =
    pts.map { p =>
      centers.map { c =>
        var s = 0.0; var t = 0
        while (t < d) { val x = p(off + t) - c(t); s += x * x; t += 1 }
        s
      }.min
    }.sum

  test("more Lloyd iterations never increase SSE; fit beats the seeded init") {
    val pts = mkPts(500, 6, 3)
    val one = LocalKMeans.fit(pts, 0, 6, 8, seed = 9L, maxIter = 1)
    val ten = LocalKMeans.fit(pts, 0, 6, 8, seed = 9L, maxIter = 10)
    val s1 = sse(pts, one, 0, 6)
    val s10 = sse(pts, ten, 0, 6)
    assert(s10 <= s1 + 1e-9, s"SSE rose with iterations: $s1 -> $s10")
  }

  test("same seed → identical centers; different seed → different fit") {
    val pts = mkPts(300, 4, 11)
    val a = LocalKMeans.fit(pts, 0, 4, 5, seed = 1L, maxIter = 10)
    val b = LocalKMeans.fit(pts, 0, 4, 5, seed = 1L, maxIter = 10)
    val c = LocalKMeans.fit(pts, 0, 4, 5, seed = 2L, maxIter = 10)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }

  test("k > n pads with duplicate seeds that attract nothing; k centers always returned") {
    val pts = mkPts(3, 2, 7)
    val centers = LocalKMeans.fit(pts, 0, 2, 8, seed = 5L, maxIter = 5)
    assert(centers.length == 8)
    // every point sits exactly on some center (each point is its own cluster)
    pts.foreach { p =>
      assert(centers.exists(c => c(0) == p(0) && c(1) == p(1)), p.toSeq.toString)
    }
  }

  test("slice offsets fit disjoint subspaces of the same sample independently") {
    val pts = mkPts(200, 8, 13)
    val left = LocalKMeans.fit(pts, 0, 4, 4, seed = 21L, maxIter = 10)
    val right = LocalKMeans.fit(pts, 4, 4, 4, seed = 21L, maxIter = 10)
    assert(left.forall(_.length == 4) && right.forall(_.length == 4))
    assert(left.map(_.toSeq).toSeq != right.map(_.toSeq).toSeq)
  }
}
