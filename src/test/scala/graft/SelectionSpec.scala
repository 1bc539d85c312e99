package graft

import org.apache.spark.sql.functions._

import graft.operators.Selection

/** Value-domain binary-search selection (q147's operator): equals the
  * sorted definition on random multisets including duplicates and
  * negatives, endpoint ranks, and the k bounds. */
class SelectionSpec extends SparkSuite {
  import spark.implicits._

  test("k-th smallest equals the sorted definition, duplicates and negatives included") {
    val rnd = new scala.util.Random(31)
    val xs = (1 to 1000).map(_ => (rnd.nextInt(200) - 100).toLong)
    val vals = Selection.pin(xs.toDF("x"), "x")
    val sorted = xs.sorted
    for (k <- Seq(1L, 2L, 500L, 501L, 999L, 1000L)) {
      val got = Selection.kthSmallest(vals, k)
      assert(got == sorted((k - 1).toInt), s"k=$k: $got vs ${sorted((k - 1).toInt)}")
    }
  }

  test("full 64-bit domain: extremes and random longs match the sorted definition") {
    // range > 2^62 forces the midpoint-split guard (v - lo would
    // overflow Long) before histogram refinement takes over
    val rnd = new scala.util.Random(7)
    val xs = Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L) ++
      (1 to 200).map(_ => rnd.nextLong())
    val vals = Selection.pin(xs.toDF("x"), "x")
    val sorted = xs.sorted
    for (k <- Seq(1L, 2L, 3L, 100L, sorted.length - 1L, sorted.length.toLong)) {
      val got = Selection.kthSmallest(vals, k)
      assert(got == sorted((k - 1).toInt), s"k=$k: $got vs ${sorted((k - 1).toInt)}")
    }
  }

  test("out-of-range k is rejected") {
    val vals = Selection.pin(Seq(1L, 2L, 3L).toDF("x"), "x")
    intercept[IllegalArgumentException] { Selection.kthSmallest(vals, 0L) }
    intercept[IllegalArgumentException] { Selection.kthSmallest(vals, 4L) }
  }

  test("empty relation is rejected with a clear contract error, not an NPE") {
    // regression: min/max are NULL on an empty relation — the bounds
    // unboxing used to NPE before the k<=n require could fire
    val empty = Selection.pin(Seq.empty[Long].toDF("x"), "x")
    intercept[IllegalArgumentException] { Selection.kthSmallest(empty, 1L) }
    intercept[IllegalArgumentException] { Selection.kthSmallestMulti(empty, Seq(1L)) }
  }

  test("multi-rank descent == per-rank answers on random data with duplicates") {
    val rnd = new scala.util.Random(97)
    val xs = (1 to 2000).map(_ => (rnd.nextInt(500) - 250).toLong)
    val vals = Selection.pin(xs.toDF("x"), "x")
    val sorted = xs.sorted
    val ks = Seq(1L, 7L, 250L, 1000L, 1999L, 2000L, 250L) // dup rank included
    val got = Selection.kthSmallestMulti(vals, ks)
    ks.distinct.foreach { k =>
      assert(got(k) == sorted((k - 1).toInt), s"k=$k: ${got(k)} vs ${sorted((k - 1).toInt)}")
    }
  }

  test("equi-depth histogram: exact boundaries, counts sum to n, depth balanced") {
    val rnd = new scala.util.Random(5)
    val xs = (1 to 1000).map(_ => rnd.nextInt(100000).toLong)
    val vals = Selection.pin(xs.toDF("x"), "x")
    val h = Selection.equiDepthHistogram(spark, vals, buckets = 4)
      .orderBy("bucket_idx").collect()
    val sorted = xs.sorted
    assert(h.length == 4)
    h.foreach { r =>
      assert(r.getLong(2) == sorted((r.getLong(1) - 1).toInt),
        s"boundary ${r.getLong(2)} != rank-${r.getLong(1)} value")
    }
    assert(h.map(_.getLong(3)).sum == 1000L)
    // near-uniform values → every bucket within 10% of n/4
    h.foreach(r => assert(math.abs(r.getLong(3) - 250L) <= 25, r.toString))
  }

  test("orderStats emits the requested ranks in one row") {
    val vals = Selection.pin((1L to 100L).toDF("x"), "x")
    val r = Selection.orderStats(spark, vals, Seq(
      ("med", n => (n + 1) / 2), ("p90", n => (n * 9 + 9) / 10))).head
    assert(r.getLong(0) == 100L && r.getLong(2) == 50L && r.getLong(4) == 90L,
      r.toString)
  }
}
