package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset

/** k-center greedy (q135's operator): known farthest-point trajectory
  * on a hand-built configuration, the greedy invariants (selection
  * distances non-increasing; final cover radius ≤ last selection
  * distance), and partitioning invariance. */
class CoresetSpec extends SparkSuite {
  import spark.implicits._

  // unit vectors at 0°, 45°, 90°, 180° — greedy from the 0° seed must
  // go 180° (d=2), then 90° (d=1), then 45° (d≈0.2929)
  private def v(deg: Double): Array[Float] =
    Array(math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
  private val toy = Seq(
    (0L, v(0)), (1L, v(45)), (2L, v(90)), (3L, v(180))
  ).toDF("vec_id", "embedding")

  test("farthest-point trajectory on the hand-built configuration") {
    val got = Coreset.kCenterGreedy(toy, "vec_id", "embedding", k = 4)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.map(_._2).toSeq == Seq(0L, 3L, 2L, 1L), got.mkString(", "))
    assert(got(1)._3.get == 2.0 && got(2)._3.get == 1.0, got.mkString(", "))
    assert(math.abs(got(3)._3.get - 0.2929) < 1e-9, got.mkString(", "))
  }

  test("selection distances are non-increasing; cover radius ≤ last pick") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val k = 6
    val picks = Coreset.kCenterGreedy(emb, "vec_id", "embedding", k)
      .orderBy("step").collect()
    val ds = picks.drop(1).map(_.getDouble(2)).toSeq
    assert(ds == ds.sorted(Ordering[Double].reverse), ds.toString)
    // recompute every point's distance to the selected set: the greedy
    // guarantee says it cannot exceed the last selection distance
    val centerIds = picks.map(_.getLong(1)).toSeq
    val centers = emb.filter(col("vec_id").isInCollection(centerIds))
      .select("embedding").collect().map(_.getSeq[Float](0))
    val pts = emb.select("embedding").collect().map(_.getSeq[Float](0))
    def dist(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      math.floor((1 - dot / (na * nb)) * 1e4 + 0.5) / 1e4
    }
    val radius = pts.map(p => centers.map(c => dist(p, c)).min).max
    assert(radius <= ds.last + 1e-12, s"cover radius $radius > last pick ${ds.last}")
  }

  test("selection is invariant under input repartitioning") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = Coreset.kCenterGreedy(emb, "vec_id", "embedding", k = 5)
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    val b = Coreset.kCenterGreedy(emb.repartition(7), "vec_id", "embedding", k = 5)
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    assert(a == b, s"$a vs $b")
  }
}
