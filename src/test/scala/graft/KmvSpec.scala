package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmv

/** KMV bottom-k sketch (q141's operator): exact mergeability, the
  * estimator's exact-regime and endpoint behavior, and partitioning
  * invariance. */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  private def vals(xs: String*) = xs.toDF("v")
  private def sk(df: org.apache.spark.sql.DataFrame, k: Int): Seq[String] =
    Kmv.sketch(df, col("v"), k).head.getSeq[String](0)

  test("sketch(A ∪ B) == columnar merge of sketch(A) and sketch(B), exactly") {
    val a = vals((1 to 40).map(i => s"a$i"): _*)
    val b = vals((20 to 60).map(i => s"a$i"): _*) // overlaps a
    val k = 8
    val direct = sk(a.union(b), k)
    val merged = Kmv.sketch(a, col("v"), k)
      .crossJoin(Kmv.sketch(b, col("v"), k).withColumnRenamed("kmv", "kb"))
      .select(Kmv.mergeSketches(col("kmv"), col("kb"), k).as("m"))
      .head.getSeq[String](0)
    assert(direct == merged, s"$direct vs $merged")
  }

  test("estimator: identical sets → 1, disjoint sets → 0; exact when union < k") {
    val k = 32
    val a = vals((1 to 10).map(i => s"x$i"): _*)
    val b = vals((6 to 15).map(i => s"x$i"): _*)
    def est(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame): Double =
      Kmv.sketch(x, col("v"), k)
        .crossJoin(Kmv.sketch(y, col("v"), k).withColumnRenamed("kmv", "kb"))
        .select(Kmv.jaccardEstimate(col("kmv"), col("kb"), k).as("e"))
        .head.getDouble(0)
    assert(est(a, a) == 1.0)
    assert(est(a, vals((100 to 110).map(i => s"y$i"): _*)) == 0.0)
    // union has 15 < k distinct values → the estimate IS the true 5/15
    assert(math.abs(est(a, b) - 5.0 / 15.0) < 1e-12)
  }

  test("sketch ignores nulls and duplicates; invariant under repartition") {
    val withDupsNulls = (Seq.fill(5)("d1") ++ Seq("d2", null, "d3", null))
      .toDF("v")
    val s1 = sk(withDupsNulls, 16)
    assert(s1.length == 3 && s1 == s1.distinct.sorted, s1.toString)
    val big = vals((1 to 200).map(i => s"z$i"): _*)
    assert(sk(big, 16) == sk(big.repartition(13), 16))
  }
}
