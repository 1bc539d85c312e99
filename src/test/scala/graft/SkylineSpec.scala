package graft

import org.apache.spark.sql.functions._

import graft.operators.{GlobalIds, Skyline}

/** 2-D Pareto frontier via prefix-max scan (q143's operator): hand
  * cases including coordinate ties and duplicated points, agreement
  * with the quadratic definition on a random set, and the prefixMax
  * primitive against the window formulation. */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  test("hand case: staircase kept, interior dominated, duplicates kept") {
    // frontier: (5,1), (3,3), (1,5); dominated: (2,2) by (3,3), (3,1)
    // by both (5,1) and (3,3); the duplicated point (3,3) keeps BOTH rows
    val df = Seq(
      ("a", 5L, 1L), ("b", 3L, 3L), ("b2", 3L, 3L),
      ("c", 1L, 5L), ("d", 2L, 2L), ("e", 3L, 1L)
    ).toDF("id", "x", "y")
    val got = Skyline.frontier2D(df, "x", "y")
      .select("id").as[String].collect().toSet
    assert(got == Set("a", "b", "b2", "c"), got.toString)
  }

  test("equals the quadratic definition on a pseudo-random point set") {
    val rnd = new scala.util.Random(23)
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.frontier2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) => bx >= x && by >= y && (bx > x || by > y) }
    }.map(_._1).toSet
    assert(got == brute, s"got=${got.size} brute=${brute.size}")
  }

  test("prefixMax == the exclusive running-max window; first row NULL") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 41).toLong)).toDF("id", "v")
    val got = GlobalIds.prefixMax(df, "v", "pm", numParts = 5, col("id"))
      .select("id", "pm")
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = df.select(col("id"), max("v").over(w).as("pm"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    assert(got.filter(col("id") === 1 && col("pm").isNull).count() == 1)
  }
}
