package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.LinkRule

/** Unit specs for Fellegi–Sunter record linkage: the three-way
  * decision, blocking, null-safe agreement, and guard rails. (Cross-
  * engine value parity is the q187 DuckDB oracle gate.) */
class RecordLinkageSpec extends SparkSuite {
  import spark.implicits._

  private val rules = Seq(
    LinkRule("name", 10L, -5L), LinkRule("city", 4L, -2L))

  test("three-way decision: full agreement matches, partial lands in review, disjoint is nonmatch") {
    val left = Seq((1L, 1, "ann", "rome"), (2L, 1, "bob", "oslo"))
      .toDF("id", "blk", "name", "city")
    val right = Seq(
      (10L, 1, "ann", "rome"),  // agrees with 1 on both -> 14 match
      (20L, 1, "bob", "lima"),  // name-only with 2 -> 8 review
      (30L, 1, "zoe", "kiev"))  // disjoint -> -7 nonmatch
      .toDF("id", "blk", "name", "city")
    val r = RecordLinkage.link(left, right, "id", Seq("blk"), rules,
      lower = 0L, upper = 14L)
    val byPair = r.collect()
      .map(x => (x.getAs[Long]("l_id"), x.getAs[Long]("r_id")) ->
        (x.getAs[Long]("score"), x.getAs[String]("decision"))).toMap
    assert(byPair((1L, 10L)) === (14L, "match"))
    assert(byPair((2L, 20L)) === (8L, "review"))
    assert(byPair((1L, 30L)) === (-7L, "nonmatch"))
    assert(byPair((2L, 30L)) === (-7L, "nonmatch"))
  }

  test("blocking: pairs never cross blocks (candidate volume is per-block, not all-pairs)") {
    val left = Seq((1L, 1, "ann", "rome"), (2L, 2, "ann", "rome"))
      .toDF("id", "blk", "name", "city")
    val right = Seq((10L, 1, "ann", "rome"), (20L, 2, "ann", "rome"))
      .toDF("id", "blk", "name", "city")
    val r = RecordLinkage.link(left, right, "id", Seq("blk"), rules, 0L, 14L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 10L), (2L, 20L))) // never (1,20) or (2,10)
  }

  test("agreement is null-safe: both-null agrees, one-null disagrees") {
    val left = Seq((1L, 1, null.asInstanceOf[String], "rome"))
      .toDF("id", "blk", "name", "city")
    val right = Seq((10L, 1, null.asInstanceOf[String], "rome"),
      (20L, 1, "ann", "rome")).toDF("id", "blk", "name", "city")
    val r = RecordLinkage.link(left, right, "id", Seq("blk"), rules, 0L, 14L)
      .collect().map(x => x.getAs[Long]("r_id") -> x.getAs[Long]("score")).toMap
    assert(r(10L) === 14L) // null <=> null agrees
    assert(r(20L) === -1L) // null vs 'ann' disagrees: -5 + 4
  }

  test("guard rails: empty rules, missing blocking, inverted thresholds all fail fast") {
    val df = Seq((1L, 1, "a", "b")).toDF("id", "blk", "name", "city")
    intercept[IllegalArgumentException](
      RecordLinkage.link(df, df, "id", Seq("blk"), Nil, 0L, 1L))
    intercept[IllegalArgumentException](
      RecordLinkage.link(df, df, "id", Nil, rules, 0L, 1L))
    intercept[IllegalArgumentException](
      RecordLinkage.link(df, df, "id", Seq("blk"), rules, 5L, 1L))
  }

  test("plan: the block join is a hash/sort-merge equi-join, never a cartesian") {
    val df = Seq((1L, 1, "a", "b"), (2L, 2, "c", "d")).toDF("id", "blk", "name", "city")
    val plan = RecordLinkage.link(df, df, "id", Seq("blk"), rules, 0L, 14L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
