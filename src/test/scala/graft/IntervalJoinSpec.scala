package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  test("pointInInterval: boundaries inclusive, exactly-once multiplicity, nulls match nothing") {
    val points = Seq((1L, 10L), (2L, 15L), (3L, 20L), (4L, 99L))
      .toDF("pid", "p") // 99 matches nothing
      .union(Seq((5L, Option.empty[Long])).toDF("pid", "p"))
    val intervals = Seq((100L, 10L, 20L), (200L, 15L, 15L), (300L, 18L, 30L))
      .toDF("iid", "s0", "e0")
    val got = IntervalJoin.pointInInterval(points, intervals, "p", "s0", "e0", width = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // p=10 ∈ [10,20]; p=15 ∈ [10,20] and [15,15]; p=20 ∈ [10,20] and [18,30]
    assert(got === Seq((1L, 100L), (2L, 100L), (2L, 200L), (3L, 100L), (3L, 300L)))
    // exactly-once even when an interval spans many buckets (width 1 →
    // interval [10,20] has 11 copies; each matching point still pairs once)
    val got1 = IntervalJoin.pointInInterval(points, intervals, "p", "s0", "e0", width = 1L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got1 === got)
  }

  test("inverted intervals (s > e) are dropped, not exploded backwards") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val bad = Seq((9L, 10L, 1L)).toDF("iid", "s0", "e0")
    assert(IntervalJoin.pointInInterval(points, bad, "p", "s0", "e0", 4L).count() === 0)
  }

  test("intervalOverlap: equals the naive theta join at several widths (exactly-once attribution)") {
    val left = spark.range(300).select(col("id").as("lid"),
      (col("id") % 97).as("ls"), (col("id") % 97 + col("id") % 11).as("le"))
    val right = spark.range(250).select(col("id").as("rid"),
      (col("id") % 89).as("rs"), (col("id") % 89 + col("id") % 7).as("re"))
    val naive = left.join(right,
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(naive.nonEmpty && naive.size === naive.toSet.size)
    for (w <- Seq(1L, 5L, 64L)) {
      val banded = IntervalJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // exactly-once: multiset equality, not just set equality
      assert(banded.sorted === naive.sorted, s"width $w")
    }
  }

  test("plan is a hash-partitionable equi-join on the bucket — no nested loop, no cartesian") {
    val points = spark.range(1000).select(col("id").as("pid"), (col("id") % 500).as("p"))
    val intervals = spark.range(800).select(col("id").as("iid"),
      (col("id") % 490).as("s0"), (col("id") % 490 + 5).as("e0"))
    val j = IntervalJoin.pointInInterval(points, intervals, "p", "s0", "e0", 8L)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("__graft_ij_bucket"), plan)
    // equals the naive theta join
    val naive = points.join(intervals,
        col("p") >= col("s0") && col("p") <= col("e0"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = j.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
  }
}
