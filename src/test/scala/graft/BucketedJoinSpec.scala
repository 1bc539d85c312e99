package graft

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Tables}

/** Bucketed co-located joins ([[Sinks.writeBucketed]]): the write-time
  * layout that removes the per-query shuffle from repeated joins and
  * aggregations on the bucket key. Asserts the plan property (zero
  * Exchange) AND value equality with the shuffled join. */
class BucketedJoinSpec extends SparkSuite {

  private def withMinimalBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("both sides bucketed on the join key: zero exchanges, values equal the shuffled join") {
    val o = Tables(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val l = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(o, "spec_b_orders", "o_orderkey", 8, Seq("o_orderkey"))
    Sinks.writeBucketed(l, "spec_b_lineitem", "l_orderkey", 8, Seq("l_orderkey"))
    try withMinimalBroadcast {
      val j = spark.table("spec_b_orders")
        .join(spark.table("spec_b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      val rows = j.orderBy("o_custkey").collect()
      // adaptive final plan: the join AND the groupBy ride the bucket
      // layout (groupBy key o_custkey does still hash-shuffle — assert
      // specifically that the JOIN inputs have no exchange)
      val p = j.queryExecution.executedPlan.toString
      val joinSection = p.linesIterator
        .dropWhile(!_.contains("SortMergeJoin")).mkString("\n")
      assert(p.contains("SortMergeJoin"), p)
      assert(!joinSection.contains("Exchange"),
        s"bucketed join inputs must not re-shuffle\n$p")
      assert("Bucketed: true".r.findAllIn(p).size === 2, p)

      // value parity with the plain shuffled join
      val shuffled = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
        .orderBy("o_custkey").collect()
      assert(rows.map(_.toString).toSeq === shuffled.map(_.toString).toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_b_orders")
      spark.sql("DROP TABLE IF EXISTS spec_b_lineitem")
    }
  }

  test("groupBy on the bucket key plans with no exchange before the aggregate") {
    val l = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(l, "spec_b_li2", "l_orderkey", 8)
    try {
      val agg = spark.table("spec_b_li2")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucket-key aggregation must be exchange-free\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS spec_b_li2")
  }

  test("mismatched bucket counts fall back to a correct shuffled join (no wrong results)") {
    val o = Tables(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val l = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(o, "spec_b_o4", "o_orderkey", 4)
    Sinks.writeBucketed(l, "spec_b_l8", "l_orderkey", 8)
    try withMinimalBroadcast {
      val j = spark.table("spec_b_o4")
        .join(spark.table("spec_b_l8"), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val expected = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      assert(j.head.toString === expected.head.toString)
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_b_o4")
      spark.sql("DROP TABLE IF EXISTS spec_b_l8")
    }
  }
}
