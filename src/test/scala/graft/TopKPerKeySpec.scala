package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKeyRule, TopKPerKeyStrategy}
import graft.sources.Tables

/** The custom whole-operator stack: Filter(rn <= k, Window(row_number))
  * must plan as the bounded-heap TopKPerKeyExec and produce exactly the
  * rows the window formulation produces; window plans the rule cannot
  * accelerate must be left untouched. */
class TopKPerKeySpec extends SparkSuite {

  private def install(): (Seq[org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]],
      Seq[org.apache.spark.sql.execution.SparkStrategy]) = {
    val prev = (spark.experimental.extraOptimizations, spark.experimental.extraStrategies)
    spark.experimental.extraOptimizations = prev._1 :+ TopKPerKeyRule
    spark.experimental.extraStrategies = prev._2 :+ TopKPerKeyStrategy
    prev
  }

  test("plans as TopKPerKeyExec and matches the window formulation exactly") {
    val orders = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def topk = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)

    val prev = install()
    val accelerated =
      try {
        val df = topk
        val plan = df.queryExecution.executedPlan.toString
        // SparkPlan.nodeName strips the Exec suffix — the node prints
        // as "TopKPerKey". The WindowGroupLimit (and its sorts) must be
        // gone: the bounded heap needs only the hash exchange.
        assert(plan.contains("TopKPerKey"), plan)
        assert(!plan.contains("WindowGroupLimit") && !plan.contains("Sort "), plan)
        df.collect().toSet
      } finally {
        spark.experimental.extraOptimizations = prev._1
        spark.experimental.extraStrategies = prev._2
      }
    val baseline = topk
    assert(!baseline.queryExecution.executedPlan.toString.contains("TopKPerKey "))
    assert(accelerated === baseline.collect().toSet)
    assert(accelerated.nonEmpty)
  }

  test("rule leaves multi-function windows and rank() untouched") {
    val orders = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val prev = install()
    try {
      // q14 shape: row_number AND rank in the window — full frame needed
      val multi = orders
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .filter(col("rn") <= 3)
      assert(!multi.queryExecution.executedPlan.toString.contains("TopKPerKey "))
      // rank-only filter: not row_number semantics
      val ranked = orders.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3)
      assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey "))
    } finally {
      spark.experimental.extraOptimizations = prev._1
      spark.experimental.extraStrategies = prev._2
    }
  }
}
