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

  test("spill guard: adversarial key cardinality under a tiny key budget stays exact") {
    // every o_orderkey is its own group — distinct keys (1500 at
    // sf0.001) vastly exceed the 64-key budget, forcing ~24 spill
    // passes per task; the result must still match the window
    // formulation row-for-row
    val orders = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wUnique = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("o_totalprice").desc)
    def grouped = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    def unique = orders.withColumn("rn", row_number().over(wUnique)).filter(col("rn") <= 1)

    val groupedBaseline = grouped.collect().toSet
    val uniqueBaseline = unique.collect().toSet
    val prev = install()
    spark.conf.set(graft.plans.TopKPerKeyExec.maxKeysConfKey, "64")
    try {
      assert(grouped.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(grouped.collect().toSet === groupedBaseline)
      assert(unique.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(unique.collect().toSet === uniqueBaseline)
    } finally {
      spark.conf.unset(graft.plans.TopKPerKeyExec.maxKeysConfKey)
      spark.experimental.extraOptimizations = prev._1
      spark.experimental.extraStrategies = prev._2
    }
  }

  test("GraftExtensions installs the top-k stack by default") {
    // a shared-JVM suite can't construct a fresh session per extensions
    // object, so assert the injection list itself (via the sql-package
    // bridge over the private[sql] builders)
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(exts)
    val rules = org.apache.spark.sql.GraftColumnBridge.builtOptimizerRules(exts, spark)
    val strategies = org.apache.spark.sql.GraftColumnBridge.builtStrategies(exts, spark)
    assert(rules.contains(TopKPerKeyRule))
    assert(rules.contains(graft.plans.CanonicalizeTokenizer))
    assert(strategies.contains(TopKPerKeyStrategy))
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
