package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKeyExec, TopKPerKeyRule, TopKPerKeyStrategy}
import graft.sources.Tables

/** The custom whole-operator stack: Filter(rn <= k, Window(row_number
  * [+ rank/dense_rank])) must plan as the bounded-heap TopKPerKeyExec
  * and produce exactly the rows the window formulation produces; window
  * plans the rule cannot accelerate must be left untouched.
  *
  * The suite session installs GraftExtensions (like the gate sessions),
  * so the stack is active by default; window-formulation baselines are
  * computed under the `spark.graft.topk.enabled=false` kill switch. */
class TopKPerKeySpec extends SparkSuite {

  private def withTopKDisabled[T](body: => T): T = {
    spark.conf.set(TopKPerKeyExec.enabledConfKey, "false")
    try body finally spark.conf.unset(TopKPerKeyExec.enabledConfKey)
  }

  test("plans as TopKPerKeyExec by default and matches the window formulation exactly") {
    val orders = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def topk = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)

    val df = topk
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix — the node prints
    // as "TopKPerKey". The WindowGroupLimit (and its sorts) must be
    // gone: the bounded heap needs only the hash exchange.
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Sort "), plan)
    val accelerated = df.collect().toSet

    val baseline = withTopKDisabled {
      val b = topk
      assert(!b.queryExecution.executedPlan.toString.contains("TopKPerKey"), "kill switch ignored")
      b.collect().toSet
    }
    assert(accelerated === baseline)
    assert(accelerated.nonEmpty)
  }

  test("rank and dense_rank companions ride the heap and match the window formulation") {
    val orders = Tables(spark, sfDir, "orders")
    // o_orderdate ties WITHIN a customer are common at sf0.001, so rank
    // genuinely diverges from row_number and dense_rank from rank —
    // o_orderkey tiebreak in row_number keeps the kept-set total-ordered
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wTie = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    def topk = orders
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 4)

    val df = topk
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      df.queryExecution.executedPlan.toString)
    val accelerated = df.collect().toSet
    val baseline = withTopKDisabled(topk.collect().toSet)
    assert(accelerated === baseline)
    assert(accelerated.nonEmpty)

    // ties on a NON-total order: both formulations are nondeterministic
    // in which tied rows they keep, but rank/dense_rank values within
    // the kept set must still be window-consistent; compare against the
    // window functions recomputed over the SAME kept rows
    def tied = orders
      .withColumn("rn", row_number().over(wTie))
      .withColumn("rnk", rank().over(wTie))
      .filter(col("rn") <= 3)
    val t = tied
    assert(t.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val kept = t.collect()
    kept.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Int]("rn") == i + 1)
        val expectRnk =
          if (i == 0) 1
          else if (sorted(i - 1).getAs[java.sql.Timestamp]("o_orderdate") == r.getAs[java.sql.Timestamp]("o_orderdate"))
            sorted(i - 1).getAs[Int]("rnk")
          else i + 1
        assert(r.getAs[Int]("rnk") == expectRnk, sorted.mkString("\n"))
      }
    }
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

    val groupedBaseline = withTopKDisabled(grouped.collect().toSet)
    val uniqueBaseline = withTopKDisabled(unique.collect().toSet)
    spark.conf.set(TopKPerKeyExec.maxKeysConfKey, "64")
    try {
      assert(grouped.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(grouped.collect().toSet === groupedBaseline)
      assert(unique.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(unique.collect().toSet === uniqueBaseline)
    } finally {
      spark.conf.unset(TopKPerKeyExec.maxKeysConfKey)
    }
  }

  test("spill path performance: heavy fan-out spill stays within 4x of no-spill") {
    // 200k distinct keys, top-1 per key — at the default cap nothing
    // spills; at cap=4096 each task overflows ~10x its budget, forcing
    // the full bucket-fan-out machinery (~2 levels at fanOut=16).
    // The fan-out design bounds rewrite amplification at O(log) per
    // row; the pre-fan-out sequential chain was O(passes) and failed
    // this bound by an order of magnitude.
    import spark.implicits._
    val n = 200000L
    def topk = spark.range(n).select(
        col("id").as("k"),
        (col("id") * 2654435761L % 97).as("v"),
        concat(lit("payload-"), col("id")).as("pay"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc)))
      .filter(col("rn") <= 1)
    def run(): Long = topk.rdd.count() // rdd.count defeats the optimizer's count-only pruning
    assert(topk.queryExecution.executedPlan.toString.contains("TopKPerKey"))

    def timed(body: => Unit): Double = {
      body // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      samples.min
    }
    val noSpill = timed(assert(run() === n))
    spark.conf.set(TopKPerKeyExec.maxKeysConfKey, "4096")
    val spilly =
      try timed(assert(run() === n))
      finally spark.conf.unset(TopKPerKeyExec.maxKeysConfKey)
    info(f"no-spill $noSpill%.3f s, spill(cap=4096) $spilly%.3f s, ratio ${spilly / noSpill}%.2f")
    assert(spilly <= noSpill * 4.0 + 0.5,
      f"spill path too slow: $spilly%.3f s vs no-spill $noSpill%.3f s")
  }

  test("GraftExtensions installs the top-k stack by default") {
    // assert the injection list itself (via the sql-package bridge over
    // the private[sql] builders) — independent of suite session state
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(exts)
    val rules = org.apache.spark.sql.GraftColumnBridge.builtOptimizerRules(exts, spark)
    val strategies = org.apache.spark.sql.GraftColumnBridge.builtStrategies(exts, spark)
    assert(rules.contains(TopKPerKeyRule))
    assert(rules.contains(graft.plans.CanonicalizeTokenizer))
    assert(strategies.contains(TopKPerKeyStrategy))
  }

  test("rank <= k plans as the with-ties variant and keeps boundary ties") {
    // crafted boundary ties: key "a" has order values 1,2,2,9 — rank<=2
    // must keep THREE rows (1 and both 2s); key "b" is tie-free
    import spark.implicits._
    val df = Seq(("a", 1, "r1"), ("a", 2, "r2"), ("a", 2, "r3"), ("a", 9, "r4"),
      ("b", 5, "s1"), ("b", 6, "s2"), ("b", 7, "s3")).toDF("k", "v", "tag")
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
    def topk = df
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rnk") <= 2)
    val t = topk
    val plan = t.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    // Spark's Rank-mode WindowGroupLimit (and its sorts) must be
    // stripped, same as the row_number flavor
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Sort "), plan)
    val accelerated = t.collect().toSet
    val baseline = withTopKDisabled(topk.collect().toSet)
    assert(accelerated === baseline)
    assert(accelerated.count(_.getAs[String]("k") == "a") === 3,
      accelerated.mkString("\n")) // boundary tie kept
    assert(accelerated.count(_.getAs[String]("k") == "b") === 2)
  }

  test("with-ties variant matches the window formulation on real data, incl. spill") {
    // o_orderdate within a customer ties often at sf0.001, so boundary
    // groups genuinely exceed k; the kept set under `rank <= k` is
    // complete tie-groups — deterministic, so exact set-compare is valid
    // (unlike the row_number flavor on a non-total order)
    val orders = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    def topk = orders
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rnk") <= 3)
    assert(topk.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val baseline = withTopKDisabled(topk.collect().toSet)
    assert(topk.collect().toSet === baseline)
    assert(baseline.nonEmpty)
    // and through the spill path: tiny key budget forces follow-up
    // passes with the TiesKeeper
    spark.conf.set(TopKPerKeyExec.maxKeysConfKey, "64")
    try assert(topk.collect().toSet === baseline)
    finally spark.conf.unset(TopKPerKeyExec.maxKeysConfKey)
  }

  test("rule leaves dense_rank filters and full-frame windows untouched") {
    val orders = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // dense_rank filter: `dense_rank <= k` keeps the first k DISTINCT
    // order values however many rows carry them — not covered by either
    // exec flavor, must stay with the window formulation
    val densed = orders.withColumn("drnk", dense_rank().over(w)).filter(col("drnk") <= 3)
    assert(!densed.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // a companion needing the full frame (sum) blocks the rewrite
    val framed = orders
      .withColumn("rn", row_number().over(w))
      .withColumn("s", sum(col("o_totalprice")).over(w))
      .filter(col("rn") <= 3)
    assert(!framed.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
