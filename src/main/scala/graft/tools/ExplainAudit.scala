// Physical-plan census for SURVEY §9: shuffle exchanges, broadcast
// exchanges, and nested-loop/cartesian flags per declared query.
//
//   sbt "runMain graft.tools.ExplainAudit <sfDir> [queryName...]"
//
// Counts come from the ANALYZED executedPlan string (AQE initial plan —
// the shape Catalyst committed to before runtime re-optimization), the
// same thing PlanAssertionsSpec greps.
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- graft.SparkEntry.registry if only.isEmpty || only(q.name)) {
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        println(s"${q.name}: shuffles=${n("Exchange hashpartitioning") + n("Exchange rangepartitioning")} " +
          s"broadcasts=${n("BroadcastExchange")} " +
          s"nlj=${n("BroadcastNestedLoopJoin")} cartesian=${n("CartesianProduct")} " +
          s"sortmerge=${n("SortMergeJoin")} topk=${n("TakeOrderedAndProject")}")
      } catch { case e: Throwable => println(s"${q.name}: ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
