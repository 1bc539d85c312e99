package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the bucketed-layout trade ([[graft.sources.Sinks
  * .writeBucketed]]): one-time bucketing cost vs per-query savings on
  * a fact-fact join (orders ⋈ lineitem on orderkey → groupBy agg),
  * with broadcast disabled so the comparison is shuffle-vs-layout.
  *
  * {{{
  * sbt "runMain graft.tools.BucketedJoinBench /tmp/sf10 3 32"
  * }}}
  */
object BucketedJoinBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val o = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    val l = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bucketed] $label%-34s ${s}%8.3f s  sf=$sfDir buckets=$buckets")
      s
    }

    // one-time layout cost (the publish-side shuffle, paid once)
    timed("bucket_write orders") {
      graft.sources.Sinks.writeBucketed(o, "bb_orders", "o_orderkey", buckets, Seq("o_orderkey"))
    }
    timed("bucket_write lineitem") {
      graft.sources.Sinks.writeBucketed(l, "bb_lineitem", "l_orderkey", buckets, Seq("l_orderkey"))
    }

    def joinAgg(ot: org.apache.spark.sql.DataFrame, lt: org.apache.spark.sql.DataFrame): Unit =
      ot.join(lt, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(sum("l_quantity").as("qty"), sum("l_extendedprice").as("rev"))
        .write.format("noop").mode("overwrite").save()

    joinAgg(o, l) // warmup
    (1 to reps).foreach(i => timed(s"shuffled_join rep$i")(joinAgg(o, l)))
    val bo = spark.table("bb_orders")
    val bl = spark.table("bb_lineitem")
    joinAgg(bo, bl) // warmup
    (1 to reps).foreach(i => timed(s"bucketed_join rep$i")(joinAgg(bo, bl)))

    // sanity: the bucketed join plan really is exchange-free at the join
    val p = bo.join(bl, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    println(s"[bucketed] join_inputs_exchange_free=${
      !p.linesIterator.dropWhile(!_.contains("SortMergeJoin")).mkString("\n").contains("Exchange")}")

    spark.sql("DROP TABLE IF EXISTS bb_orders")
    spark.sql("DROP TABLE IF EXISTS bb_lineitem")
    spark.stop()
  }
}
