package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The skew triptych's ADAPTIVE leg, measured: a zipf-hot join key
  * (hot fraction ~50% of the big side) driven through
  *
  *  - `aqe_skew_on`: plain sort-merge join, AQE OptimizeSkewedJoin
  *    splits the hot reducer at runtime (the no-code-changes path);
  *  - `aqe_skew_off`: same join with the skew optimizer disabled —
  *    the straggler baseline (one reducer drags the stage);
  *  - `salted`: the q83 authoring-time idiom
  *    ([[graft.operators.Skew.saltedJoin]]) for reference.
  *
  * All three variants' aggregates are EQUALITY-ASSERTED before any
  * timing is reported. The JSON carries the executed-plan evidence for
  * the adaptive leg: `skew_join_fired` (SortMergeJoin(skew=true)
  * present) and `n_skewed_splits` (PartialReducerPartitionSpec count
  * across AQEShuffleReads — >1 means the hot reducer was actually
  * split).
  *
  * The big side derives from the real `lineitem` table (a ~86-byte
  * synthetic payload per row; the zipf key collapses l_partkey: half
  * the rows onto key 0), so bytes-per-row and comparison with q83's
  * salted numbers are apples-to-apples.
  *
  * {{{
  * sbt "runMain graft.tools.AqeSkewBench /root/testdata/sf0.1 3"
  * }}}
  */
object AqeSkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // zipf-hot fixture off the real fact table: even rows collapse onto
    // key 0 (the hot key), odd rows keep a 1..1000 spread
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"))
    val big = li.select(
        when(col("l_orderkey") % 2 === 0, 0L)
          .otherwise(col("l_partkey") % 1000 + 1).as("key"),
        col("l_orderkey"),
        concat(col("l_returnflag"), col("l_orderkey").cast("string"),
          lit("x" * 80)).as("payload"))
      // many mappers, like a real fact scan: AQE splits a skewed REDUCER
      // at map-output granularity, so a single-split local parquet file
      // (1 mapper) would leave OptimizeSkewedJoin nothing to split with —
      // the exact reason it silently didn't fire on the first cut of this
      // bench (plan read: AQEShuffleRead "coalesced", no skew mark)
      .repartition(64)
      .localCheckpoint() // pin: all variants join the SAME materialized rows
    val dim = spark.range(0, 1001).select(
      col("id").as("key"), (col("id") * 7 % 13).as("w"))
    val nBig = big.count()

    def agg(j: DataFrame) =
      j.agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
        sum(length(col("payload"))).as("sp"))

    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }

    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case q: QueryStageExec => allNodes(q.plan)
      case _ => p.children.flatMap(allNodes)
    })

    def run(name: String)(mk: () => DataFrame): (Double, org.apache.spark.sql.Row, DataFrame) = {
      var last: DataFrame = null
      var row: org.apache.spark.sql.Row = null
      mk().collect() // warmup (JIT + shuffle file reuse is cleared by new plans)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        last = mk()
        row = last.collect().head
        (System.nanoTime() - t0) / 1e9
      }
      (times.min, row, last)
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (tOn, rOn, dfOn) = run("aqe_skew_on")(() => agg(big.join(dim, "key")))
    val adaptive = dfOn.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan }.get
    val nodes = allNodes(adaptive)
    val fired = nodes.exists {
      case s: SortMergeJoinExec => s.isSkewJoin; case _ => false }
    val nSplits = nodes.collect { case r: AQEShuffleReadExec =>
      r.partitionSpecs.count(_.isInstanceOf[PartialReducerPartitionSpec]) }.sum
    if (sys.env.contains("SPARK_GRAFT_DEBUG_PLAN"))
      System.err.println(s"[aqe-skew] executed plan:\n$adaptive")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (tOff, rOff, _) = run("aqe_skew_off")(() => agg(big.join(dim, "key")))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (tSalt, rSalt, _) = run("salted")(() => agg(
      graft.operators.Skew.saltedJoin(big, dim, "key", "key", 8,
        bigSaltSource = Seq("l_orderkey"))))

    require(rOn == rOff && rOn == rSalt,
      s"variant results diverge: on=$rOn off=$rOff salted=$rSalt")

    println(
      s"""{"metric":"aqe_skew_join","sf":"$sfDir","big_rows":$nBig,"reps":$reps,
         |"hot_fraction":0.5,"aqe_skew_on_sec":$tOn,"aqe_skew_off_sec":$tOff,
         |"salted_sec":$tSalt,"skew_join_fired":$fired,"n_skewed_splits":$nSplits,
         |"equal_results":true}""".stripMargin.replace("\n", ""))
    spark.stop()
  }
}
