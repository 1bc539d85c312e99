package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-skipping economics of the z-ordered layout
  * ([[graft.operators.Layout.writeZOrdered]]) vs a single-column sort
  * AT SCALE (LayoutSpec measures the same property at sf0.001): the
  * same selective aggregation filtered on EACH key column against both
  * layouts, reporting rows the parquet reader actually decoded.
  * Single-column sort prunes its own axis perfectly and the other not
  * at all; the z-curve should trade a little of the first for a lot of
  * the second.
  *
  * {{{
  * sbt "runMain graft.tools.ZOrderBench /tmp/sf10 3"
  * }}}
  */
object ZOrderBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = args.lift(2).map(_.toInt).getOrElse(32)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // static plans so the FileSourceScan metrics are directly readable
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val l = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val (maxOk, maxPk) = {
      val r = l.agg(max("l_orderkey"), max("l_partkey")).head
      (r.getLong(0), r.getLong(1))
    }
    // ~1%-selective ranges in the middle of each key domain
    val (okLo, okHi) = (maxOk / 2, maxOk / 2 + math.max(1L, maxOk / 100))
    val (pkLo, pkHi) = (maxPk / 2, maxPk / 2 + math.max(1L, maxPk / 100))

    val sortedDir = "/tmp/zbench_sorted_okey"
    val zDir = "/tmp/zbench_zorder"

    // skipping is invisible in wall-time on a page-cached local table —
    // the honest metric is ROWS SURVIVING ROW-GROUP PRUNING (the scan
    // node's numOutputRows: rows the reader actually decoded)
    def timed(label: String)(mk: => DataFrame): Unit = {
      def once(): (Double, Long) = {
        val df = mk
        val t0 = System.nanoTime()
        df.collect() // 1-row aggregate; runs THIS QueryExecution so its metrics populate
        val sec = (System.nanoTime() - t0) / 1e9
        val scanned = df.queryExecution.executedPlan.collectLeaves().map {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numOutputRows").value
          case _ => 0L
        }.sum
        (sec, scanned)
      }
      once()
      val samples = Vector.fill(reps)(once())
      val s = samples.map(_._1).sorted
      val rows = samples.head._2
      println(f"[zorder] $label%-36s min=${s.head}%8.3f  median=${s(s.length / 2)}%8.3f  rows_decoded=$rows%10d  sf=$sfDir")
    }

    println(s"[zorder] writing layouts ($parts files each; ok range $okLo-$okHi, pk range $pkLo-$pkHi)")
    l.repartitionByRange(parts, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sortedDir)
    graft.operators.Layout.writeZOrdered(l, "l_orderkey", "l_partkey", parts, zDir)

    def agg(df: DataFrame): DataFrame =
      df.agg(count(lit(1)), sum("l_quantity"))

    Seq("sorted_by_orderkey" -> sortedDir, "zordered" -> zDir).foreach { case (lay, dir) =>
      val t = spark.read.parquet(dir)
      timed(s"$lay: filter l_orderkey 1pct") {
        agg(t.filter(col("l_orderkey").between(okLo, okHi)))
      }
      timed(s"$lay: filter l_partkey 1pct") {
        agg(t.filter(col("l_partkey").between(pkLo, pkHi)))
      }
      timed(s"$lay: full scan (control)")(agg(t))
    }
    spark.stop()
  }
}
