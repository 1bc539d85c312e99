package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.Tables

/** Z-order layout: the interleave math and the property that actually
  * pays at 100 TB — per-file min/max bounds tighten on BOTH clustered
  * columns, where a linear sort bounds only its own sort key.
  */
class LayoutSpec extends SparkSuite {

  test("zValue interleave matches a bit-by-bit reference on edge values") {
    // reference: plain Scala bit loop
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      ((1L << 21) - 1, (1L << 21) - 1), (123456L, 654321L),
      (1L << 21, 0L) /* truncated high bit */ )
    import spark.implicits._
    val got = cases.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 21).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map { case (a, b) => ref(a, b, 21) })
  }

  test("z-order bounds BOTH dims per file; linear sort only its own") {
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    // normalized per-file spread of a column: mean over files of
    // (file max - file min) / (global max - global min)
    def spread(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length >= 4, s"expected >=4 output files, got ${files.length}")
      val g = li.agg(min(c), max(c)).head()
      val range = (g.getLong(1) - g.getLong(0)).toDouble
      files.map { f =>
        val r = spark.read.parquet(f).agg(min(c), max(c)).head()
        (r.getLong(1) - r.getLong(0)) / range
      }.sum / files.length
    }

    val zDir = Files.createTempDirectory("graft_zorder").toString
    val linDir = Files.createTempDirectory("graft_linear").toString
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", 8, zDir)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    val (zPart, zSupp) = (spread(zDir, "l_partkey"), spread(zDir, "l_suppkey"))
    val (lPart, lSupp) = (spread(linDir, "l_partkey"), spread(linDir, "l_suppkey"))
    // linear: its own key is tight, the other column spans ~everything
    assert(lPart < 0.35, s"linear sort key spread $lPart")
    assert(lSupp > 0.8, s"linear non-key spread $lSupp — expected ~global")
    // z-order: BOTH columns bounded well below the global range per file
    assert(zPart < 0.7 && zSupp < 0.7, s"z spreads ($zPart, $zSupp)")
    // and the two-dim win is real: the worse z dim beats linear's worse dim
    assert(math.max(zPart, zSupp) < lSupp,
      s"z worst ${math.max(zPart, zSupp)} !< linear worst $lSupp")
  }

  test("z-order read-back SKIPS row groups: scan emits a fraction of rows under a 2-D predicate") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val total = li.count()
    val zDir = Files.createTempDirectory("graft_zprune").toString
    val linDir = Files.createTempDirectory("graft_linprune").toString
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", 8, zDir)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)
    // rows the parquet reader actually SURFACED (surviving row groups):
    // with the predicate pushed, a row group whose min/max can't satisfy
    // it is never decoded, so the scan node's numOutputRows is the
    // skipped-ness measure — not the post-filter result count
    def scanRows(dir: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(dir).filter(pred)
      // execute THIS queryExecution (a separate .count() would build
      // its own plan and leave these metrics untouched)
      val n = df.collect().length.toLong
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
      assert(scans.head.metadata("PushedFilters").contains("GreaterThanOrEqual"),
        s"predicate not pushed: ${scans.head.metadata("PushedFilters")}")
      (scans.map(_.metrics("numOutputRows").value).sum, n)
    }
    // selective rectangle on the dimension a l_partkey-linear sort does
    // NOT bound: suppkey ∈ a ~10% band. Same predicate both layouts.
    val hi = li.agg(max("l_suppkey")).head.getLong(0)
    val pred = col("l_suppkey") >= 0 && col("l_suppkey") <= hi / 10
    val (zScan, zResult) = scanRows(zDir, pred)
    val (linScan, linResult) = scanRows(linDir, pred)
    assert(zResult === linResult, "layouts must agree on the answer")
    info(f"total=$total z_scan=$zScan (${zScan.toDouble / total}%.2f) " +
      f"lin_scan=$linScan (${linScan.toDouble / total}%.2f) result=$zResult")
    // linear layout can't skip for a suppkey predicate: reads ~everything
    assert(linScan > total * 9 / 10,
      s"linear layout unexpectedly skipped ($linScan of $total)")
    // z-order: at least a third of the corpus never decoded (measured
    // ~0.50 scanned at 8 files; floor leaves slack for stats wiggle)
    assert(zScan < total * 2 / 3, s"z-order skipped nothing: $zScan of $total")
    assert(zScan < linScan, "z-order must beat linear for the 2-D predicate")
  }

  test("rank-scaled z-order survives a far outlier; min/max scaling collapses") {
    import spark.implicits._
    // 99% of `a` packed into [0,100), 1% outliers at ~1e9: min/max
    // scaling maps the dense mass to a single z-cell, so the layout
    // degenerates to a linear sort of `b`; quantile bucketing spends
    // its bits where the data lives. `b` is uniform via a Weyl-ish mix.
    val n = 20000
    val skewed = spark.range(n).select(
      when(col("id") % 100 < 99, col("id") % 100)
        .otherwise(lit(1000000000L) + col("id")).as("a"),
      (col("id") * 2654435761L % 10007L).as("b"))
      .cache()
    // rank-space tightness of dimension `a`: mean over files of the
    // fraction of ALL rows falling inside the file's [min(a), max(a)]
    // — immune to the outlier stretching the absolute range
    def rankSpread(dir: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length >= 4, s"expected >=4 files, got ${files.length}")
      val total = skewed.count().toDouble
      files.map { f =>
        val r = spark.read.parquet(f).agg(min("a"), max("a")).head()
        skewed.filter(col("a") >= r.getLong(0) && col("a") <= r.getLong(1))
          .count() / total
      }.sum / files.length
    }
    val mmDir = Files.createTempDirectory("graft_z_minmax").toString
    val rkDir = Files.createTempDirectory("graft_z_rank").toString
    Layout.writeZOrdered(skewed, "a", "b", 8, mmDir)
    Layout.writeZOrderedByRank(skewed, "a", "b", 8, rkDir)
    val (mmA, rkA) = (rankSpread(mmDir), rankSpread(rkDir))
    info(s"min/max a-tightness $mmA, rank a-tightness $rkA")
    // min/max: each file spans ~the whole dense mass
    assert(mmA > 0.7, s"expected min/max collapse, got $mmA")
    // rank: files cover a strict subset of the mass (measured 0.58 vs
    // 0.99; margin absorbs approxQuantile merge-order wiggle)
    assert(rkA < 0.65 && rkA < mmA * 0.75, s"rank $rkA vs minmax $mmA")
  }
}
