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
}
