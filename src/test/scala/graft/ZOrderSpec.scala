package graft

import org.apache.spark.sql.functions._

import graft.plans.ZOrderExpr
import graft.sources.{Sinks, Tables}

/** Z-order layout specs: Morton kernel semantics (known values, modular
  * wrap, property vs a naive interleave), eager codegen compile, and
  * the writeZOrdered layout contract (schema/rows preserved, per-file
  * z-ranges disjoint). Cross-engine value parity is the q189 gate;
  * skipping economics are BENCH_ZORDER_r09. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def naiveZ(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("kernel: known values, axis bits, and modular lo-31 semantics") {
    assert(ZOrderExpr.zValue(0L, 0L) === 0L)
    assert(ZOrderExpr.zValue(1L, 0L) === 1L)
    assert(ZOrderExpr.zValue(0L, 1L) === 2L)
    assert(ZOrderExpr.zValue(5L, 3L) === 27L)
    // inputs wrap modulo 2^31 (layout-only semantics)
    assert(ZOrderExpr.zValue((1L << 31) + 5L, 3L) === ZOrderExpr.zValue(5L, 3L))
    assert(ZOrderExpr.zValue(-1L, 0L) === ZOrderExpr.zValue((1L << 31) - 1L, 0L))
    // max operands stay in the non-negative 62-bit range
    val zmax = ZOrderExpr.zValue((1L << 31) - 1L, (1L << 31) - 1L)
    assert(zmax > 0L && zmax < (1L << 62))
  }

  test("property: kernel equals the naive bit loop on random operands") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong() & 0x7FFFFFFFL
      val b = rnd.nextLong() & 0x7FFFFFFFL
      assert(ZOrderExpr.zValue(a, b) === naiveZ(a, b), s"a=$a b=$b")
    }
  }

  test("GENERATED code compiles and equals interpreted eval (incl. null)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.LongType
    val expr = ZOrderExpr.ZValueExpr(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    Seq((0L, 0L), (5L, 3L), (123456789L, 987654321L)).foreach { case (a, b) =>
      assert(proj(InternalRow(a, b)).getLong(0) ===
        expr.eval(InternalRow(a, b)).asInstanceOf[Long])
    }
    assert(proj(InternalRow(null, 1L)).isNullAt(0))
  }

  test("writeZOrdered: schema and row multiset preserved; per-file z-ranges disjoint") {
    val l = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    Sinks.writeZOrdered(l, out, "l_orderkey", "l_partkey", partitions = 4)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq === l.columns.toSeq) // z projected away
    assert(back.count() === l.count())
    val key = concat_ws("|", col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    assert(back.select(md5(key).as("h")).agg(count(lit(1)), countDistinct("h"))
      .head.toString ===
      l.select(md5(key).as("h")).agg(count(lit(1)), countDistinct("h")).head.toString)
    // range partitioning by z => per-file z intervals must not overlap
    val ranges = back
      .withColumn("z", ZOrderExpr.zValue(col("l_orderkey"), col("l_partkey")))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect()
    ranges.sliding(2).foreach {
      case Array(p, n) =>
        assert(p.getAs[Long]("hi") <= n.getAs[Long]("lo"),
          s"overlapping z-ranges: $p vs $n")
      case _ =>
    }
  }
}
