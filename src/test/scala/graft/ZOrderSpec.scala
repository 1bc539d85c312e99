package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.plans.ZOrderExpr

/** Specs for the round-9 Morton-kernel upgrade: [[Layout.zValue]] now
  * delegates to the native magic-mask expression
  * ([[graft.plans.ZOrderExpr]]) instead of the statically-unrolled
  * 2·bits-op shift/and/or fold. Asserts the kernel against a naive bit
  * loop, eager codegen compilation, and — the load-bearing one —
  * bit-identity of the new delegation with the ORIGINAL composed fold
  * across bit widths (q85's oracle replay and LayoutSpec's skipping
  * measurements gate the rest). */
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

  /** The pre-round-9 formulation, kept verbatim as the equivalence
    * baseline. */
  private def composedFold(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  test("kernel: known values, axis bits, and modular lo-31 semantics") {
    assert(ZOrderExpr.zValue(0L, 0L) === 0L)
    assert(ZOrderExpr.zValue(1L, 0L) === 1L)
    assert(ZOrderExpr.zValue(0L, 1L) === 2L)
    assert(ZOrderExpr.zValue(5L, 3L) === 27L)
    assert(ZOrderExpr.zValue((1L << 31) + 5L, 3L) === ZOrderExpr.zValue(5L, 3L))
    assert(ZOrderExpr.zValue(-1L, 0L) === ZOrderExpr.zValue((1L << 31) - 1L, 0L))
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

  test("Layout.zValue delegation is bit-identical to the original composed fold, all widths") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map(_ =>
      (rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL))
    val df = rows.toDF("a", "b")
    Seq(1, 8, 21, 31).foreach { bits =>
      val got = df.select(Layout.zValue(col("a"), col("b"), bits)).as[Long].collect()
      val want = df.select(composedFold(col("a"), col("b"), bits)).as[Long].collect()
      assert(got.toSeq === want.toSeq, s"bits=$bits")
    }
    // out-of-width keys: both formulations truncate to the low bits
    val big = Seq(((1L << 25) + 9L, (1L << 30) + 4L)).toDF("a", "b")
    assert(big.select(Layout.zValue(col("a"), col("b"), 21)).as[Long].head ===
      big.select(composedFold(col("a"), col("b"), 21)).as[Long].head)
  }
}
