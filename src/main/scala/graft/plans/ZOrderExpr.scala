package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve value — the multi-dimensional layout key.
  *
  * Sorting a table by ONE column gives perfect min/max row-group
  * pruning on that column and none on any other; interleaving the bits
  * of two key columns gives useful pruning on BOTH (each row group
  * covers a small z-curve segment, whose projection onto either axis
  * is a bounded range). The standard lakehouse data-skipping layout
  * for "filter by either a or b" workloads — [[graft.sources.Sinks
  * .writeZOrdered]] pairs this with a range repartition + in-partition
  * sort, and BENCH_ZORDER_r09 measures the skipping.
  *
  * Semantics: `z = interleave(lo31(a), lo31(b))` with `a` on even and
  * `b` on odd bit positions; inputs are taken MODULO 2³¹ (documented —
  * the z-value exists only to order rows for layout, so modular
  * wrap-around merely weakens pruning for out-of-range keys, never
  * correctness; callers with larger/negative domains pre-map, e.g.
  * rank or bucket). Result < 2⁶², always non-negative. Bit spreading
  * is the classic magic-mask sequence (public Morton-code idiom), five
  * shift/mask ops per operand — codegen-friendly, no loop. */
object ZOrderExpr {

  /** Spread the low 31 bits of x to even bit positions (0, 2, 4, …). */
  def spreadBits(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Kernel, static-forwarder-reachable from generated Java. */
  def zValue(a: Long, b: Long): Long = spreadBits(a) | (spreadBits(b) << 1)

  case class ZValueExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"z_value requires (BIGINT, BIGINT) inputs, got $other")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      zValue(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.ZOrderExpr.zValue($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "z_value"
  }

  def zValue(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(ZValueExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
