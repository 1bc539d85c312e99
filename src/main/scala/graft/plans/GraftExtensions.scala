package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` (or
  *    `SparkSession.builder().withExtensions(new GraftExtensions)`) —
  *    session-wide injection, survives `newSession()`;
  *  - [[GraftFunctions.register]] — temp-function registration on an
  *    already-built session.
  *
  * SQL:
  *   rolling_fingerprint(str, gram_len, bottom_k) → array<string>
  *   minhash_signature(array<string>, k)          → array<string>
  *   simhash(array<string>, bits)                 → string
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_fingerprint",
      new ExpressionInfo(classOf[RollingFingerprintExpr].getName, "rolling_fingerprint"),
      (exprs: Seq[Expression]) => RollingFingerprintExpr(
        exprs.head, intLit(exprs(1), "gram_len"), intLit(exprs(2), "bottom_k"))),
    ("minhash_signature",
      new ExpressionInfo(classOf[TextSketchExprs.MinHashSignatureExpr].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => TextSketchExprs.MinHashSignatureExpr(
        exprs.head, intLit(exprs(1), "k"))),
    ("simhash",
      new ExpressionInfo(classOf[TextSketchExprs.SimHashExpr].getName, "simhash"),
      (exprs: Seq[Expression]) => TextSketchExprs.SimHashExpr(
        exprs.head, intLit(exprs(1), "bits"))))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => builder(exprs), "scala_udf")
    }
}
