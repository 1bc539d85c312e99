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
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // composed-tokenizer → native single-pass expression rewrite
    e.injectOptimizerRule(_ => CanonicalizeTokenizer)
    // bounded-heap per-key top-k (Filter(rn<=k, Window(row_number)) →
    // TopKPerKeyExec). Default-installed since the exec grew a size
    // guard: heap memory is capped at `spark.graft.topk.maxKeysPerTask`
    // tracked keys per pass, with overflow keys spilled to local disk
    // and resolved in follow-up passes — unbounded key cardinality now
    // degrades to extra spill passes instead of an OOM.
    e.injectOptimizerRule(_ => TopKPerKeyRule)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
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
        exprs.head, intLit(exprs(1), "bits"))),
    // custom GENERATOR (true UDTF surface): streams (pos, gram) rows
    // per input row with no intermediate array materialization
    ("ngrams_tf",
      new ExpressionInfo(classOf[NGramsGeneratorExpr].getName, "ngrams_tf"),
      (exprs: Seq[Expression]) => NGramsGeneratorExpr(
        exprs.head, intLit(exprs(1), "n"))),
    // Spark's own runtime-filter machinery (InjectRuntimeFilter builds
    // these internally but does not expose them in the function
    // registry): a user-declared bloom semi-join prefilter — aggregate
    // the build side's keys into a bloom sketch, probe it as a scalar
    // subquery on the big side. False positives are removed by the
    // exact join that follows; false negatives are impossible.
    ("bloom_filter_agg",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, items) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, items)
        case Seq(c, items, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, items, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(child[, estimatedNumItems[, numBits]])")
      }),
    ("might_contain",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bloom, value) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bloom, value)
        case _ => throw new IllegalArgumentException(
          "might_contain(bloomFilter, value)")
      }),
    // the native vector family (ANN scoring loops + JL/LSH projections)
    ("dot_d",
      new ExpressionInfo(classOf[VectorExprs.DotProductDExpr].getName, "dot_d"),
      (exprs: Seq[Expression]) => VectorExprs.DotProductDExpr(exprs.head, exprs(1))),
    ("dot_i8",
      new ExpressionInfo(classOf[VectorExprs.Int8DotExpr].getName, "dot_i8"),
      (exprs: Seq[Expression]) => VectorExprs.Int8DotExpr(exprs.head, exprs(1))),
    ("hyperplane_bucket",
      new ExpressionInfo(classOf[VectorExprs.HyperplaneBucketExpr].getName, "hyperplane_bucket"),
      (exprs: Seq[Expression]) => VectorExprs.HyperplaneBucketExpr(
        exprs.head, intLit(exprs(1), "planes"))),
    ("jl_project",
      new ExpressionInfo(classOf[VectorExprs.JlProjectExpr].getName, "jl_project"),
      (exprs: Seq[Expression]) => VectorExprs.JlProjectExpr(
        exprs.head, intLit(exprs(1), "out_dim"))))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => builder(exprs), "scala_udf")
    }
}
