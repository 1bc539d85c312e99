package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ARRAY<FLOAT>` embedding columns, built
  * on Spark's higher-order functions (`zip_with` / `aggregate` /
  * `transform`) so everything is codegen-eligible and fully distributed —
  * no UDF, no driver-side math.
  *
  * Precision contract: elements are widened FLOAT→DOUBLE before any
  * multiply, and accumulation is sequential in array order. The DuckDB
  * oracle does the identical widening + in-order `list_sum`, so dot
  * products agree bit-for-bit across engines (f32 values are exactly
  * representable in f64).
  */
object VectorFunctions {

  /** Sequential in-order sum of a DOUBLE array. */
  private def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) with DOUBLE accumulation — native single-loop expression
    * (see [[graft.plans.VectorExprs.DotProductDExpr]]); bit-identical to
    * [[dotReference]], which VectorMathSpec asserts. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExprs.dotD(a, b)

  /** The composed higher-order-function formulation of [[dot]] — kept as
    * the executable spec of the accumulation order/widening contract. */
  def dotReference(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm with DOUBLE accumulation. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe only insofar as parquet
    * vectors are non-null (guaranteed by the fixtures). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket for a vector: `planes` pseudo-random
    * ±1 hyperplanes derived from a portable md5-based sign (see
    * [[TextFunctions.hashSign]]), emitted as a bit-string like "01101…".
    * Vectors with equal bit-strings land in the same bucket; at 100 TB
    * this turns the O(n²) all-pairs similarity into an equi-join on the
    * bucket key (hash-partitionable, AQE-skew-handled).
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column =
    graft.plans.VectorExprs.hyperplaneBucket(vec, planes)

  /** The composed formulation of [[hyperplaneBucket]] — recomputes the
    * per-(plane, index) md5 sign for every row, so it is only used as
    * the executable spec the native expression is asserted against. */
  def hyperplaneBucketReference(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // sign_p(v) = sum_i v[i] * r(p, i) with r(p,i) = ±1 from md5(p,i)
      val proj = arraySum(zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") *
          TextFunctions.hashSign(concat(lit(s"plane$p,"), i)).cast("double")))
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Johnson–Lindenstrauss ±1 random projection to `outDim` dims —
    * native single-pass expression sharing the hyperplane sign matrix
    * (see [[graft.plans.VectorExprs.JlProjectExpr]]): a 64→16
    * projection cuts every downstream distance scan 4× while JL keeps
    * pairwise geometry within the distortion the q136 gate measures.
    * The 1/√outDim scale preserves expected norms and cancels in any
    * cosine. */
  def jlProject(vec: Column, outDim: Int): Column =
    graft.plans.VectorExprs.jlProject(vec, outDim)

  /** The composed formulation of [[jlProject]] — per-row md5 signs, so
    * it is only the executable spec the native expression is asserted
    * against (on null-free vectors; the native form nulls the whole
    * output on a null element where this form nulls one coordinate). */
  def jlProjectReference(vec: Column, outDim: Int): Column =
    transform(sequence(lit(0), lit(outDim - 1)), p =>
      arraySum(zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") *
          TextFunctions.hashSign(concat(lit("plane"), p, lit(","), i)).cast("double")))
        / sqrt(lit(outDim.toDouble)))
}
