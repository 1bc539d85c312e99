package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization (PQ) expressions — the embedding-compression
  * lever for ANN at 100 TB (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). A D-dim FLOAT vector is split
  * into `m` subvectors; each subvector is replaced by the index of its
  * nearest centroid in a per-subspace codebook of `k` entries, so the
  * stored vector shrinks from 4·D bytes to `m` bytes (+ one float for
  * the true norm). Search then never touches floats on the corpus side:
  * a query precomputes a lookup table LUT[m][j] = dot(q_m, c_mj) once,
  * and the approximate dot product of the query with ANY encoded vector
  * is Σ_m LUT[m][code_m] — `m` array reads and adds per candidate
  * (asymmetric distance computation, ADC).
  *
  * Both expressions are single tight loops per row (same rationale as
  * [[VectorExprs]]): on the scoring path the ADC sum runs once per
  * (query, candidate) pair — at corpus scale that loop IS the workload.
  * The codebook rides the expression as a constant (a few KB — m·k·D/m
  * doubles), serialized once per task, never per row.
  */
object PQExprs {

  /** Encode a vector as `m` codebook indices (ARRAY<TINYINT>). Code j of
    * subspace s is the argmin over the codebook of squared L2 distance
    * to the subvector, ties to the LOWEST index (deterministic). NULL
    * input, a null element, or a length not equal to m·subDim yields
    * NULL (an encode that silently truncated would corrupt every
    * downstream score).
    *
    * `codebooks(s)(j)` is centroid j of subspace s; all subspaces must
    * share one width (subDim) and at most 128 centroids (codes are
    * signed bytes; 256-entry books would need an unsigned reinterpret
    * the whole pipeline — and the oracle — would have to agree on). */
  case class PQEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    private val m = codebooks.length
    private val subDim = codebooks.head.head.length
    require(m >= 1 && codebooks.forall(_.nonEmpty) &&
      codebooks.forall(_.forall(_.length == subDim)),
      "codebooks must be non-empty with one common subvector width")
    require(codebooks.forall(_.length <= 128),
      s"at most 128 centroids per subspace (byte codes), got ${codebooks.map(_.length).max}")

    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"pq_encode requires an ARRAY<FLOAT> or ARRAY<DOUBLE> input, got ${other.simpleString}")
      }

    @transient private lazy val childFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n != m * subDim) return null
      var i = 0
      while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
      val codes = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val book = codebooks(s)
        val base = s * subDim
        var best = Double.PositiveInfinity
        var bestJ = 0
        var j = 0
        while (j < book.length) {
          val c = book(j)
          var d2 = 0.0
          var t = 0
          while (t < subDim) {
            val x = if (childFloat) arr.getFloat(base + t).toDouble else arr.getDouble(base + t)
            val diff = x - c(t)
            d2 += diff * diff
            t += 1
          }
          // strict < keeps the lowest index on ties
          if (d2 < best) { best = d2; bestJ = j }
          j += 1
        }
        codes(s) = bestJ.toByte
        s += 1
      }
      new GenericArrayData(codes)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "pq_encode"
  }

  /** ADC score: Σ_s lut(s)(codes(s)) — the approximate dot product of
    * the (full-precision) query against an encoded vector, given the
    * query's per-subspace lookup table. NULL if either input is NULL,
    * lengths differ, a LUT row is null/short, or a code is out of
    * range; never silently skips a subspace. */
  case class PQAdcDotExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val codesOk = left.dataType match {
        case ArrayType(ByteType | ShortType | IntegerType, _) => true
        case _ => false
      }
      val lutOk = right.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _ => false
      }
      if (codesOk && lutOk)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot requires (ARRAY<TINYINT|SMALLINT|INT> codes, ARRAY<ARRAY<DOUBLE>> lut), " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

    @transient private lazy val codeGetter: (ArrayData, Int) => Int = left.dataType match {
      case ArrayType(ByteType, _) => (a, i) => a.getByte(i).toInt
      case ArrayType(ShortType, _) => (a, i) => a.getShort(i).toInt
      case _ => (a, i) => a.getInt(i)
    }

    override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
      val codes = codesAny.asInstanceOf[ArrayData]
      val lut = lutAny.asInstanceOf[ArrayData]
      val m = codes.numElements()
      if (lut.numElements() != m) return null
      var s = 0.0
      var i = 0
      while (i < m) {
        if (codes.isNullAt(i) || lut.isNullAt(i)) return null
        val row = lut.getArray(i)
        val code = codeGetter(codes, i)
        if (code < 0 || code >= row.numElements() || row.isNullAt(code)) return null
        s += row.getDouble(code)
        i += 1
      }
      s
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "pq_adc_dot"
  }

  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.toColumn(PQEncodeExpr(GraftColumnBridge.toExpression(vec), codebooks))

  def pqAdcDot(codes: Column, lut: Column): Column =
    GraftColumnBridge.toColumn(PQAdcDotExpr(
      GraftColumnBridge.toExpression(codes), GraftColumnBridge.toExpression(lut)))
}
