package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` embedding
  * columns. Each expression replaces an interpreted higher-order-function
  * chain (`aggregate(zip_with(...))`) — which allocates an intermediate
  * array and boxes every element through the lambda — with one tight
  * primitive loop per row. The accumulation order and FLOAT→DOUBLE
  * widening are identical to the HOF formulation (in array order, each
  * element widened before the multiply), so results are bit-identical
  * and the DuckDB oracles are unchanged (VectorMathSpec asserts exact
  * equality against the HOF forms).
  *
  * On the ANN paths (brute-force / LSH / IVF top-k) the dot product is
  * evaluated once per candidate pair — at 100 TB this loop IS the
  * workload, which is why it must not box.
  */
object VectorExprs {

  private def elemIsFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** dot(a, b) with in-order DOUBLE accumulation. Null if either array
    * is null, if lengths differ, or any touched element is null —
    * exactly the HOF chain's semantics (zip_with pads the shorter array
    * with nulls; null poisons the running sum). */
  case class DotProductDExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    // reject anything but ARRAY<FLOAT>/ARRAY<DOUBLE> at analysis time:
    // getDouble on (say) an int-backed UnsafeArrayData would silently
    // reinterpret raw bytes as doubles
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_d requires ARRAY<FLOAT> or ARRAY<DOUBLE> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

    // deferred: child dataType is only queryable once resolved
    @transient private lazy val leftFloat = elemIsFloat(left.dataType)
    @transient private lazy val rightFloat = elemIsFloat(right.dataType)

    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotDEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftFloat, rightFloat)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      // the inner loop of every ANN scoring scan — a static call from
      // generated Java keeps the scan inside whole-stage codegen; the
      // kernel's EXTRA null source (length mismatch / null element)
      // means the standard propagate-null wrapper can't be used
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val l = left.genCode(ctx)
      val r = right.genCode(ctx)
      val tmp = ctx.freshName("dotRes")
      ev.copy(code = code"""
        ${l.code}
        ${r.code}
        java.lang.Double $tmp = (${l.isNull} || ${r.isNull}) ? null :
          graft.plans.VectorExprs.dotDEval(${l.value}, ${r.value}, $leftFloat, $rightFloat);
        boolean ${ev.isNull} = ($tmp == null);
        double ${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();""")
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "dot_d"
  }

  /** Dot kernel, static-forwarder-reachable from generated Java; null
    * on length mismatch or null element (the expression's contract). */
  def dotDEval(a: ArrayData, b: ArrayData,
      leftFloat: Boolean, rightFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Random-hyperplane LSH bucket bit-string ("0"/"1" × planes): bit p
    * is the sign of Σᵢ v[i]·r(p,i) with r(p,i) = ±1 from the first
    * byte of md5("plane<p>,<i>") — the identical pseudo-random signs the
    * composed [[graft.functions.TextFunctions.hashSign]] form and the
    * DuckDB oracle derive. The HOF form recomputes those md5s for every
    * ROW; the sign matrix only depends on (plane, index), so here it is
    * computed once per (dimension) and cached for the task's lifetime.
    * A NULL vector, null element or empty vector yields an all-'0'
    * bucket (in the composed form the null projection falls through
    * `when(proj >= 0, ...)` to the otherwise branch — including for a
    * NULL input array), matching the composed form exactly. */
  case class HyperplaneBucketExpr(child: Expression, planes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false

    // same guard as DotProductDExpr: getFloat/getDouble on an array
    // backed by another element type silently reinterprets raw bytes
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"hyperplane_bucket requires an ARRAY<FLOAT> or ARRAY<DOUBLE> input, got ${other.simpleString}")
      }

    // the composed form emits "00…0" for a NULL vector (when(null>=0)
    // → otherwise '0' per plane), so null input must NOT short-circuit
    // to null — bypass UnaryExpression's null handling
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) {
        val sb = new java.lang.StringBuilder(planes)
        var p = 0
        while (p < planes) { sb.append('0'); p += 1 }
        UTF8String.fromString(sb.toString)
      } else nullSafeEval(v)
    }

    // deferred: child dataType is only queryable once resolved
    @transient private lazy val childFloat = elemIsFloat(child.dataType)

    private def signs(dim: Int): Array[Array[Double]] =
      HyperplaneBucketExpr.signs(planes, dim)

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sb = new java.lang.StringBuilder(planes)
      var hasNullElem = n == 0
      var i = 0
      while (!hasNullElem && i < n) { hasNullElem = arr.isNullAt(i); i += 1 }
      if (hasNullElem) {
        var p = 0
        while (p < planes) { sb.append('0'); p += 1 }
      } else {
        val r = signs(n)
        var p = 0
        while (p < planes) {
          var s = 0.0
          var j = 0
          while (j < n) {
            val x = if (childFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
            s += x * r(p)(j)
            j += 1
          }
          // Spark SQL ordering treats NaN as greater than any double, so
          // when(proj >= 0, ...) is TRUE for NaN — mirror that (plain
          // Java `>=` is false for NaN)
          sb.append(if (s >= 0 || java.lang.Double.isNaN(s)) '1' else '0')
          p += 1
        }
      }
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "hyperplane_bucket"
  }

  object HyperplaneBucketExpr {
    // process-wide sign-matrix cache keyed by (planes, dim): expression
    // instances deserialize once per TASK, so an instance-owned cache
    // would recompute the planes×dim md5 matrix for every task (same
    // rationale as TextSketchExprs.TokenMemos). Entry count is capped —
    // dim comes from per-ROW array lengths, so a ragged adversarial
    // column must not pin unbounded matrices; beyond the cap we compute
    // without caching (correct, just uncached).
    private val MaxEntries = 64
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
    private def compute(p0: Int, d0: Int): Array[Array[Double]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(p0) { p =>
        Array.tabulate(d0) { i =>
          md.reset()
          val d = md.digest(s"plane$p,$i".getBytes("UTF-8"))
          if (d(0) >= 0) 1.0 else -1.0 // first hex nibble <= '7'
        }
      }
    }
    private[plans] def signs(planes: Int, dim: Int): Array[Array[Double]] = {
      val got = cache.get((planes, dim))
      if (got != null) got
      else if (cache.size >= MaxEntries) compute(planes, dim)
      else cache.computeIfAbsent((planes, dim), { case (p0, d0) => compute(p0, d0) })
    }
  }

  /** Integer dot product over two `ARRAY<TINYINT>` code columns — the
    * scoring loop of int8 scalar-quantized embedding search
    * ([[graft.operators.Int8Quant]]). LONG accumulation (a 64-dim int8
    * dot is bounded by 64·127² ≈ 1.03e6, but the expression must not
    * silently wrap for wider vectors). Null/length semantics identical
    * to [[DotProductDExpr]]. */
  case class Int8DotExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(ByteType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_i8 requires ARRAY<TINYINT> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotI8Eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      // same static-call shape as [[DotProductDExpr.doGenCode]] — the
      // int8 scoring loop of q90/q95 stays inside whole-stage codegen
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val l = left.genCode(ctx)
      val r = right.genCode(ctx)
      val tmp = ctx.freshName("dotI8Res")
      ev.copy(code = code"""
        ${l.code}
        ${r.code}
        java.lang.Long $tmp = (${l.isNull} || ${r.isNull}) ? null :
          graft.plans.VectorExprs.dotI8Eval(${l.value}, ${r.value});
        boolean ${ev.isNull} = ($tmp == null);
        long ${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();""")
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "dot_i8"
  }

  /** Int8 dot kernel, static-forwarder-reachable from generated Java. */
  def dotI8Eval(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * out[p] = Σᵢ v[i]·r(p,i) / √outDim with the SAME ±1 sign matrix as
    * [[HyperplaneBucketExpr]] (r(p,i) from md5("plane<p>,<i>")) — the
    * JL projection IS the pre-threshold hyperplane projection, so the
    * LSH buckets of a vector are exactly the signs of its JL
    * coordinates (one shared deterministic matrix, one oracle replay).
    * Per-coordinate accumulation is in element order (engine-exact);
    * the 1/√outDim scale preserves expected norms (and cancels in any
    * cosine). Null vector or null element → null output array. */
  case class JlProjectExpr(child: Expression, outDim: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"jl_project requires an ARRAY<FLOAT> or ARRAY<DOUBLE> input, got ${other.simpleString}")
      }

    @transient private lazy val childFloat = elemIsFloat(child.dataType)

    override protected def nullSafeEval(input: Any): Any =
      jlEval(input.asInstanceOf[ArrayData], outDim, childFloat)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      // static-call pattern (DotProductDExpr): the projection stays
      // inside whole-stage codegen; extra null source = null element
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val tmp = ctx.freshName("jlRes")
      ev.copy(code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $tmp = ${c.isNull} ? null :
          graft.plans.VectorExprs.jlEval(${c.value}, $outDim, $childFloat);
        boolean ${ev.isNull} = ($tmp == null);
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $tmp;""")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "jl_project"
  }

  /** JL kernel, static-forwarder-reachable from generated Java; null on
    * a null element (the expression's contract). */
  def jlEval(arr: ArrayData, outDim: Int, childFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val r = HyperplaneBucketExpr.signs(outDim, n)
    val scale = math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var p = 0
    while (p < outDim) {
      var s = 0.0
      var j = 0
      while (j < n) {
        val x = if (childFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        s += x * r(p)(j)
        j += 1
      }
      out(p) = s / scale
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** argmin_j ‖vec − centers(j)‖² as ONE tight primitive loop per row —
    * the IVF coarse-assignment map. The composed form (aggregate over a
    * literal array of centroid structs, nested zip_with per centroid)
    * boxes every element through two lambda layers per centroid; at
    * corpus scale the assignment pass IS the index build, so it must
    * not. Ties go to the LOWEST center index, matching
    * [[graft.operators.LocalKMeans.fit]]'s assignment rule (spec-
    * asserted equal to the HOF formulation). Null vector or null
    * element → null; a center of mismatched width is skipped exactly
    * like the HOF's null-poisoned distance. */
  case class NearestCentroidExpr(child: Expression, centers: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"nearest_centroid requires an ARRAY<FLOAT> or ARRAY<DOUBLE> input, got ${other.simpleString}")
      }

    @transient private lazy val childFloat = elemIsFloat(child.dataType)

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val v = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        v(i) = if (childFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      var best = -1
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < centers.length) {
        val c = centers(j)
        if (c.length == n) {
          var dd = 0.0
          var t = 0
          while (t < n) { val x = v(t) - c(t); dd += x * x; t += 1 }
          if (dd < bestD) { bestD = dd; best = j }
        }
        j += 1
      }
      if (best < 0) null else best
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "nearest_centroid"
  }

  def nearestCentroid(vec: Column, centers: Array[Array[Double]]): Column =
    GraftColumnBridge.toColumn(NearestCentroidExpr(
      GraftColumnBridge.toExpression(vec), centers))

  def dotD(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(DotProductDExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))

  def dotI8(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(Int8DotExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))

  def hyperplaneBucket(vec: Column, planes: Int): Column =
    GraftColumnBridge.toColumn(HyperplaneBucketExpr(GraftColumnBridge.toExpression(vec), planes))

  def jlProject(vec: Column, outDim: Int): Column =
    GraftColumnBridge.toColumn(JlProjectExpr(GraftColumnBridge.toExpression(vec), outDim))
}
