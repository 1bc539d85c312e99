package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (the real "UDTF" surface — a table
  * function producing zero-or-many rows per input row, the same
  * contract `explode`/`posexplode` implement): tokenize the text with
  * the canonical single-pass normalizer and emit one row per word
  * n-gram as (pos INT 1-based, gram STRING). Registered on the SQL
  * surface as `ngrams_tf(text, n)` so `SELECT ngrams_tf(text, 3) FROM
  * docs` / LATERAL VIEW both work — the generator contract means NO
  * intermediate array is materialized per row (explode over a
  * composed shingle array builds the whole array first; the generator
  * streams grams row-by-row, which at 100 TB is the difference
  * between a page-sized allocation per document and none). */
case class NGramsGeneratorExpr(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"ngrams_tf needs n >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngrams_tf requires a STRING input, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty // null text → zero rows, like explode(null)
    val words: ArrayData = TextNormExprs.normalizeWordsEval(t.asInstanceOf[UTF8String])
    val m = words.numElements() - n + 1
    if (m <= 0) return Iterator.empty
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < m
      override def next(): InternalRow = {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words.getUTF8String(i + j).toString)
          j += 1
        }
        i += 1
        InternalRow(i, UTF8String.fromString(sb.toString)) // i already incremented → 1-based pos
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "ngrams_tf"
}
