package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text quality signal: `deflate(text).length /
  * text.length` over UTF-8 bytes. Highly repetitive/boilerplate text
  * compresses far below natural language (a standard LLM-curation
  * heuristic alongside the token/repetition features in
  * [[graft.operators.TextAnalysis]]); near-random glyph soup compresses
  * above it. A real DEFLATE codec (`java.util.zip.Deflater`), not a
  * proxy — like the q40 image codec, the JDK provides it without new
  * dependencies. Not SQL-expressible, so its query is rows-only gated
  * and correctness rides on the spec's constructed corpora.
  */
object CompressionExprs {

  /** Per-thread reusable Deflater + scratch buffer — Deflater is not
    * thread-safe and allocates native zlib state, so one per row would
    * dominate the expression it exists to serve. `reset()` between
    * rows reuses the native stream.
    *
    * Native lifecycle: each Slot is registered with a [[java.lang.ref.Cleaner]]
    * that calls `end()` when the owning thread dies and its ThreadLocal
    * entry is collected, so long-lived executors with churning task
    * threads don't accumulate unreleasable zlib state. (JDK 12+
    * Deflater also self-cleans on GC; the explicit registration makes
    * the release deterministic-on-unreachability rather than relying on
    * that implementation detail.) */
  private object DeflaterPool {
    private lazy val cleaner = java.lang.ref.Cleaner.create()
    // the cleanup action must not capture the Slot itself (it would
    // never become phantom-reachable); it holds only the Deflater
    private final class EndDeflater(d: Deflater) extends Runnable {
      override def run(): Unit = d.end()
    }
    final class Slot {
      val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
      val scratch = new Array[Byte](8192)
      cleaner.register(this, new EndDeflater(deflater))
    }
    private val local = new ThreadLocal[Slot] {
      override def initialValue(): Slot = new Slot
    }
    def get(): Slot = { val s = local.get(); s.deflater.reset(); s }
  }

  /** deflate-compressed size in bytes of the UTF-8 text; the compressed
    * stream itself is never materialized beyond a bounded scratch
    * buffer (the count is the signal). Null text → null; empty → 0. */
  case class DeflateSizeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_size requires STRING input, got ${child.dataType.simpleString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      if (bytes.isEmpty) return 0L
      val slot = DeflaterPool.get()
      val d = slot.deflater
      d.setInput(bytes)
      d.finish()
      var total = 0L
      while (!d.finished()) {
        total += d.deflate(slot.scratch)
      }
      total
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "deflate_size"
  }

  def deflateSize(text: Column): Column =
    GraftColumnBridge.toColumn(DeflateSizeExpr(GraftColumnBridge.toExpression(text)))
}
