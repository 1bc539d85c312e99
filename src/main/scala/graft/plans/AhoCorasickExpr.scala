package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring counting (Aho & Corasick,
  * CACM 1975) — the blocklist/taxonomy screen of a training-data
  * pipeline, as ONE narrow codegen'd expression.
  *
  * The composed alternative — one `contains`/`regexp_count` per
  * pattern — scans the document once PER PATTERN: O(|patterns| ×
  * |text|) with a plan column per term. This expression compiles the
  * pattern set into a byte-level DFA once on the driver and streams
  * each document through it exactly once: O(|text| + matches)
  * regardless of pattern count. At 100 TB with a realistic
  * 1k–100k-term blocklist that is the difference between a thousand
  * passes over the corpus and one — the same single-pass argument as
  * [[TextNormExprs]], but for MATCHING rather than tokenizing.
  *
  * Semantics: byte-exact, case-sensitive matching over the UTF-8
  * encoding; output element j = the number of occurrences of
  * `patterns(j)`, counting EVERY end position (overlapping
  * occurrences included — "a a a" contains "a a" twice). ASCII
  * patterns can never false-match inside a multi-byte UTF-8 sequence
  * (continuation bytes have the high bit set), so character-positional
  * oracles agree on counts for ASCII pattern lists.
  *
  * Scale/memory contract: the DFA is dense — `states × 256` ints,
  * where states ≤ total pattern bytes + 1. A 100k-term × 20-byte
  * blocklist is ~2M states ≈ 2 GB dense, which is too big; the dense
  * layout is chosen for pattern sets up to ~100k total BYTES (≈100 MB
  * of table, serialized once into the plan and shipped via the task
  * broadcast like any literal). Beyond that, swap the inner table for
  * the banded/sparse transition encoding — the automaton API is the
  * stable surface. `require`d below so the limit fails loudly, not as
  * an executor OOM.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "aho_corasick: empty pattern list")
  require(patterns.forall(_.nonEmpty), "aho_corasick: empty pattern")
  require(patterns.distinct.size == patterns.size,
    s"aho_corasick: duplicate patterns in ${patterns.mkString(",")}")

  private val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private val totalBytes = patBytes.map(_.length).sum
  require(totalBytes <= 100_000,
    s"aho_corasick: dense DFA layout supports <=100000 pattern bytes, got $totalBytes")

  val nPatterns: Int = patterns.size

  /** `next(state*256 + byte)` — goto with fail links pre-resolved (the
    * DFA form), so the match loop is one array read per input byte —
    * and the pattern ids emitted at each state (fail-closure
    * flattened). */
  private val (next: Array[Int], outIds: Array[Array[Int]]) = {
    val maxStates = totalBytes + 1
    val children = Array.fill(maxStates * 256)(-1)
    val ownOut = Array.fill(maxStates)(List.empty[Int])
    var nStates = 1
    var p = 0
    while (p < patBytes.length) {
      val bs = patBytes(p)
      var s = 0
      var i = 0
      while (i < bs.length) {
        val b = bs(i) & 0xff
        if (children(s * 256 + b) < 0) {
          children(s * 256 + b) = nStates; nStates += 1
        }
        s = children(s * 256 + b)
        i += 1
      }
      ownOut(s) = p :: ownOut(s)
      p += 1
    }
    // BFS: resolve fail links into the dense DFA and close outputs
    val fail = new Array[Int](nStates)
    val dfa = new Array[Int](nStates * 256)
    val queue = new java.util.ArrayDeque[Integer]()
    var b = 0
    while (b < 256) {
      val c = children(b)
      if (c >= 0) { fail(c) = 0; dfa(b) = c; queue.add(c) }
      else dfa(b) = 0
      b += 1
    }
    while (!queue.isEmpty) {
      val s: Int = queue.poll()
      ownOut(s) = ownOut(s) ::: ownOut(fail(s)) // closure via BFS order
      b = 0
      while (b < 256) {
        val c = children(s * 256 + b)
        if (c >= 0) {
          fail(c) = dfa(fail(s) * 256 + b)
          dfa(s * 256 + b) = c
          queue.add(c)
        } else {
          dfa(s * 256 + b) = dfa(fail(s) * 256 + b)
        }
        b += 1
      }
    }
    (dfa, ownOut.take(nStates).map(_.sortBy(identity).toArray))
  }

  /** One pass over the document; returns per-pattern occurrence counts
    * as ARRAY<BIGINT>. Called from BOTH the interpreted eval and the
    * generated code (referenced via addReferenceObj — the same
    * compiled-automaton-in-the-plan idiom as Spark's own RegExp
    * expressions' Pattern reference). */
  def countMatches(input: UTF8String): ArrayData = {
    val counts = new Array[Long](nPatterns)
    val bytes = input.getBytes
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = next(s * 256 + (bytes(i) & 0xff))
      val out = outIds(s)
      if (out.length > 0) {
        var k = 0
        while (k < out.length) { counts(out(k)) += 1L; k += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Native single-pass char-entropy statistics — the kernel behind
  * [[graft.operators.TextAnalysis.charEntropy]]. The composed form
  * (split("") → array_distinct → a filter-count per distinct char) is
  * an interpreted O(distinct × len) lambda per row — measured 17.8 s
  * over 500 k docs; this kernel is one code-point walk + a bounded
  * count map per row (≤ `prefix` entries), emitting the exact
  * integer triple the entropy arithmetic needs:
  * (len_used, n_distinct, hnum = L·T[L] − Σ cnt·T[cnt]) over the
  * shared 1e9-scaled log2 table. Code points are iterated over UTF-8
  * lead bytes — the oracle's (DuckDB) character semantics; identical
  * to the previous split("")-based path on all non-astral text (the
  * fixture is ASCII; astral chars would split into surrogate halves
  * there, a divergence the kernel FIXES rather than preserves). */
object CharEntropyExpr {

  /** log2(k)·1e9 for k = 1..512 (same formula as the oracle literal —
    * equality spec-asserted against TextAnalysis.log2UnitsTable). */
  val log2Units: Array[Long] =
    (1 to 512).map(k => math.round(math.log(k) / math.log(2) * 1e9)).toArray

  /** Kernel, static-forwarder-reachable from generated Java. Returns
    * struct(len_used, n_distinct, hnum), all BIGINT. */
  def charEntropyEval(input: UTF8String, prefix: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = input.getBytes
    val counts = new java.util.HashMap[Integer, Integer](64)
    var l = 0L
    var i = 0
    while (i < bytes.length && l < prefix) {
      val b = bytes(i) & 0xff
      // code point = lead byte + continuation bytes (UTF-8 is
      // self-synchronizing: continuation bytes are 0b10xxxxxx)
      val width =
        if (b < 0x80) 1
        else if (b < 0xe0) 2
        else if (b < 0xf0) 3
        else 4
      var cp = 0
      var k = 0
      while (k < width && i + k < bytes.length) {
        cp = (cp << 8) | (bytes(i + k) & 0xff)
        k += 1
      }
      val c = counts.get(cp)
      counts.put(cp, if (c == null) 1 else c + 1)
      l += 1L
      i += width
    }
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c: Int = it.next()
      sum += c.toLong * log2Units(c - 1)
    }
    val hnum = if (l > 0) l * log2Units(l.toInt - 1) - sum else 0L
    org.apache.spark.sql.catalyst.InternalRow(l, counts.size.toLong, hnum)
  }

  case class CharEntropyStatsExpr(child: Expression, prefix: Int)
      extends UnaryExpression {
    require(prefix >= 1 && prefix <= log2Units.length,
      s"char_entropy_stats: prefix must be in [1, ${log2Units.length}], got $prefix")

    override def dataType: DataType = StructType(Seq(
      StructField("len_used", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("hnum", LongType, nullable = false)))

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"char_entropy_stats requires a STRING input, got ${other.simpleString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      CharEntropyExpr.charEntropyEval(input.asInstanceOf[UTF8String], prefix)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.CharEntropyExpr.charEntropyEval($c, $prefix);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "char_entropy_stats"
  }

  def charEntropyStats(text: Column, prefix: Int): Column =
    GraftColumnBridge.toColumn(
      CharEntropyStatsExpr(GraftColumnBridge.toExpression(text), prefix))
}

object AhoCorasickExpr {

  /** `multi_pattern_counts(text)` — ARRAY<BIGINT> of per-pattern
    * occurrence counts (overlapping, byte-exact). Null text → null. */
  case class MultiPatternCountsExpr(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    @transient private lazy val ac = new AhoCorasick(patterns)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"multi_pattern_counts requires a STRING input, got ${other.simpleString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      ac.countMatches(input.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val acRef = ctx.addReferenceObj("graftAhoCorasick", ac,
        classOf[AhoCorasick].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.countMatches($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "multi_pattern_counts"
  }

  def multiPatternCounts(text: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.toColumn(
      MultiPatternCountsExpr(GraftColumnBridge.toExpression(text), patterns))
}
