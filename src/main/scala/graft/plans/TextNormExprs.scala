package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass reference-semantics tokenizer.
  *
  * Replaces the composed pipeline
  * `filter(transform(split(text, "\\s+"), t => regexp_replace(lower(t),
  * "[^a-z]", "")), _ =!= "")` — which runs a regex compile/match per
  * token per row — with one byte-level scan per document. The composed
  * form is the direct mapping of the reference normalization
  * (`/root/reference/src/main.cc:33-42,75`: `tolower` then strip
  * `[^a-z]`, whitespace-delimited tokens); this expression produces
  * byte-identical output (asserted by NormalizerPropertySpec) and is the
  * hot path of every text query (tokenize → sketch/score/count), so at
  * 100 TB it is the difference between a regex-bound scan and an
  * I/O-bound one.
  *
  * Equivalence notes:
  *  - lowercasing uses `UTF8String.toLowerCase` — the same call Spark's
  *    `lower()` makes under the default collation — applied to the whole
  *    document; Unicode lowercasing never produces an ASCII whitespace
  *    byte, so lowering before splitting cannot change token boundaries.
  *  - Java regex `\s` is exactly {0x20, 0x09–0x0D}; those bytes split
  *    tokens. Every other non-[a-z] byte (digits, punctuation, any
  *    UTF-8 lead/continuation byte ≥ 0x80) is dropped *without* ending
  *    the word — matching `regexp_replace(tok, "[^a-z]", "")`, where
  *    "don't" → "dont" and "x1y" → "xy".
  */
object TextNormExprs {

  case class NormalizedWordsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].toLowerCase.getBytes
      val out = new java.util.ArrayList[UTF8String]()
      val buf = new Array[Byte](bytes.length)
      var w = 0 // current word length in buf
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) {
          if (w > 0) { out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, w))); w = 0 }
        } else if (b >= 'a' && b <= 'z') {
          buf(w) = b; w += 1
        } // else: non-letter, non-whitespace byte — stripped, word continues
        i += 1
      }
      if (w > 0) out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, w)))
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "normalized_words"
  }

  def normalizedWords(text: Column): Column =
    GraftColumnBridge.toColumn(NormalizedWordsExpr(GraftColumnBridge.toExpression(text)))

  /** Per-language stopword-hit counts over a word array, all languages
    * in ONE pass: one hash lookup per token against a word →
    * per-language increment table, replacing an interpreted
    * `size(filter(words, isInCollection(...)))` per language (each a
    * full scan of the array with a linear literal-list compare per
    * element). Output element i = hit count for `langWords(i)`,
    * counting token multiplicity — exactly the composed form's result
    * (null elements contribute nothing there: `isInCollection(null)`
    * is null, which `filter` drops). */
  case class StopwordScoresExpr(child: Expression, langWords: Seq[Seq[String]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    @transient private lazy val nLangs = langWords.size
    @transient private lazy val table: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, Array[Int]]()
      langWords.zipWithIndex.foreach { case (ws, li) =>
        ws.foreach { w =>
          val k = UTF8String.fromString(w)
          var inc = m.get(k)
          if (inc == null) { inc = new Array[Int](nLangs); m.put(k, inc) }
          inc(li) += 1
        }
      }
      m
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val counts = new Array[Int](nLangs)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val w = arr.getUTF8String(i)
        if (w != null) {
          val inc = table.get(w)
          if (inc != null) {
            var l = 0
            while (l < nLangs) { counts(l) += inc(l); l += 1 }
          }
        }
        i += 1
      }
      new GenericArrayData(counts.map(Integer.valueOf(_): Any))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "stopword_scores"
  }

  def stopwordScores(words: Column, langWords: Seq[Seq[String]]): Column =
    GraftColumnBridge.toColumn(
      StopwordScoresExpr(GraftColumnBridge.toExpression(words), langWords))
}
