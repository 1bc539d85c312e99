package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VocabTokenizer}
import graft.plans.TextNormExprs
import graft.sources.Tables

/** Loadable-vocab greedy tokenizer: the native expression against the
  * naive reference segmentation, edge semantics, and the committed
  * fixture's sanity. (ASCII inputs throughout — the byte-wise native
  * match and the char-wise reference agree exactly on ASCII, which is
  * the domain of normalized words.) */
class VocabTokenizerSpec extends SparkSuite {

  private val vocab = VocabTokenizer.default

  test("committed fixture loads: singles present, pieces sorted, lowercase [a-z]") {
    assert(vocab.nonEmpty)
    assert(('a' to 'z').forall(c => vocab.contains(c.toString)),
      "single letters must be present (guaranteed progress on [a-z] words)")
    assert(vocab.forall(_.forall(c => c >= 'a' && c <= 'z')))
    assert(vocab == vocab.sorted && vocab.distinct == vocab)
  }

  test("native count == reference greedy segmentation, corpus words + adversarial strings") {
    import spark.implicits._
    val corpusWords = Tables(spark, sfDir, "documents")
      .select(explode(TextFunctions.normalizedWords(col("text"))).as("w"))
      .distinct().as[String].collect().toSeq
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdehz" // letters in and out of multi-char pieces
    val fuzz = Seq.fill(500)(
      (0 until (1 + rnd.nextInt(14))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    // glue vocab pieces together so longest-match vs first-match differ
    val glued = Seq.fill(200) {
      (0 until (1 + rnd.nextInt(4))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString
    }
    val words = (corpusWords ++ fuzz ++ glued).distinct
    val expected = words.map(w => VocabTokenizer.countWordReference(w, vocab))
    val got = words.map(w => Seq(w)).toDF("ws")
      .select(VocabTokenizer.tokenCount(col("ws")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == expected,
      words.zip(got).zip(expected).collectFirst {
        case ((w, g), e) if g != e => s"word '$w': native $g != reference $e"
      }.getOrElse(""))
  }

  test("array semantics: sum over words; empty -> 0; null element/array -> null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("the", "data"))),
      (2L, Some(Seq.empty[String])),
      (3L, None)).toDF("id", "ws")
      .select(col("id"), VocabTokenizer.tokenCount(col("ws")).as("n"))
    val byId = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(byId(1L) ===
      VocabTokenizer.countWordReference("the", vocab) +
        VocabTokenizer.countWordReference("data", vocab))
    assert(byId(2L) === 0)
    assert(byId(3L) === null)
  }

  test("token ids: native == reference ids segmentation, and ids sum to counts") {
    import spark.implicits._
    val corpusWords = Tables(spark, sfDir, "documents")
      .select(explode(TextFunctions.normalizedWords(col("text"))).as("w"))
      .distinct().as[String].collect().toSeq
    val rnd = new scala.util.Random(7)
    val glued = Seq.fill(150) {
      (0 until (1 + rnd.nextInt(4))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString
    }
    val words = (corpusWords ++ glued).distinct
    val got = words.map(w => Seq(w)).toDF("ws")
      .select(VocabTokenizer.tokenIds(col("ws")).as("ids"))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    val expected = words.map(w => VocabTokenizer.idsWordReference(w, vocab))
    assert(got == expected,
      words.zip(got).zip(expected).collectFirst {
        case ((w, g), e) if g != e => s"word '$w': native $g != reference $e"
      }.getOrElse(""))
    // ids length == the count expr's budget, word by word
    val counts = words.map(w => VocabTokenizer.countWordReference(w, vocab))
    assert(got.map(_.length) == counts)
    // every non-UNK id decodes back to a piece whose concatenation is the word
    val sorted = vocab.distinct.sorted
    words.zip(got).foreach { case (w, ids) =>
      assert(ids.forall(i => i >= 1 && i <= sorted.length), s"UNK leaked for '$w'")
      assert(ids.map(i => sorted(i - 1)).mkString == w, s"decode mismatch for '$w'")
    }
  }

  test("token ids: UNK emits id 0 and advances; multi-word arrays flatten in order") {
    import spark.implicits._
    val tiny = Seq("ab", "a", "b") // sorted ranks: a=1, ab=2, b=3
    val ids = Seq(Seq("zab", "ba")).toDF("ws")
      .select(TextNormExprs.vocabTokenIds(col("ws"), tiny).as("ids"))
      .head.getSeq[Int](0).toSeq
    // "zab" -> UNK(z), ab ; "ba" -> b, a
    assert(ids == Seq(0, 2, 3, 1))
    assert(VocabTokenizer.idsWordReference("zab", tiny) == Seq(0, 2))
  }

  test("UNK fallback: a word with no vocab coverage counts one token per char") {
    // the fixture vocab is [a-z]-only and contains every single letter,
    // so exercise UNK with a custom vocab lacking 'z'
    import spark.implicits._
    val tiny = Seq("ab", "a", "b")
    val n = Seq(Seq("zzazb")).toDF("ws")
      .select(TextNormExprs.vocabTokenCount(col("ws"), tiny).as("n"))
      .head.getInt(0)
    // z|z|a|zb -> UNK z, UNK z, a, UNK z, b = 5
    assert(n === 5)
    assert(VocabTokenizer.countWordReference("zzazb", tiny) === 5)
  }
}
