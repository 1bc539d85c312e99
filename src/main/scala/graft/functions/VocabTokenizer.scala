package graft.functions

import org.apache.spark.sql.Column

/** Loadable subword vocabulary + greedy longest-match token counting
  * (the [[graft.plans.TextNormExprs.VocabTokenCountExpr]] front end).
  *
  * The committed fixture `src/main/resources/graft/vocab_en.txt` is a
  * real BPE vocabulary learned from the sf0.01 corpus by the in-repo
  * [[graft.operators.BpeTrainer]] (minCount=2, merges until no pair
  * repeats; the 26 single letters + learned pieces, one per line,
  * sorted). Regenerate with `graft.tools.TrainVocab`; BpeTrainerSpec
  * asserts the file matches the trainer's output. Any other vocab
  * file with one piece per line loads the same way — the tokenizer is
  * vocabulary-agnostic, which is the point: sequence budgets (q67
  * packing, q70 chunking) computed here are the counts the actual
  * training tokenizer would produce, not a regex estimate. */
object VocabTokenizer {

  /** The committed default vocabulary (classpath resource). */
  lazy val default: Seq[String] = load("/graft/vocab_en.txt")

  def load(resource: String): Seq[String] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"vocab resource $resource not on classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** Total greedy-longest-match token count over a normalized word
    * array (native single-pass expression). */
  def tokenCount(words: Column, vocab: Seq[String] = default): Column =
    graft.plans.TextNormExprs.vocabTokenCount(words, vocab)

  /** Total greedy tokenization to TOKEN IDS (1-based rank in the
    * sorted vocab; UNK = 0) — the emit twin of [[tokenCount]]. */
  def tokenIds(words: Column, vocab: Seq[String] = default): Column =
    graft.plans.TextNormExprs.vocabTokenIds(words, vocab)

  /** Reference ids segmentation for one word (naive scan — the
    * executable spec's witness for [[tokenIds]]). */
  def idsWordReference(word: String, vocab: Seq[String]): Seq[Int] = {
    val sorted = vocab.distinct.sorted
    val rank = sorted.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pos = 0
    while (pos < word.length) {
      val matches = sorted.filter(p => word.startsWith(p, pos))
      if (matches.isEmpty) { out += 0; pos += 1 }
      else {
        val best = matches.maxBy(_.length)
        out += rank(best); pos += best.length
      }
    }
    out.toSeq
  }

  /** Reference implementation of the greedy segmentation for one word —
    * the executable spec [[graft.VocabTokenizerSpec]] asserts the
    * native expression against (naive linear vocab scan per position). */
  def countWordReference(word: String, vocab: Seq[String]): Int = {
    var pos = 0
    var cnt = 0
    while (pos < word.length) {
      val matches = vocab.filter(p => word.startsWith(p, pos))
      val step = if (matches.isEmpty) 1 else matches.map(_.length).max
      cnt += 1
      pos += step
    }
    cnt
  }

  /** The vocabulary as a SQL VALUES list — the oracle side's one source
    * of truth (single-quoted, quotes doubled; pieces here are [a-z] but
    * escape anyway). */
  def valuesSql(vocab: Seq[String] = default): String =
    vocab.map(p => s"('${p.replace("'", "''")}')").mkString(", ")
}
