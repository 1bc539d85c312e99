package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UNIGRAM-LM subword vocabulary TRAINING (the SentencePiece trainer —
  * Kudo 2018, "Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates"; Kudo &
  * Richardson 2018, EMNLP demo) — the OTHER tokenizer family every LLM
  * stack ships next to BPE ([[BpeTrainer]], q100). Where BPE grows a
  * vocabulary bottom-up by merging, unigram-LM starts from a LARGE
  * seed of candidate pieces and alternates (E) segmenting the corpus
  * under the current piece scores with (M) re-estimating scores from
  * the segmentation, pruning low-value pieces — keeping the pieces a
  * maximum-likelihood segmentation actually uses.
  *
  * INTEGER SURROGATE OBJECTIVE, stated plainly: published SentencePiece
  * scores pieces by -log p(piece) and runs real-valued Viterbi/EM.
  * Floating-point path costs are not bit-replayable across engines
  * (the oracle contract every operator here carries), so the E-step
  * Viterbi instead minimizes the TOTAL ORDER
  *
  *   (1) fewest pieces            — the dominant term of any unigram
  *                                  segmentation (longer pieces ⇔
  *                                  higher-probability parses),
  *   (2) highest summed piece frequency — the current round's unigram
  *                                  evidence as an exact integer,
  *   (3) lexicographically smallest SEP-joined piece path — a total,
  *                                  prefix-stable tiebreak (SEP = U+0001,
  *                                  sorts below every corpus char, so
  *                                  comparing joined paths is decided
  *                                  before any suffix divergence).
  *
  * Every quantity is integer or string — the DP replays bit-for-bit in
  * SQL as unrolled per-position CTEs (q225's discipline applied to a
  * lattice instead of a graph). This is a Viterbi-EM unigram trainer
  * with a deterministic surrogate, not a claim of SentencePiece parity
  * — documented, not hidden.
  *
  * Scale structure (the [[BpeTrainer]] shape): the corpus is touched
  * once (word-count aggregation); everything after runs on the
  * VOCABULARY-bounded distinct-word table. Seeding explodes each word's
  * substrings (≤ maxWordLen·maxPieceLen rows per distinct word) into
  * one count-weighted aggregate; each EM round segments the word table
  * with a per-row DP against the BROADCAST vocabulary (≤ seedSize + the
  * alphabet — driver-bounded by construction, the k-means-sample class
  * of collect) and re-aggregates piece counts. Words longer than
  * `maxWordLen` are excluded up front (both engines, same rule): the
  * DP unrolls one CTE per position in the oracle, so the cap is part
  * of the operator's declared contract, not a hidden truncation.
  *
  * Single-character pieces are FORCE-KEPT every round (SentencePiece's
  * character-coverage floor) — every word stays segmentable, so the
  * DP never dead-ends. Multi-char pieces are pruned to the top
  * `keepSize` by (count DESC, piece ASC) after each round.
  */
object UnigramLm {

  val Sep = "\u0001" // joins DP paths; sorts below every corpus char

  /** Words containing a SUPPLEMENTARY-PLANE code point (emoji, rare
    * CJK) are EXCLUDED up front, in both engines (ADVICE r14): the JVM
    * DP indexes by UTF-16 code units and tie-breaks in UTF-16 order,
    * while Spark's `length`/`substring` and the DuckDB oracle operate
    * on code points and UTF-8 order — the two only provably agree on
    * BMP-only words (1 code point = 1 UTF-16 unit; UTF-16 order =
    * code-point order = UTF-8 byte order). The exclusion is part of
    * the operator's declared word-eligibility contract, exactly like
    * `maxWordLen` — stated, not a hidden truncation. */
  val NonBmpRe = "[\\x{10000}-\\x{10FFFF}]"

  final case class Params(maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 80, keepSize: Int = 60, rounds: Int = 2)

  /** The shared word-eligibility predicate (the trainer, the q234
    * census and the oracle all state the same rule): length-capped,
    * BMP-only. */
  def eligibleWord(p: Params): org.apache.spark.sql.Column =
    length(col("word")).between(1, p.maxWordLen) &&
      !col("word").rlike(NonBmpRe)

  /** Candidate substring seed: every substring of length 1..maxPieceLen
    * of every (length-capped) word, frequency = count-weighted number
    * of OCCURRENCE POSITIONS. Single chars all kept; multi-char pieces
    * pruned to the top `seedSize`. Returns (piece, freq). */
  def seedVocab(words: DataFrame, p: Params): DataFrame = {
    val sub = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word"), col("cnt"), col("st"),
        explode(sequence(lit(1), lit(p.maxPieceLen))).as("ln"))
      .filter(col("st") + col("ln") - 1 <= length(col("word")))
      .select(expr("substring(word, st, ln)").as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("freq"))
    sub.filter(length(col("piece")) === 1)
      .unionByName(sub.filter(length(col("piece")) >= 2)
        .orderBy(col("freq").desc, col("piece")).limit(p.seedSize))
  }

  /** The E-step lattice DP for one word under a piece→freq map:
    * (piece sequence) minimizing the documented total order. Shared by
    * the distributed trainer (inside the segmentation UDF) and the
    * spec's direct witness. Always total: every single char of the
    * word is in the vocabulary by the force-keep invariant. */
  def viterbi(word: String, vocab: Map[String, Long], maxPieceLen: Int): Seq[String] = {
    val n = word.length
    // dp(j) = (pieces, sumFreq, path) — best parse of word[0, j)
    val np = new Array[Int](n + 1)
    val sf = new Array[Long](n + 1)
    val path = new Array[String](n + 1)
    path(0) = ""
    var j = 1
    while (j <= n) {
      var bestNp = Int.MaxValue; var bestSf = -1L; var bestPath: String = null
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (path(i) != null) {
          val piece = word.substring(i, j)
          vocab.get(piece) match {
            case Some(f) =>
              val cNp = np(i) + 1; val cSf = sf(i) + f
              val cPath = path(i) + Sep + piece
              val better = cNp < bestNp ||
                (cNp == bestNp && (cSf > bestSf ||
                  (cSf == bestSf && (bestPath == null || cPath.compareTo(bestPath) < 0))))
              if (better) { bestNp = cNp; bestSf = cSf; bestPath = cPath }
            case None => ()
          }
        }
        i += 1
      }
      if (bestPath != null) { np(j) = bestNp; sf(j) = bestSf; path(j) = bestPath }
      j += 1
    }
    if (path(n) == null) Seq.empty // unreachable under force-kept chars
    else path(n).substring(1).split(Sep, -1).toSeq
  }

  /** Train on a `(word, cnt)` relation (words already normalized).
    * Returns the final vocabulary as (rank, piece, freq), rank by
    * (freq DESC, piece ASC); single-char pieces that fell out of use
    * stay in the vocabulary with their last observed count (possibly
    * 0) — the coverage floor. */
  def train(wordCounts: DataFrame, p: Params): DataFrame = {
    require(p.rounds >= 1 && p.maxPieceLen >= 2 && p.maxWordLen >= 1)
    val spark = wordCounts.sparkSession
    val words = wordCounts
      .select(col("word"), col("cnt").cast("long").as("cnt"))
      .filter(eligibleWord(p))
      .persist()
    words.count() // corpus-sized aggregate runs once; rounds reuse blocks
    var voc = seedVocab(words, p)
    for (_ <- 1 to p.rounds) {
      // vocabulary-bounded collect (≤ seedSize + alphabet): the same
      // bounded-scalar class as the k-means samples — broadcast to the
      // per-word DP, never joined corpus-side
      val vocabMap: Map[String, Long] = voc.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val counts = pieceCounts(words, vocabMap, p.maxPieceLen)
      val singles = voc.filter(length(col("piece")) === 1).select("piece")
        .join(counts, Seq("piece"), "left_outer")
        .select(col("piece"), coalesce(col("freq"), lit(0L)).as("freq"))
      voc = singles.unionByName(
          counts.filter(length(col("piece")) >= 2)
            .orderBy(col("freq").desc, col("piece")).limit(p.keepSize))
        .localCheckpoint(false)
    }
    val out = voc
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("piece"))).cast("long"))
      .select(col("rank"), col("piece"), col("freq"))
      .localCheckpoint()
    words.unpersist()
    out
  }

  /** Piece-usage counts of a `(word, cnt)` relation under a FIXED
    * vocabulary — one E-step (the inference-side census every tokenizer
    * deployment wants: what does the corpus actually use?). Shared by
    * the training loop and q234. */
  def pieceCounts(words: DataFrame, vocab: Map[String, Long],
      maxPieceLen: Int): DataFrame = {
    val bc = words.sparkSession.sparkContext.broadcast(vocab)
    val segUdf = udf { (word: String) => viterbi(word, bc.value, maxPieceLen) }
    words.select(col("cnt"), explode(segUdf(col("word"))).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("freq"))
  }

  /** Segment a text column's words with a trained vocabulary (the
    * inference half — [[graft.functions.VocabTokenizer]]'s unigram
    * counterpart): words → Viterbi pieces, concatenated in word order. */
  def segment(df: DataFrame, wordsCol: String, vocab: Map[String, Long],
      maxPieceLen: Int): org.apache.spark.sql.Column = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    val segUdf = udf { (ws: Seq[String]) =>
      ws.flatMap(w => viterbi(w, bc.value, maxPieceLen))
    }
    segUdf(col(wordsCol))
  }
}
