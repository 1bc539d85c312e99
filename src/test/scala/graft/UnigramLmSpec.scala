package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** Unigram-LM tokenizer training ([[graft.operators.UnigramLm]]):
  * the integer-surrogate Viterbi's documented total order, the
  * force-keep-singles coverage floor, EM promotion of frequent
  * substrings, and repartition bit-stability. */
class UnigramLmSpec extends SparkSuite {
  import spark.implicits._

  test("viterbi: fewest pieces dominates, then summed frequency, then path order") {
    val vocab = Map("a" -> 100L, "b" -> 1L, "ab" -> 5L, "ba" -> 5L, "aba" -> 2L)
    // one piece beats any two despite lower frequency sum
    assert(UnigramLm.viterbi("aba", vocab, 4) == Seq("aba"))
    // equal piece count: higher summed frequency wins (a+b+a+b = 202 > ab+ab = 10)
    assert(UnigramLm.viterbi("abab", vocab, 4).length == 2) // ab|ab or a… 2 pieces min
    assert(UnigramLm.viterbi("abab", vocab, 4) == Seq("ab", "ab"))
    // 2-piece parses of "abba": ab|ba (sf 10). a|b|b|a is 4 pieces — loses
    assert(UnigramLm.viterbi("abba", vocab, 4) == Seq("ab", "ba"))
    // path tiebreak: vocab where both 2-splits tie on frequency
    val tie = Map("x" -> 1L, "y" -> 1L, "xy" -> 3L, "yx" -> 3L, "xyx" -> 0L)
    // "xyxy": xy|xy (sf 6) vs x|yx|y (3 pieces) — xy|xy wins on count;
    // "xyx" as one piece (sf 0) beats two pieces regardless of sf
    assert(UnigramLm.viterbi("xyx", tie, 4) == Seq("xyx"))
    // pure path tie: pieces "aa" and the split points tie exactly —
    // "aaaa" with only {"a"->1,"aa"->2}: aa|aa unique 2-piece parse
    assert(UnigramLm.viterbi("aaaa", Map("a" -> 1L, "aa" -> 2L), 4)
      == Seq("aa", "aa"))
  }

  test("training promotes the dominant substring and keeps the alphabet floor") {
    // 'sparkly' ×50, 'spark' ×30, plus noise words: 'spark'-family
    // substrings dominate the seed and survive EM
    val wc = (Seq.fill(50)("sparkly") ++ Seq.fill(30)("spark") ++
        Seq.fill(5)("zip") ++ Seq.fill(5)("zap"))
      .toDF("word").groupBy("word").agg(count(lit(1)).as("cnt"))
    val out = UnigramLm.train(wc,
      UnigramLm.Params(maxPieceLen = 4, maxWordLen = 12, seedSize = 30,
        keepSize = 20, rounds = 2))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byPiece = out.map(t => t._2 -> t._3).toMap
    // every character of the corpus is in the vocabulary (coverage floor)
    "sparklyzip".foreach(c =>
      assert(byPiece.contains(c.toString), s"missing single '$c'"))
    // multi-char 'spark'-family fragments won EM: the dominant word's
    // full count (50) rides on its winning parse's pieces (the exact
    // split — spa|rkly — is the documented path tiebreak's choice)
    assert(byPiece("spa") == 50L && byPiece("rkly") == 50L, byPiece.toString)
    // EM character-mass conservation: every corpus character of every
    // capped word lands in exactly one piece of its winning parse, so
    // sum(freq · len(piece)) over the final counts equals the corpus
    // character mass (50·7 + 30·5 + 5·3 + 5·3 = 530)
    assert(out.map(t => t._3 * t._2.length).sum == 530L, byPiece.toString)
    // ranks are (freq DESC, piece ASC) and 1-based dense
    assert(out.map(_._1).toSeq == (1L to out.length))
    assert(out.sliding(2).forall {
      case Array((_, p1, f1), (_, p2, f2)) => f1 > f2 || (f1 == f2 && p1 < p2)
      case _ => true
    })
  }

  test("word-length cap excludes long words entirely; output is " +
      "bit-stable under repartitioning") {
    val wc = (Seq.fill(10)("abc") ++ Seq.fill(10)("verylongwordbeyondcap"))
      .toDF("word").groupBy("word").agg(count(lit(1)).as("cnt"))
    val p = UnigramLm.Params(maxPieceLen = 3, maxWordLen = 8, seedSize = 10,
      keepSize = 10, rounds = 1)
    val out = UnigramLm.train(wc, p)
    // nothing from the capped-out word leaked into the vocabulary
    assert(out.filter(col("piece").contains("v")).count() == 0L)
    val a = UnigramLm.train(wc.repartition(1), p).collect().toSeq
    val b = UnigramLm.train(wc.repartition(5, col("word")), p).collect().toSeq
    assert(a == b)
  }

  test("segment() applies the trained vocabulary across a words column") {
    val vocab = Map("a" -> 1L, "b" -> 1L, "ab" -> 5L)
    val df = Seq(Seq("abab", "b")).toDF("ws")
    val got = df.select(UnigramLm.segment(df, "ws", vocab, 4).as("pieces"))
      .head().getSeq[String](0)
    assert(got == Seq("ab", "ab", "b"))
  }
}
