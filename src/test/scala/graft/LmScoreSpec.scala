package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

class LmScoreSpec extends SparkSuite {
  import spark.implicits._

  test("bigrams: adjacent normalized pairs, <2-token docs emit nothing") {
    val df = Seq(
      (1L, "The cat SAT on the mat"),
      (2L, "solo"),
      (3L, ""),
      (4L, "A b")
    ).toDF("doc_id", "text")
    val bg = TextAnalysis.bigrams(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(bg.count(_._1 == 1L) === 5)
    assert(bg.filter(_._1 == 1L).head === ((1L, "the", "cat")))
    assert(!bg.exists(t => t._1 == 2L || t._1 == 3L))
    assert(bg.filter(_._1 == 4L).toSeq === Seq((4L, "a", "b")))
  }

  test("lmNllScore matches a from-scratch driver-side model on a toy corpus") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the cat"),
      (3L, "xylophone quartz vortex")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmNllScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // reference: same add-one bigram model computed in plain Scala
    def toks(s: String) = s.split("\\s+").map(_.toLowerCase.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
    val docs = Map(1L -> toks("the cat sat on the mat"),
      2L -> toks("the cat sat on the cat"), 3L -> toks("xylophone quartz vortex"))
    val bigs = docs.toSeq.flatMap { case (id, w) => w.sliding(2).map(p => (id, p(0), p(1))) }
    val cb = bigs.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.size }
    val cw = bigs.groupBy(_._2).map { case (k, v) => k -> v.size }
    val v = docs.values.flatten.toSet.size
    for ((id, w) <- docs) {
      val lps = w.sliding(2).toSeq.map { p =>
        math.floor(math.log((cb((p(0), p(1))) + 1).toDouble / (cw(p(0)) + v)) * 1e6 + 0.5).toLong
      }
      val nll = math.floor(-lps.sum.toDouble / 1e6 / lps.size * 1e4 + 0.5) / 1e4
      assert(got(id)._1 === lps.size.toLong, s"doc $id n_bigrams")
      assert(got(id)._2 === nll, s"doc $id nll")
    }
    // the all-rare doc must be the most surprising
    assert(got(3L)._2 > got(1L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("lmNllScore on the fixture corpus: every doc with >=2 tokens scored, nll positive") {
    val docs = Tables(spark, sfDir, "documents")
    val scored = TextAnalysis.lmNllScore(docs, "doc_id", "text")
    val expected = docs
      .filter(size(graft.functions.TextFunctions.normalizedWords(col("text"))) >= 2)
      .count()
    assert(scored.count() === expected)
    assert(scored.filter(col("nll") <= 0).count() === 0)
  }
}
