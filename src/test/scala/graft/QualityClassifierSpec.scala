package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** Hashed-feature quality classifier (q117's operator): margin replays
  * from scratch driver-side, degenerate inputs are sane, and the whole
  * score is shuffle-free. */
class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps"),
    (2L, "one"),                // a single token → zero bigrams
    (3L, ""),                   // empty text
    (4L, null.asInstanceOf[String]), // null text
    (5L, "Data! data? DATA.")   // normalization collapses to one bigram twice
  ).toDF("doc_id", "text")

  /** Driver-side replay of the exact weight function: first 16 bits of
    * md5(feature) minus 32768. */
  private def weight(feature: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(feature.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(4)
    java.lang.Long.parseLong(hex, 16) - 32768L
  }

  test("margin equals the from-scratch bigram-weight sum") {
    val got = QualityClassifier.hashedBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val d1 = Seq("the quick", "quick brown", "brown fox", "fox jumps")
    val m1 = d1.map(weight).sum
    assert(got(1L) == ((4L, m1, m1 > 0)), got.toString)
    // "data data" twice: occurrences count, not distinct features
    val m5 = 2 * weight("data data")
    assert(got(5L) == ((2L, m5, m5 > 0)), got.toString)
  }

  test("sub-bigram docs score zero and are not kept") {
    val got = QualityClassifier.hashedBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    Seq(2L, 3L, 4L).foreach { id =>
      assert(got(id) == ((0L, 0L, false)), s"doc $id: ${got(id)}")
    }
  }

  test("scoring plan is shuffle-free (no Exchange, no explode)") {
    val plan = QualityClassifier.hashedBigramScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
  }
}
