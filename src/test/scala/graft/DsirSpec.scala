package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance resampling (q132's operator): the per-bucket log
  * ratios and per-doc scores replay from scratch driver-side, the score
  * actually separates target-like from off-target docs, and the
  * resample keeps the plan shapes the operator promises (broadcast λ
  * join; TakeOrderedAndProject selection, no global sort). */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  // two "registers": target-ish docs reuse the aa/bb vocabulary, the
  // off-target doc lives in its own cc/dd vocabulary
  private val docs = Seq(
    (1L, "aa bb aa bb aa", "t"),
    (2L, "aa bb cc", "t"),
    (3L, "cc dd cc dd cc dd", "r"),
    (4L, "aa bb aa", "r"),
    (5L, "one", "r"), // single token → no features → dropped
    (6L, null.asInstanceOf[String], "r")
  ).toDF("doc_id", "text", "grp")

  private def bucket(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(4), 16)
  }

  /** Driver-side replay of the exact fit + score arithmetic. */
  private def replayScores(corpus: Seq[(Long, String, Boolean)]): Map[Long, (Long, Long)] = {
    val feat = corpus.flatMap { case (id, text, tgt) =>
      val w = Option(text).getOrElse("").toLowerCase
        .split("\\s+").map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
      w.sliding(2).filter(_.length == 2)
        .map(p => (id, tgt, bucket(p.mkString(" ")))).toSeq
    }
    val cr = feat.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = feat.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nr = feat.size.toLong
    val nt = feat.count(_._2).toLong
    val b = Dsir.numBuckets
    def lam6(f: Long): Long =
      math.floor(math.log(
        ((ct.getOrElse(f, 0L) + 1).toDouble * (nr + b).toDouble) /
          ((nt + b).toDouble * (cr(f) + 1).toDouble)) * 1e6 + 0.5).toLong
    feat.groupBy(_._1).map { case (id, fs) =>
      id -> (fs.size.toLong, fs.map(f => lam6(f._3)).sum)
    }
  }

  test("scores equal the from-scratch fit + score replay") {
    val got = Dsir.importanceScores(docs, "doc_id", "text", col("grp") === "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = replayScores(Seq(
      (1L, "aa bb aa bb aa", true), (2L, "aa bb cc", true),
      (3L, "cc dd cc dd cc dd", false), (4L, "aa bb aa", false),
      (5L, "one", false), (6L, null, false)))
    assert(got == exp, s"got=$got exp=$exp")
  }

  test("featureless docs are dropped; target-register doc outscores off-target") {
    val got = Dsir.importanceScores(docs, "doc_id", "text", col("grp") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!got.contains(5L) && !got.contains(6L), got.toString)
    // doc 4 shares the target's aa/bb register; doc 3 is pure off-target
    // vocabulary — DSIR must rank 4 above 3 (per-feature average, since
    // lengths differ)
    val perFeat = Dsir.importanceScores(docs, "doc_id", "text", col("grp") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(2).toDouble / r.getLong(1)).toMap
    assert(perFeat(4L) > perFeat(3L), perFeat.toString)
  }

  test("resample selects the k largest Gumbel keys deterministically") {
    val scored = Dsir.importanceScores(docs, "doc_id", "text", col("grp") === "t")
    val two = Dsir.resample(scored, "doc_id", k = 2).collect()
    assert(two.length == 2)
    val all = Dsir.resample(scored, "doc_id", k = 100)
      .select("doc_id", "gk").as[(Long, Double)].collect()
    assert(all.map(_._2).toSeq == all.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    // top-2 of the full ranking == the k=2 resample (consistent cutoff)
    assert(two.map(_.getLong(0)).toSeq == all.take(2).map(_._1).toSeq)
    // repartitioning the input changes nothing (pure-function keys)
    val rep = Dsir.resample(
      Dsir.importanceScores(docs.repartition(7), "doc_id", "text", col("grp") === "t"),
      "doc_id", k = 2).collect()
    assert(rep.map(_.getLong(0)).toSeq == two.map(_.getLong(0)).toSeq)
  }

  test("plan: broadcast λ join, TakeOrderedAndProject selection, no global sort") {
    val scored = Dsir.importanceScores(docs, "doc_id", "text", col("grp") === "t")
    val scorePlan = scored.queryExecution.executedPlan.toString
    assert(scorePlan.contains("BroadcastHashJoin"), scorePlan)
    val plan = Dsir.resample(scored, "doc_id", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
