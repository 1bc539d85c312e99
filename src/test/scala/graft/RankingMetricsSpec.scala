package graft

import org.apache.spark.sql.functions._

import graft.operators.RankingMetrics

/** Planted-case ranking metrics: hand-computed nDCG/MRR/recall, the
  * no-hit / no-retrieval / unknown-query contracts, and the
  * left-join marker regression (a literal marker was constant-folded
  * through the outer join by the optimizer — misses became hits). */
class RankingMetricsSpec extends SparkSuite {
  import org.apache.spark.sql.Row

  test("binaryMetrics: planted hits, zero rows, unknown queries; exact fixed-point nDCG") {
    import spark.implicits._
    val k = 3
    val retrieved = Seq(
      ("q1", "d1", 1), ("q1", "d9", 2), ("q1", "d3", 3), // hits at ranks 1, 3
      ("q2", "x1", 1), ("q2", "x2", 2), ("q2", "x3", 3), // zero hits
      ("qZ", "d1", 1)                                    // unknown query -> ignored
    ).toDF("qid", "doc", "rank")
    val relevant = Seq(
      ("q1", "d1"), ("q1", "d3"), ("q1", "d7"),
      ("q2", "d1"),
      ("q3", "d2"), ("q3", "d4")                          // nothing retrieved
    ).toDF("qid", "doc")
    val got = RankingMetrics.binaryMetrics(retrieved, relevant, "qid", "doc", "rank", k)
      .orderBy("qid").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("q1", "q2", "q3"))
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val w = RankingMetrics.wFixed(k)
    val cum = RankingMetrics.idealFixed(k)
    // q1: hits 2 (ranks 1 and 3), rel_cnt 3
    val q1 = got(0)
    assert(q1.getLong(1) === 3L && q1.getLong(2) === 2L)
    assert(q1.getDouble(3) === r4((w(0) + w(2)).toDouble / cum(2)), "ndcg")
    // independent recomputation of the same quantity from first principles
    val dcg = 1.0 / (math.log(2) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    val idcg = (1 to 3).map(i => 1.0 / (math.log(i + 1.0) / math.log(2))).sum
    assert(math.abs(q1.getDouble(3) - dcg / idcg) < 2e-4, "fixed-point ndcg ~ float ndcg")
    assert(q1.getDouble(4) === 1.0, "mrr: first hit at rank 1")
    assert(q1.getDouble(5) === r4(2.0 / 3) && q1.getDouble(6) === r4(2.0 / 3))
    // q2: retrieved but zero hits -> ALL zeros (the folded-marker bug
    // made this row nonzero)
    assert(got(1).toSeq === Row("q2", 1L, 0L, 0.0, 0.0, 0.0, 0.0).toSeq)
    // q3: relevant but nothing retrieved -> zeros, still present
    assert(got(2).toSeq === Row("q3", 2L, 0L, 0.0, 0.0, 0.0, 0.0).toSeq)
  }

  test("discount tables: monotone decreasing, ideal cumulative, mrr literal = round4(1/i)") {
    val k = 10
    val w = RankingMetrics.wFixed(k)
    assert(w.head === 1000000000000L, "w(1) = 1/log2(2) = 1.0 scaled")
    assert(w === w.sorted.reverse && w.distinct === w)
    assert(RankingMetrics.idealFixed(k) === w.scanLeft(0L)(_ + _).tail)
    assert(RankingMetrics.mrrTable(k).head === 1.0)
    assert(RankingMetrics.mrrTable(k)(9) === 0.1)
  }

  test("perfect retrieval scores ndcg = mrr = recall = 1") {
    import spark.implicits._
    val retrieved = (1 to 5).map(i => ("q", s"d$i", i)).toDF("qid", "doc", "rank")
    val relevant = (1 to 5).map(i => ("q", s"d$i")).toDF("qid", "doc")
    val r = RankingMetrics.binaryMetrics(retrieved, relevant, "qid", "doc", "rank", 5).head
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0)
  }
}
