package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Retrieval-quality evaluation: binary-relevance ranking metrics
  * (nDCG@k, MRR, recall@k, precision@k) per query over a (query,
  * ranked results) table and a (query, relevant docs) ground-truth
  * table — the eval loop every retrieval/ANN pipeline needs beside the
  * retrievers themselves (BM25 q84, hybrid RRF q88, the ANN family
  * q35/q36/q87…).
  *
  * Exactness contract (the repo's engine-replay discipline): DCG's
  * discount weights 1/log₂(i+1) are precomputed ONCE in Scala as
  * 1e12-scaled integers and emitted as literals into both the Spark
  * plan and the DuckDB oracle — per-query DCG is then an exact BIGINT
  * sum (order-independent, no float accumulation), ideal DCG is a
  * literal cumulative lookup, and the only floating-point ops are
  * final divisions of identical operands (IEEE-identical on both
  * engines) under round4. MRR uses a literal 1/rank table. So ranking
  * metrics hash-check bit-for-bit.
  *
  * Scale shape: one broadcast-able hit-join (ground truth is a
  * per-query top-k/relevant set — tiny beside any corpus), one
  * combinable per-query aggregation, zero windows. The eval universe
  * is `relevant`'s queries: queries with no retrieved rows score 0,
  * retrieved rows for unknown queries are ignored.
  */
object RankingMetrics {

  /** 1e12-scaled DCG discounts: wFixed(i-1) = round(1e12 / log₂(i+1)). */
  def wFixed(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e12 * math.log(2) / math.log(i + 1.0)))

  /** Cumulative discounts: idealFixed(m-1) = Σ_{i=1..m} wFixed — the
    * ideal DCG for m relevant docs (m ≤ k). */
  def idealFixed(k: Int): Seq[Long] = wFixed(k).scanLeft(0L)(_ + _).tail

  private def round4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  /** Literal 1/rank table, pre-rounded: mrr for first hit at rank i. */
  def mrrTable(k: Int): Seq[Double] = (1 to k).map(i => round4(1.0 / i))

  /** Per-query binary-relevance metrics.
    *
    * @param retrieved (qidCol, docCol, rankCol) — ranks 1..k, at most
    *                  k rows per query
    * @param relevant  (qidCol, docCol) — the ground-truth set; must be
    *                  non-empty per evaluated query
    */
  def binaryMetrics(retrieved: DataFrame, relevant: DataFrame,
      qidCol: String, docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k=$k out of [1, 100]")
    val wF = wFixed(k)
    val cumF = idealFixed(k)
    val mrrT = mrrTable(k)
    // dedup the ground truth: a duplicated (qid, doc) row would fan
    // out the hit-join (double-counting hits/DCG) AND inflate rel_cnt
    // — metrics silently skewed instead of failing. The SET semantics
    // of binary relevance make dropDuplicates the contract, not a fix.
    val relSet = relevant.select(col(qidCol), col(docCol))
      .dropDuplicates(qidCol, docCol)
    val relCnt = relSet.groupBy(qidCol)
      .agg(count(lit(1)).as("rel_cnt"))
    // ranks outside [1, k] violate the contract; element_at would
    // return NULL past the k-entry table and silently DROP that hit's
    // DCG — raise instead, at execution, on the offending row
    val rk = col(rankCol).cast("int")
    val checkedRank = when(rk.between(1, k), rk).otherwise(raise_error(concat(
      lit(s"binaryMetrics: $rankCol must be in [1, $k], got "), rk.cast("string"))))
    // the miss branch's copy of the guard, spelled LOAD-BEARINGLY as
    // its own CASE (in-range → 0L, out-of-range → raise): the earlier
    // `checkedRank * 0L` idiom only worked because Catalyst currently
    // has no x*0 simplification rule (null semantics) — a future
    // optimizer rule would have silently disabled the check for misses
    val checkedZero = when(rk.between(1, k), lit(0L)).otherwise(raise_error(concat(
      lit(s"binaryMetrics: $rankCol must be in [1, $k], got "), rk.cast("string"))))
    // the match marker must be a REAL attribute from the right side
    // (the doc id itself), not lit(1): a literal marker's isNotNull can
    // be constant-folded to TRUE through the outer join by the
    // optimizer, silently turning misses into hits
    val hits = retrieved
      .join(relSet.withColumn("__rel", col(docCol)), Seq(qidCol, docCol), "left")
      .groupBy(qidCol)
      .agg(
        count(col("__rel")).as("hits"),
        // the miss branch contributes checkedZero instead of a bare
        // 0L: CaseWhen evaluates branches lazily, so this is what makes
        // a MISS row with an out-of-range rank fail too (an unused
        // extra aggregate would be column-pruned away by Catalyst —
        // the guard must live inside a consumed expression)
        sum(when(col("__rel").isNotNull,
          element_at(array(wF.map(lit): _*), checkedRank))
          .otherwise(checkedZero)).as("__dcg_fixed"),
        min(when(col("__rel").isNotNull, checkedRank)).as("__first_hit"))
    relCnt.join(hits, Seq(qidCol), "left")
      .select(col(qidCol), col("rel_cnt"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        TextFunctions.round4(coalesce(col("__dcg_fixed"), lit(0L)).cast("double") /
          element_at(array(cumF.map(lit): _*),
            least(col("rel_cnt"), lit(k.toLong)).cast("int"))).as("ndcg"),
        // explicit null guard: element_at's null-index result is not
        // something to rely on (observed returning the element default)
        when(col("__first_hit").isNull, lit(0.0))
          .otherwise(element_at(array(mrrT.map(lit): _*), col("__first_hit")))
          .as("mrr"),
        TextFunctions.round4(coalesce(col("hits"), lit(0L)).cast("double") /
          col("rel_cnt")).as("recall"),
        TextFunctions.round4(coalesce(col("hits"), lit(0L)).cast("double") / k)
          .as("precision"))
  }

  /** The same literal tables for the DuckDB oracle: list literals whose
    * elements are the IDENTICAL longs/doubles the Spark plan carries
    * (Double.toString round-trips, so the SQL parser reconstructs the
    * same bits). */
  def wFixedSql(k: Int): String = wFixed(k).mkString("[", ", ", "]")
  def idealFixedSql(k: Int): String = idealFixed(k).mkString("[", ", ", "]")
  def mrrTableSql(k: Int): String =
    mrrTable(k).map(d => s"CAST(${java.lang.Double.toString(d)} AS DOUBLE)")
      .mkString("[", ", ", "]")
}
