package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE can't fix alone.
  *
  * AQE's runtime skew-join split handles most shuffle-join skew; these
  * helpers cover the two remaining shapes at 100 TB:
  *  - a *hot aggregation key* ("the" appears in ~82% of the reference
  *    corpus files): [[saltedAggregate]] splits each key across
  *    `salts` reducers, then re-aggregates the partials;
  *  - a *hot join key* against a replicable right side:
  *    [[saltedJoin]] spreads the big side's hot key over `salts`
  *    partitions by replicating the small side once per salt.
  *
  * Both are semantics-preserving (specs assert equality with the
  * unsalted plans); salting costs one extra narrow stage + `salts`×
  * replication of the small side, so apply only where skew is measured.
  */
object Skew {

  /** Deterministic row salt in [0, salts). Hashes the given columns —
    * pass high-cardinality columns (not the group key!) so one hot
    * group key spreads evenly. */
  def salt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Two-phase count/sum aggregation: partial by (key, salt), final by
    * key. `sumCols` are summed; row counts come back as `n`. The salt
    * is derived from `saltSource` (high-cardinality columns, NOT the
    * group key) spread over `salts` buckets. */
  // collision-proof internal column name (a user column literally named
  // "_salt" would otherwise be silently overwritten and dropped)
  private val SaltCol = "__graft_salt"

  def saltedAggregate(df: DataFrame, keyCol: String, salts: Int,
      saltSource: Seq[String], sumCols: Seq[String]): DataFrame = {
    val partial = df
      .withColumn(SaltCol, salt(salts, saltSource.map(col): _*))
      .groupBy(col(keyCol), col(SaltCol))
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
    partial
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
  }

  /** Salted equi-join: the big (skewed) side gets a deterministic salt;
    * the small side is replicated once per salt value; the join runs on
    * (key, salt).
    *
    * `joinType` supports `"inner"` and `"left_outer"` (big side
    * preserved — the attribution-at-scale shape: every fact row
    * survives, dimension columns null when unmatched). Left-outer is
    * semantics-preserving under salting because each BIG row carries
    * exactly one deterministic salt: it meets every replicated small
    * row for its key (match count identical to the unsalted join) and
    * null-extends exactly once when the key is absent. The same
    * construction is WRONG for right/full outer — an unmatched small
    * row exists `salts` times post-replication and would null-extend
    * once per salt — so those are rejected rather than silently
    * miscomputed (they'd need salt-side aggregation to rebuild one
    * row, a different operator). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int, bigSaltSource: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"saltedJoin supports inner|left_outer, got $joinType — right/full outer would " +
        "emit one null-extension per salt for each unmatched small row")
    val saltedBig = big.withColumn(SaltCol, salt(salts, bigSaltSource.map(col): _*))
    val replicatedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey)
          && saltedBig(SaltCol) === replicatedSmall(SaltCol),
        joinType)
      .drop(SaltCol)
  }

  /** HYBRID HOT/COLD JOIN (frequent-key split — the third standard
    * skew weapon, complementing [[saltedJoin]] and AQE's runtime
    * split): measure the big side's `hotK` heaviest keys (one
    * aggregate + TakeOrdered — scalar driver traffic), route those
    * rows through a BROADCAST join of just the small side's hot rows
    * (the skewed keys never enter a shuffle partition at all), and
    * shuffle-join only the cold remainder, whose per-key volume is
    * bounded by the (hotK+1)-th frequency. Equality with the plain
    * join is spec-asserted; the hot list is deterministic ((cnt DESC,
    * key) order).
    *
    * vs salting: salting spreads a hot key across `salts` reducers but
    * still shuffles every row and replicates the whole small side;
    * the hybrid split shuffles NONE of the hot rows and replicates
    * only the small side's hot subset — the right trade when hot keys
    * are few and the small side's hot rows fit a broadcast. Inner
    * joins only (the split would double-count null-extensions). */
  def hybridJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, hotK: Int): DataFrame = {
    require(hotK >= 1, s"need hotK >= 1, got $hotK")
    val hot = big.groupBy(col(bigKey)).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col(bigKey)).limit(hotK)
      .select(col(bigKey).as("__hot_key"))
    val hotB = broadcast(hot)
    def splitOn(df: DataFrame, key: String): (DataFrame, DataFrame) = (
      df.join(hotB, df(key) === hotB("__hot_key"), "left_semi"),
      df.join(hotB, df(key) === hotB("__hot_key"), "left_anti"))
    val (bigHot, bigCold) = splitOn(big, bigKey)
    val (smallHot, smallCold) = splitOn(small, smallKey)
    bigHot.join(broadcast(smallHot), bigHot(bigKey) === smallHot(smallKey))
      .unionByName(bigCold.join(smallCold, bigCold(bigKey) === smallCold(smallKey)))
  }
}
