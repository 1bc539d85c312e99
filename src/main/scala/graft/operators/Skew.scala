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
}
