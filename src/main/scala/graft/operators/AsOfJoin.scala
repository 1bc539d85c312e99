package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * a matching key and right-time ≤ left-time (ties broken by the
  * right-side tiebreak column, descending). Left rows with no match are
  * kept with nulls — left-outer semantics.
  *
  * Implementation is compose-built-ins (SURVEY §7.5 preference (a)):
  * an equi-key left join with the time bound as residual condition,
  * then a `row_number` window keeping the latest match. The join and
  * the window both shuffle on hashable keys, so the plan scales — the
  * caveat is key skew when one key holds many right rows; salt the key
  * or pre-aggregate the right side per (key, time-bucket) if measured.
  */
object AsOfJoin {

  /** As-of join keyed by a unique left-row id (the usual shape: events
    * joined to the latest prior state). */
  def byId(left: DataFrame, right: DataFrame, leftId: String, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String, tiebreak: String): DataFrame = {
    val j = left.join(right,
      col(rightKey) === col(leftKey) && col(rightTime) <= col(leftTime), "left")
    val w = Window.partitionBy(col(leftId))
      .orderBy(col(rightTime).desc_nulls_last, col(tiebreak).desc)
    val rn = "__graft_asof_rn" // collision-proof temp column
    j.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
