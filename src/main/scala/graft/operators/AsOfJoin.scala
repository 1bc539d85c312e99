package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
/** As-of join: for each left row, the single most recent right row with
  * a matching key and right-time ≤ left-time (ties broken by the
  * right-side tiebreak column, descending). Left rows with no match are
  * kept with nulls — left-outer semantics.
  *
  * Implementation is the union-merge formulation (compose-built-ins,
  * SURVEY §7.5 preference (a)): tag right rows 0 and left rows 1, union
  * on (key, time), sort each key's rows by (time, tag, tiebreak), and
  * carry the latest right payload forward with a running
  * `last(ignoreNulls)` window. Right rows at the exact left time sort
  * first (tag 0), so the ≤ bound is inclusive; among equal-time right
  * rows the greatest tiebreak sorts last and wins.
  *
  * Scale: ONE shuffle of |L|+|R| rows hash-partitioned by key and one
  * sort-based window — the intermediate the naive equi-join + filter +
  * row_number plan materializes (every left row × all earlier right
  * rows for its key, quadratic per hot key) never exists. This is the
  * standard point-in-time-join shape for 100 TB event/state tables; key
  * skew degrades to a single fat sort partition, mitigated by
  * range-partitioning inside the key via time-bucket pre-aggregation of
  * the right side if measured.
  */
object AsOfJoin {

  /** As-of join (the usual shape: events joined to the latest prior
    * state). Output columns: all left columns, then all right columns
    * (null when no match) — left and right column names must be
    * disjoint. Duplicate left ids/keys are fine (each row joins
    * independently); a NULL key matches nothing, like the equi-join
    * it replaces. Key sides should be same-family types (both numeric,
    * both string, …): a mixed string/numeric pair widens to STRING and
    * compares lexically, unlike SQL's numeric comparison — pre-cast
    * such keys explicitly. */
  def byId(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String, tiebreak: String): DataFrame =
    core(left, right, leftKey, rightKey, leftTime, rightTime, tiebreak, forward = false)

  /** FORWARD as-of join: for each left row, the single EARLIEST right
    * row with a matching key and right-time ≥ left-time (ties broken by
    * the tiebreak ascending — the smallest wins, mirroring [[byId]]'s
    * greatest-wins on the backward side). The "next event after" shape:
    * first order after a touchpoint, next price tick after a trade.
    * Same union-merge plan and cost as [[byId]] — only the sort
    * direction of the carry window flips (time DESC with nulls FIRST so
    * a null left time still matches nothing, tiebreak DESC so the
    * running last-carry lands on the smallest). */
  def byIdForward(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String, tiebreak: String): DataFrame =
    core(left, right, leftKey, rightKey, leftTime, rightTime, tiebreak, forward = true)

  private def core(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String, tiebreak: String,
      forward: Boolean): DataFrame = {
    val k = "__graft_asof_k"; val t = "__graft_asof_t"; val tag = "__graft_asof_tag"
    val tb = "__graft_asof_tb"; val lp = "__graft_asof_l"; val rp = "__graft_asof_r"
    val m = "__graft_asof_m"

    // key sides meet at a widened common type — casting right to the
    // LEFT type could truncate/wrap wider right keys into spurious
    // matches. findWiderTypeForTwo covers the numeric/decimal/string
    // promotions binary comparison accepts (wider than tightest)
    val keyType = org.apache.spark.sql.catalyst.analysis.TypeCoercion
      .findWiderTypeForTwo(left.schema(leftKey).dataType, right.schema(rightKey).dataType)
      .getOrElse(throw new IllegalArgumentException(
        s"as-of join keys have incompatible types: " +
          s"${left.schema(leftKey).dataType} vs ${right.schema(rightKey).dataType}"))
    // heterogeneous time types meet at their widened common type — DATE
    // vs TIMESTAMP widens to TIMESTAMP, INT vs BIGINT to BIGINT (an
    // unconditional timestamp cast would reinterpret epoch numbers as
    // seconds and overflow)
    val timeType = {
      val lt = left.schema(leftTime).dataType; val rt = right.schema(rightTime).dataType
      if (lt == rt) lt
      else org.apache.spark.sql.catalyst.analysis.TypeCoercion.findWiderTypeForTwo(lt, rt)
        .getOrElse(throw new IllegalArgumentException(
          s"as-of join time columns have incompatible types: $lt vs $rt"))
    }
    def asTime(c: Column): Column = c.cast(timeType)

    // backtick-quote input column resolution so names containing '.'
    // resolve as plain columns, matching the getField output extraction
    def q(c: String): String = s"`${c}`"
    val leftStruct = struct(left.columns.map(c => left(q(c))): _*)
    val rightStruct = struct(right.columns.map(c => right(q(c))): _*)
    val rightStructType = right.select(rightStruct).schema.head.dataType
    val leftStructType = left.select(leftStruct).schema.head.dataType
    val tbType = right.schema(tiebreak).dataType

    val l = left.select(
      left(q(leftKey)).cast(keyType).as(k), asTime(left(q(leftTime))).as(t),
      lit(1).as(tag), lit(null).cast(tbType).as(tb),
      leftStruct.as(lp), lit(null).cast(rightStructType).as(rp))
    // a null right time can never satisfy rightTime <= leftTime, and a
    // null right KEY can never equal any left key (SQL join semantics:
    // NULL = NULL is not a match) — drop both here; a null-key LEFT row
    // then shares its window partition only with other left rows and
    // correctly carries no payload (left-outer kept with nulls). The
    // null checks run on the CASTED values: a value the time/key cast
    // nulls out (e.g. a malformed string timestamp) would otherwise
    // sort nulls-first and pollute the carry
    val r = right.select(
        right(q(rightKey)).cast(keyType).as(k), asTime(right(q(rightTime))).as(t),
        lit(0).as(tag), right(q(tiebreak)).as(tb),
        lit(null).cast(leftStructType).as(lp), rightStruct.as(rp))
      .filter(col(t).isNotNull && col(k).isNotNull)

    val w = Window.partitionBy(col(k))
      .orderBy(
        if (forward) col(t).desc_nulls_first else col(t).asc_nulls_first,
        col(tag).asc,
        if (forward) col(tb).desc else col(tb).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(m, last(col(rp), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
      // getField (not a dotted path string) so column names containing
      // '.' or other special characters resolve correctly
      .select(left.columns.map(c => col(lp).getField(c).as(c)) ++
        right.columns.map(c => col(m).getField(c).as(c)): _*)
  }
}
