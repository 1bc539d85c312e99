package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE/upsert: apply a keyed changeset (insert/update/delete
  * flags) to a snapshot — the incremental-update idiom of a production
  * pipeline, re-expressed as the full-outer-join + CASE dataflow that
  * table formats execute for an unpartitioned MERGE INTO.
  *
  * Semantics per snapshot key:
  *  - key absent from the changeset        → snapshot row survives as-is
  *  - changeset op 'I' or 'U'              → the changeset row's values win
  *    (an 'I' on an existing key behaves as an update — idempotent upsert)
  *  - changeset op 'D'                     → the key is dropped
  *  - changeset-only key with op 'I'/'U'   → inserted
  *  - changeset-only key with op 'D'       → no-op (delete of a missing key)
  *
  * Scale shape (100 TB): ONE hash-partitioned shuffle of each side on
  * the merge key — no broadcast (both sides are large in production),
  * no window, no driver collection. Skewed hot keys are AQE's skew-join
  * problem, same as any keyed join. On a real deployment the snapshot
  * side would be bucketed on the key so repeated merges reuse its
  * layout and only the (small) changeset shuffles.
  */
object Merge {

  /** @param snapshot current table state; `keyCol` must be unique
    * @param changes  same schema as `snapshot` plus `opCol` ∈ {I,U,D};
    *                 at most one change row per key (last-writer
    *                 resolution is the caller's concern — compact the
    *                 changeset with a window/max_by first if needed)
    * @return the merged table, snapshot schema, one row per surviving key
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == keyCol)
    val s = snapshot.select(col(keyCol) +: dataCols.map(c => col(c).as(s"_s_$c")): _*)
    val c = changes.select(
      col(keyCol) +: (dataCols.map(d => col(d).as(s"_c_$d")) :+ col(opCol).as("_op")): _*)
    s.join(c, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(keyCol) +: dataCols.map(d =>
        when(col("_op").isNotNull, col(s"_c_$d")).otherwise(col(s"_s_$d")).as(d)): _*)
  }

  /** CHANGELOG COMPACTION — the step [[applyChangeset]]'s doc defers to
    * the caller: collapse an ordered, possibly-many-ops-per-key log to
    * the LATEST state per key, tombstone-aware (a key whose last op is
    * `deleteOp` disappears). This is log-structured compaction (the
    * read path of every LSM table format) as one aggregation.
    *
    * The latest row is a struct-MAX AGGREGATE over (ordCols ++ rest) —
    * map-side combinable, one shuffle on the key, never a window over
    * the log ([[graft.queries.Extensions]] q79's argmax idiom).
    * `ordCols` must totally order each key's ops (ties would make
    * "latest" nondeterministic — include a unique sequence column). */
  def compactLog(log: DataFrame, keyCol: String, opCol: String,
      deleteOp: String, ordCols: Seq[String]): DataFrame =
    latestPerKey(log, keyCol, ordCols).filter(col(opCol) =!= deleteOp)

  /** The latest row per key in `ordCols` order, TOMBSTONES KEPT — the
    * write-side half of compaction (an LSM "SSTable" keeps its deletes
    * so later merges can suppress older batches' rows; only the final
    * read-side [[compactLog]] drops them). */
  def latestPerKey(log: DataFrame, keyCol: String, ordCols: Seq[String]): DataFrame = {
    require(ordCols.nonEmpty, "compaction needs an op order")
    val rest = log.columns.filterNot(c => c == keyCol || ordCols.contains(c)).toSeq
    val fields = ordCols ++ rest
    log.groupBy(keyCol)
      .agg(max(struct(fields.map(col): _*)).as("_m"))
      .select(col(keyCol) +: fields.map(c => col(s"_m.$c").as(c)): _*)
  }
}
