package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot diff — the dataset-versioning primitive (what
  * changed between corpus crawl N and N+1): every id in either
  * snapshot classified `added` / `removed` / `changed` / `unchanged`.
  *
  * Scale shape: each side reduces to (id, 32-byte content hash) — a
  * narrow map, the [[Dedup.exact]] idiom (documents never shuffle by
  * content) — then ONE full-outer hash equi-join on the id decides the
  * status. The natural incremental-ingest companion: `added ∪ changed`
  * is exactly the work list downstream recomputation needs
  * ([[Dedup.exactIncremental]] consumes the same shape).
  */
object SnapshotDiff {

  /** (id, status) for every id in `oldDf` ∪ `newDf`; content equality
    * is md5 over `contentCols` joined with unit separators (multi-col
    * safe: no concatenation ambiguity). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty)
    def hashed(df: DataFrame, h: String) = df.select(col(idCol),
      md5(concat_ws("\u001f", contentCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)).as(h))
    hashed(oldDf, "_oh").join(hashed(newDf, "_nh"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_oh").isNull, "added")
          .when(col("_nh").isNull, "removed")
          .when(col("_oh") === col("_nh"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
