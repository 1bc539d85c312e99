package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anti-entropy range digests (the Merkle-tree repair idea of
  * Dynamo/Cassandra): summarize each id-hash bucket of a snapshot as
  * (row count, XOR of per-row content hashes), then compare ONLY the
  * digests of two snapshots to locate where they differ — bytes
  * exchanged are proportional to the number of DIFFERING buckets, not
  * the corpus, which is what makes cross-datacenter dataset sync and
  * replica repair affordable at 100 TB. [[SnapshotDiff]] answers
  * "which ROWS changed" by shuffling both snapshots' (id, hash) pairs;
  * this answers "which RANGES changed" from two bucket-sized digest
  * tables, and the row-level diff then runs on the differing buckets
  * only.
  *
  * Digest contract: XOR of 48-bit md5-prefix row hashes — commutative
  * and associative, so the aggregate is order-insensitive and
  * map-side-combinable, carries no overflow (unlike a sum of hashes),
  * and replays exactly in any engine; the row count rides along to
  * catch the measure-zero even-multiplicity XOR blind spot. A bucket
  * digest collision between DIFFERING buckets needs a 48-bit hit on
  * equal counts — the same exactness budget the dedup family's hashed
  * refines accept. At depth: compare the root (leaves=1) or a coarse
  * level first, drill only into differing subtrees; every level is
  * this same aggregate with a different modulus.
  */
object MerkleDiff {

  /** Per-leaf digest of one snapshot: leaf = md5-bucket(id) mod
    * `leaves`, cnt, dig = XOR of 48-bit row hashes over (id | cols).
    * Each content column is encoded NULL-distinguishing — '0' for
    * NULL, '1' ++ value otherwise — so a row whose content flips
    * between NULL and '' changes its digest (a plain coalesce-to-''
    * would silently report "no difference" for that real change). */
  /** The 48-bit per-row content hash the digest contract is defined
    * over — exposed so [[graft.sources.VersionedTable]]'s fused
    * commit-stats pass XORs EXACTLY these values (one shared
    * definition; the digest can never drift between the two call
    * sites). */
  private[graft] def rowHash(idCol: String, contentCols: Seq[String]):
      org.apache.spark.sql.Column = {
    val rowStr = concat_ws("|",
      (col(idCol).cast("string") +:
        contentCols.map(c =>
          coalesce(concat(lit("1"), col(c).cast("string")), lit("0")))): _*)
    conv(substring(md5(rowStr), 1, 12), 16, 10).cast("long")
  }

  def leafDigests(df: DataFrame, idCol: String, contentCols: Seq[String],
      leaves: Int): DataFrame = {
    require(leaves >= 1, s"need leaves >= 1, got $leaves")
    df.select((Splits.hashBucket(col(idCol)) % leaves).as("leaf"),
        rowHash(idCol, contentCols).as("_h"))
      .groupBy("leaf")
      .agg(count(lit(1)).as("cnt"), expr("bit_xor(_h)").as("dig"))
  }

  /** Compare two snapshots' leaf digests: one row per leaf present on
    * either side, with a `differs` verdict — the drill-down worklist
    * of an anti-entropy sync. */
  def diffLeaves(a: DataFrame, b: DataFrame, idCol: String,
      contentCols: Seq[String], leaves: Int): DataFrame = {
    val da = leafDigests(a, idCol, contentCols, leaves)
      .select(col("leaf"), col("cnt").as("cnt_a"), col("dig").as("dig_a"))
    val db = leafDigests(b, idCol, contentCols, leaves)
      .select(col("leaf"), col("cnt").as("cnt_b"), col("dig").as("dig_b"))
    da.join(db, Seq("leaf"), "full_outer")
      .select(col("leaf"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
        coalesce(col("dig_a"), lit(-1L)).as("dig_a"),
        coalesce(col("dig_b"), lit(-1L)).as("dig_b"))
      .withColumn("differs",
        col("cnt_a") =!= col("cnt_b") || col("dig_a") =!= col("dig_b"))
  }
}
