package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset split assignment — the train/val/test carve a
  * training-data pipeline runs once per corpus snapshot.
  *
  * Assignment is a pure function of the id (never of row order,
  * partitioning, or a seed held driver-side): bucket = the first 16
  * bits of md5(id-as-string), split = the first entry whose cumulative
  * fraction covers the bucket. Properties that matter at 100 TB:
  *
  *  - **Narrow.** One codegen'd projection — no shuffle, no sample()
  *    pass, no driver state. Adding a split column to a 100 TB corpus
  *    costs one map over it.
  *  - **Stable under growth.** A doc's split never changes when other
  *    docs are added/removed (contrast `randomSplit`, which reshuffles
  *    assignment on every run and under every repartition).
  *  - **Engine-portable.** md5 is bit-identical everywhere (the repo's
  *    oracle idiom — DuckDB reproduces the bucket arithmetic exactly),
  *    so downstream consumers in any engine agree on membership.
  *
  * The 16-bit bucket quantizes fractions to 1/65536 ≈ 0.0015%; callers
  * needing finer resolution can widen to 8 hex chars, but 16 bits keep
  * the oracle arithmetic in exact-integer DOUBLE range everywhere.
  */
object Splits {
  val bucketBits = 16
  private val buckets = 1 << bucketBits // 65536

  /** The md5-prefix bucket in [0, 65536) for an id column. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, bucketBits / 4), 16, 10).cast("int")

  /** RENDEZVOUS (highest-random-weight) shard assignment — Thaler &
    * Ravishankar '96: a key's shard is the one whose (key, shard) hash
    * is largest. The property [[hashBucket]]-mod-n cannot give:
    * adding a shard moves only ~1/(n+1) of the keys, and every move
    * is INTO the new shard — existing shards never exchange keys (a
    * mod-n resharding moves ~all keys). The stable-routing primitive
    * for incremental corpus resharding, cache assignment, and
    * writer-affinity at 100 TB: one narrow codegen'd projection, no
    * ring state, deterministic in any engine (ties broken by shard
    * name — md5 both sides, so DuckDB replays assignments exactly). */
  def rendezvousShard(id: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      s"need distinct non-empty shards, got $shards")
    val cands = array(shards.map(s =>
      struct(hashBucket(concat(lit(s), lit("|"), id.cast("string"))).as("b"),
        lit(s).as("s"))): _*)
    array_max(cands).getField("s")
  }

  /** Adds `bucket` and `split` columns; `fractions` must sum to ~1 and
    * is applied in order (first entry gets buckets [0, f0·65536), …). */
  def assign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $fractions")
    // cumulative-then-round (not round-then-sum): the final cut is
    // round(1.0 · 65536) = 65536 exactly, so the last split absorbs the
    // quantization remainder and every bucket is covered
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val cuts = cum.map(c => math.round(c * buckets))
    require(cuts.last == buckets, s"fraction quantization must cover all $buckets buckets")
    val b = hashBucket(col(idCol))
    val split = fractions.zip(cuts).reverse.foldLeft(lit(fractions.last._1)) {
      case (acc, ((name, _), cut)) => when(b < cut, name).otherwise(acc)
    }
    df.withColumn("bucket", b).withColumn("split", split)
  }
}
