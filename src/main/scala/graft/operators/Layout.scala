package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * At 100 TB the cheapest scan is the one never issued: parquet keeps
  * min/max statistics per file and row group, and the reader skips a
  * unit whose [min, max] cannot satisfy the pushed predicate. A linear
  * sort gives tight bounds on ONE column and leaves every other
  * column's per-file range at ~the global range; interleaving the bits
  * of two keys and range-partitioning + sorting on the interleaved
  * value bounds BOTH dimensions per file (each file covers a compact
  * rectangle of the key space), so selective predicates on EITHER
  * column skip most of the data. This is the standard lakehouse
  * clustering technique (Morton curves; see e.g. the public Delta/
  * Iceberg z-ordering docs) expressed with nothing but Spark
  * built-ins: the z-value is a static fold of shift/and/or — fully
  * whole-stage-codegen'd, no UDF — and the layout is
  * `repartitionByRange(zv) + sortWithinPartitions(zv)`.
  *
  * The interleave truncates each key to `bits` low bits (21 by default
  * → 42-bit z-values, keys to 2M interleave losslessly). Truncation
  * never affects CORRECTNESS of a query over the z-value (both engines
  * compute the same function); it only degrades layout locality once
  * keys exceed 2^bits, so size `bits` to the key domain.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Round 9 swapped the statically-unrolled shift/and/or
    * fold (2·bits nested ops — a deep codegen tree per reference) for
    * ONE native magic-mask expression ([[graft.plans.ZOrderExpr]],
    * five shift/mask ops per operand); masking the inputs to the low
    * `bits` bits first makes the two formulations bit-identical
    * (ZOrderSpec property-asserts equality, q85 oracle-gates the
    * value cross-engine against [[zValueSql]]). */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = lit((1L << bits) - 1)
    graft.plans.ZOrderExpr.zValue(
      a.cast("long").bitwiseAND(mask), b.cast("long").bitwiseAND(mask))
  }

  /** The identical interleave as portable SQL (DuckDB/ANSI bit
    * operators) — the oracle text for any query that exposes
    * [[zValue]] output. */
  def zValueSql(a: String, b: String, bits: Int = 21): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Write `df` z-ordered on two columns: range-partition into
    * `numFiles` contiguous z-ranges (one output file each), sort
    * within each file by z, drop the helper column. Every output file
    * then covers a compact rectangle of the (colA, colB) space, and
    * its parquet min/max footer bounds BOTH columns tightly —
    * [[graft.LayoutSpec]] measures exactly that against a
    * linear-sorted baseline.
    *
    * Each dimension is min/max-scaled to the full `bits` width before
    * interleaving. Raw interleave is only balanced when both domains
    * have similar bit-widths; with, say, 2 M parts against 100
    * suppliers, every supplier bit sits below every meaningful part
    * bit and the curve degenerates to a linear part-key sort
    * (measured: the un-scaled layout left the narrow column's per-file
    * spread at 1.0). Scaling costs one bounded min/max aggregate —
    * write-time work, the read side never sees it. Production z-order
    * writers use rank (quantile) scaling for skewed domains; min/max
    * is the right trade here and keeps the write single-shuffle. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      numFiles: Int, path: String, bits: Int = 21): Unit =
    zOrdered(df, colA, colB, numFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** The clustering TRANSFORM behind [[writeZOrdered]], factored so
    * other writers (e.g. the versioned table's z-ordered compaction)
    * can route the clustered rows through their own publish path:
    * min/max-scaled Morton interleave → `numFiles` contiguous
    * z-ranges → in-range sort → helper column dropped. */
  def zOrdered(df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = 21): DataFrame = {
    val mm = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    val full = (1L << bits) - 1
    def scaled(c: String, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      // Spark's `/` is double division: floor + cast makes the
      // truncation explicit. Exact while (hi-lo) * full ≤ 2^53 — any
      // key domain up to 2^31 with the default 21-bit z; beyond that
      // the low scaling bits blur, which only nudges file boundaries
      else floor((col(c).cast("long") - lit(lo)) * lit(full)
        / lit(hi - lo)).cast("long")
    val zc = "__graft_zvalue"
    df.withColumn(zc, zValue(
        scaled(colA, mm.getLong(0), mm.getLong(1)),
        scaled(colB, mm.getLong(2), mm.getLong(3)), bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** [[writeZOrdered]] for SKEWED domains: each dimension is bucketed
    * by its approximate quantiles (2^bits equi-DEPTH buckets) and the
    * bucket ids are interleaved, so the curve spends its resolution
    * where the data actually lives. Min/max scaling collapses under a
    * far outlier (one key at 10^9 against a dense [0,100) mass maps the
    * whole mass to cell 0, degenerating the layout to a linear sort of
    * the other column — measured in LayoutSpec); rank scaling is what
    * production z-order writers (Delta/Iceberg) do.
    *
    * Costs: one driver-side `approxQuantile` pass (bounded: 2·2^bits
    * doubles) + an O(2^bits) per-row bucket lookup at write time — the
    * default 8 bits (256 buckets/dim, 65 536 z-cells) localizes
    * thousands of output files while keeping the lookup trivial. */
  def writeZOrderedByRank(df: DataFrame, colA: String, colB: String,
      numFiles: Int, path: String, bits: Int = 8): Unit = {
    require(bits >= 1 && bits <= 12, s"rank bits must be in [1,12], got $bits")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val bounds = df.stat.approxQuantile(Array(colA, colB), probs,
      0.25 / (1 << bits))
    def bucket(c: String, bs: Array[Double]): Column = {
      // heavy skew duplicates quantiles; distinct keeps bucket ids dense
      val ds = bs.distinct.sorted
      if (ds.isEmpty) lit(0L)
      else {
        val raw = size(filter(typedLit(ds.toSeq), b => b <= col(c).cast("double")))
        // stretch the (possibly few) dense ids across the FULL bit
        // width — a low-cardinality dimension otherwise only occupies
        // the interleave's low bits and never influences file splits
        floor(raw.cast("long") * lit(((1L << bits) - 1).toDouble / ds.length))
          .cast("long")
      }
    }
    val zc = "__graft_zvalue"
    // bucket ids are in [0, 2^bits - 1] (at most 2^bits - 1 boundaries),
    // so `bits` interleave bits cover them exactly
    df.withColumn(zc, zValue(
        bucket(colA, bounds(0)), bucket(colB, bounds(1)), bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
