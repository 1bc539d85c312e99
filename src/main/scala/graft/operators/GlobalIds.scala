package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contiguous global row numbering (1..N) in a caller-given total order
  * — the "assign every training example a stable integer id" step that
  * precedes sharding, packing, and example-level bookkeeping.
  *
  * The naive spelling — `row_number() OVER (ORDER BY …)` with no
  * PARTITION BY — is the canonical 100 TB trap: Spark moves the entire
  * relation into ONE partition to run the window (it even logs
  * "No Partition Defined for Window operation"). This operator produces
  * the identical answer with the classic two-phase shape every
  * distributed numbering uses (it is `RDD.zipWithIndex` re-expressed
  * over Datasets):
  *
  *  1. range-repartition on the order key + in-partition sort — the
  *     same exchange a global ORDER BY performs, so partition p holds
  *     exactly the rows ranked before partition p+1's;
  *  2. count rows per partition (one job; ≤ numParts scalar rows to
  *     the driver — bounded driver traffic, like the CC convergence
  *     checks in [[Dedup]]);
  *  3. gid = partition offset (a ≤ numParts-entry broadcast map) +
  *     1-based position within the already-sorted partition, emitted
  *     by ONE narrow `mapPartitions` pass — no further exchange.
  *
  * Step (3) is deliberately `mapPartitions`, not a window PARTITION BY
  * partition-id: Catalyst cannot see that the existing range
  * partitioning already satisfies a hash-by-pid distribution, so the
  * window spelling would re-shuffle the full relation a second time.
  * A per-partition running counter is the textbook "genuine
  * per-partition imperative logic" carve-out.
  *
  * The input is pinned with `localCheckpoint` between (1) and (3) so
  * the count job and the numbering job read the SAME materialized
  * partition boundaries (range partitioning samples its bounds; two
  * independent recomputations could disagree).
  *
  * The order must be TOTAL (pass a unique tiebreak column last): under
  * ties the in-partition sort would be free to permute tied rows
  * differently on each run.
  */
object GlobalIds {

  /** Adds `gidCol` (LONG, contiguous 1..N in `order`). `numParts` is
    * the parallelism of the numbering exchange — size it like any
    * range-sort output (≈ data / target-partition-size), NOT 1. */
  def assign(df: DataFrame, gidCol: String, numParts: Int, order: Column*): DataFrame = {
    require(order.nonEmpty, "global numbering needs a total order")
    // the partition id is BAKED INTO THE ROWS before the checkpoint —
    // TaskContext.getPartitionId inside mapPartitions would report the
    // id of whatever stage the map later fuses into, which need not be
    // the checkpoint's partition index
    val pidCol = "_gid_pid"
    val pinned = df
      .repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint()
    // ≤ numParts rows — scalar driver traffic, never data rows
    val counts = pinned
      .groupBy(pidCol).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val offB = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = df.schema.add(gidCol, LongType, nullable = false)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    pinned.mapPartitions { it =>
      var base = -1L
      var i = 0L
      it.map { r =>
        if (base < 0) base = offB.value(r.getInt(r.length - 1))
        i += 1
        Row.fromSeq(r.toSeq.init :+ (base + i))
      }
    }
  }

  /** Distributed PREFIX SUM: adds `cumCol` = the running total of
    * `valueCol` (inclusive) over the total order — `sum() OVER (ORDER
    * BY …)` without the single-partition window. Same two-phase shape
    * as [[assign]], with per-partition SUMS instead of counts as the
    * broadcast offsets. This is the shard-packing primitive: cutting a
    * corpus into ~fixed-token output shards is
    * `floor((cum - value) / shardSize)` over the cumulative column.
    * `valueCol` must be integral (LONG) — integer sums are
    * order-independent, so the result is bit-stable (the q91 idiom). */
  def prefixSum(df: DataFrame, valueCol: String, cumCol: String,
      numParts: Int, order: Column*): DataFrame = {
    require(order.nonEmpty, "prefix sum needs a total order")
    val pidCol = "_gid_pid"
    val pinned = df
      // the LONG cast is baked into the MATERIALIZED rows: the executor
      // scan below reads getLong, which would ClassCast on an INT input
      // that the driver-side agg (with its own cast) happily accepted
      .withColumn(valueCol, col(valueCol).cast("long"))
      .repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint()
    val vIdx = pinned.schema.fieldIndex(valueCol)
    // ≤ numParts scalar rows to the driver
    val sums = pinned.groupBy(pidCol)
      .agg(sum(col(valueCol).cast("long")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.map(_._1).zip(sums.scanLeft(0L)(_ + _._2).init).toMap
    val offB = df.sparkSession.sparkContext.broadcast(offsets)
    // from the PINNED schema (minus pid): valueCol is LONG there even
    // when the input declared INT — the output widens with it
    val outSchema = org.apache.spark.sql.types.StructType(
      pinned.schema.fields.init).add(cumCol, LongType, nullable = false)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    pinned.mapPartitions { it =>
      var base = -1L
      var run = 0L
      it.map { r =>
        if (base < 0) base = offB.value(r.getInt(r.length - 1))
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq.init :+ (base + run))
      }
    }
  }

  /** Distributed EXCLUSIVE PREFIX MAX: adds `cumCol` = max of
    * `valueCol` over STRICTLY PRECEDING rows in the total order (NULL
    * for the global first row) — `max() OVER (ORDER BY … ROWS BETWEEN
    * UNBOUNDED PRECEDING AND 1 PRECEDING)` without the
    * single-partition window. Same three-phase shape as [[prefixSum]]:
    * ONE range exchange, per-partition maxes to the driver (≤ numParts
    * scalars), broadcast exclusive-prefix offsets + a narrow scan.
    * Exclusive (unlike the inclusive [[prefixSum]]) because its
    * consumer — the Pareto/skyline filter (q143) — compares each row
    * against its predecessors only; max is idempotent so there is no
    * inclusive/exclusive arithmetic trick, the scan just emits before
    * folding. `valueCol` must be integral (LONG). */
  def prefixMax(df: DataFrame, valueCol: String, cumCol: String,
      numParts: Int, order: Column*): DataFrame = {
    require(order.nonEmpty, "prefix max needs a total order")
    val pidCol = "_gid_pid"
    val pinned = df
      // LONG pinned into the materialized rows (see [[prefixSum]])
      .withColumn(valueCol, col(valueCol).cast("long"))
      .repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint()
    val vIdx = pinned.schema.fieldIndex(valueCol)
    // ≤ numParts scalar rows to the driver (empty partitions absent —
    // they contribute nothing to any prefix)
    val maxs = pinned.groupBy(pidCol)
      .agg(max(col(valueCol).cast("long")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Option[Long]] = maxs.map(_._1)
      .zip(maxs.scanLeft(Option.empty[Long]) { case (acc, (_, m)) =>
        Some(acc.fold(m)(math.max(_, m)))
      }.init).toMap
    val offB = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = org.apache.spark.sql.types.StructType(
      pinned.schema.fields.init).add(cumCol, LongType, nullable = true)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    pinned.mapPartitions { it =>
      var init = false
      var cur: Option[Long] = None
      it.map { r =>
        if (!init) { cur = offB.value(r.getInt(r.length - 1)); init = true }
        val before = cur
        val v = r.getLong(vIdx)
        cur = Some(cur.fold(v)(math.max(_, v)))
        Row.fromSeq(r.toSeq.init :+ before.map(java.lang.Long.valueOf).orNull)
      }
    }
  }

  /** GROUP-scoped prefix sum: [[prefixSum]] restarted per `grpCol`
    * value — running token totals per language/source without the
    * per-group-window funnel (PARTITION BY grp puts each group's whole
    * corpus-sized slice in ONE task when groups are few, which is
    * exactly the mixing-recipe case: ~dozens of groups over billions of
    * rows). Same three-phase shape: ONE range exchange on
    * (grp, order…), per-(partition, group) sums to the driver (≤
    * numParts + nGroups scalar rows — partition boundaries cut at most
    * one group each), broadcast offsets + one narrow mapPartitions with
    * a per-group running counter. `cumCol` is the INCLUSIVE cumulative
    * within the row's group.
    *
    * DRIVER BOUND: because the exchange is RANGE partitioning on
    * (grp, order…), each partition holds a contiguous key slice, so the
    * offset table is ≤ numParts + nGroups entries — NOT numParts ×
    * nGroups — regardless of group skew. The helper is therefore sized
    * for the mixing-recipe regime (dozens-to-thousands of groups); a
    * guard rejects a pathological table (> 4M entries ≈ hundreds of MB
    * of driver heap) with instructions rather than OOMing the driver —
    * at that scale use a per-group window (each group is tiny) or a
    * join-based offset attach instead. */
  def prefixSumBy(df: DataFrame, grpCol: String, valueCol: String, cumCol: String,
      numParts: Int, order: Column*): DataFrame = {
    require(order.nonEmpty, "prefix sum needs a total order within each group")
    val pidCol = "_gid_pid"
    val pinned = df
      // LONG pinned into the materialized rows (see [[prefixSum]])
      .withColumn(valueCol, col(valueCol).cast("long"))
      .repartitionByRange(numParts, col(grpCol) +: order: _*)
      .sortWithinPartitions(col(grpCol) +: order: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint()
    val vIdx = pinned.schema.fieldIndex(valueCol)
    val gIdx = pinned.schema.fieldIndex(grpCol)
    val sums = pinned.groupBy(col(pidCol), col(grpCol))
      .agg(sum(col(valueCol).cast("long")).as("s"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    require(sums.length <= 4000000,
      s"prefixSumBy offset table has ${sums.length} (partition, group) entries " +
        "(range partitioning bounds this by numParts + nGroups — this input has " +
        "too many groups for driver-broadcast offsets); use a per-group window " +
        "or a join-based offset attach instead")
    val offsets: Map[(Int, Any), Long] = sums.groupBy(_._2).iterator.flatMap {
      case (g, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.map(_._1).zip(byPid.scanLeft(0L)(_ + _._3).init).map {
          case (pid, off) => (pid, g) -> off
        }
    }.toMap
    val offB = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = org.apache.spark.sql.types.StructType(
      pinned.schema.fields.init).add(cumCol, LongType, nullable = false)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    pinned.mapPartitions { it =>
      val run = scala.collection.mutable.HashMap.empty[Any, Long]
      it.map { r =>
        val pid = r.getInt(r.length - 1)
        val g = r.get(gIdx)
        val base = run.getOrElseUpdate(g, offB.value((pid, g)))
        val cum = base + r.getLong(vIdx)
        run(g) = cum
        Row.fromSeq(r.toSeq.init :+ cum)
      }
    }
  }
}
