package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Merge
import graft.streaming.EventStreams

/** Streaming LSM-style log compaction: latest-op-wins with tombstones
  * across micro-batches, out-of-order arrival resolved by the op order
  * (not arrival order), retries idempotent. */
class CompactUpsertSinkSpec extends SparkSuite {
  import spark.implicits._

  private val ord = Seq("seq")

  test("cross-batch latest-wins with tombstones; out-of-order and retry safe") {
    val dir = Files.createTempDirectory("compact").toString + "/log"
    // batch 0: k1 set, k2 set, k3 set-then-delete (in-batch compaction)
    val b0 = Seq((1L, 1L, "U", "a1"), (2L, 2L, "U", "b1"),
      (3L, 3L, "U", "c1"), (3L, 4L, "D", "-")).toDF("k", "seq", "op", "v")
    EventStreams.compactUpsertBatch(b0, dir, "k", ord, 0L)
    def state = EventStreams.compactedState(spark, dir, "k", "op", "D", ord)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "a1", 2L -> "b1"))
    // batch 1: update k1, delete k2, and a LATE op for k1 (seq 0 — must lose)
    val b1 = Seq((1L, 5L, "U", "a2"), (2L, 6L, "D", "-"), (1L, 0L, "U", "stale"))
      .toDF("k", "seq", "op", "v")
    EventStreams.compactUpsertBatch(b1, dir, "k", ord, 1L)
    assert(state == Map(1L -> "a2"))
    // RETRY of batch 1: state unchanged (overwrite-in-place)
    EventStreams.compactUpsertBatch(b1, dir, "k", ord, 1L)
    assert(state == Map(1L -> "a2"))
    // a resurrect AFTER a delete works (seq order, not arrival order)
    EventStreams.compactUpsertBatch(
      Seq((2L, 7L, "U", "b2")).toDF("k", "seq", "op", "v"), dir, "k", ord, 2L)
    assert(state == Map(1L -> "a2", 2L -> "b2"))
  }

  test("major compaction: state preserved, tombstones dropped, later ops still win") {
    val dir = Files.createTempDirectory("compact_major").toString + "/log"
    EventStreams.compactUpsertBatch(
      Seq((1L, 1L, "U", "a1"), (2L, 2L, "U", "b1"), (3L, 3L, "U", "c1"))
        .toDF("k", "seq", "op", "v"), dir, "k", ord, 0L)
    EventStreams.compactUpsertBatch(
      Seq((1L, 4L, "U", "a2"), (3L, 5L, "D", "-")).toDF("k", "seq", "op", "v"),
      dir, "k", ord, 1L)
    EventStreams.compactUpsertBatch(
      Seq((2L, 6L, "U", "b2")).toDF("k", "seq", "op", "v"), dir, "k", ord, 2L)
    def state = EventStreams.compactedState(spark, dir, "k", "op", "D", ord)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val before = state
    assert(before == Map(1L -> "a2", 2L -> "b2"))
    // fold batches 0..1 into the base; batch 2 stays above
    EventStreams.majorCompact(spark, dir, "k", "op", "D", ord, upToBatch = 1L)
    assert(state == before, "read state must be unchanged by major compaction")
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(dirs.toSeq == Seq("batch=1", "batch=2"), dirs.mkString(","))
    // tombstone winner (k=3) is physically gone from the base
    val base = spark.read.parquet(s"$dir/batch=1")
    assert(base.filter(col("k") === 3L).count() == 0, "tombstone must be dropped in the base")
    // later ops on top of the base still win
    EventStreams.compactUpsertBatch(
      Seq((1L, 7L, "D", "-")).toDF("k", "seq", "op", "v"), dir, "k", ord, 3L)
    assert(state == Map(2L -> "b2"))
    // the documented watermark caveat: an op BELOW the dropped tombstone's
    // ord arriving after the fold resurrects the key — fold only behind
    // the ord watermark
    EventStreams.compactUpsertBatch(
      Seq((3L, 4L, "U", "ghost")).toDF("k", "seq", "op", "v"), dir, "k", ord, 4L)
    assert(state(3L) == "ghost", "this is WHY tombstone GC needs the watermark")
  }

  test("streaming end-to-end equals one-shot compaction of the full log") {
    val root = Files.createTempDirectory("compact_e2e").toString
    val in = s"$root/in"; val out = s"$root/log"; val ckpt = s"$root/ckpt"
    val all = Seq(
      (1L, 1L, "U", "a1"), (2L, 2L, "U", "b1"),
      (1L, 3L, "U", "a2"), (2L, 4L, "D", "-"), (3L, 5L, "U", "c1"))
    val df = all.toDF("k", "seq", "op", "v")
    df.limit(2).coalesce(1).write.parquet(s"$in/f0")
    df.except(df.limit(2)).coalesce(1).write.parquet(s"$in/f1")
    val src = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
    val q = EventStreams.compactUpsertStream(src, out, "k", ord, ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = EventStreams.compactedState(spark, out, "k", "op", "D", ord)
      .select("k", "seq", "op", "v")
    val oneShot = Merge.compactLog(df, "k", "op", "D", ord)
      .select("k", "seq", "op", "v")
    assert(streamed.exceptAll(oneShot).isEmpty && oneShot.exceptAll(streamed).isEmpty)
  }
}
