package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

class DedupUpsertSinkSpec extends SparkSuite {
  import spark.implicits._

  test("dedupUpsertBatch: in-batch + cross-batch dedup, keep-first, retry idempotent") {
    val dir = Files.createTempDirectory("upsert").toString + "/snap"
    val b0 = Seq((1L, "a"), (2L, "b"), (2L, "b-dup"), (3L, "c")).toDF("event_id", "v")
    EventStreams.dedupUpsertBatch(spark, b0, dir, Seq("event_id"), 0L)
    def snap = spark.read.parquet(dir)
    assert(snap.count() === 3) // in-batch duplicate of 2 collapsed
    // batch 1 re-delivers id 2 with a different payload and adds id 4
    val b1 = Seq((2L, "redelivered"), (4L, "d")).toDF("event_id", "v")
    EventStreams.dedupUpsertBatch(spark, b1, dir, Seq("event_id"), 1L)
    assert(snap.count() === 4)
    // keep-first: id 2 still carries batch-0's payload, exactly once
    val row2 = snap.filter(col("event_id") === 2L).collect()
    assert(row2.length === 1 && row2.head.getAs[String]("v").startsWith("b"))
    // RETRY of batch 1 (failure-replay): snapshot must not change
    EventStreams.dedupUpsertBatch(spark, b1, dir, Seq("event_id"), 1L)
    assert(snap.count() === 4)
    assert(snap.filter(col("event_id") === 4L).count() === 1)
  }

  test("streaming end-to-end: two micro-batches with overlap land exactly once") {
    val root = Files.createTempDirectory("upsert_e2e").toString
    val in = s"$root/in"; val out = s"$root/snap"; val ckpt = s"$root/ckpt"
    val schema = Seq((0L, "x")).toDF("event_id", "v").schema
    // two input files + maxFilesPerTrigger=1 → two micro-batches
    Seq((1L, "a"), (2L, "b")).toDF("event_id", "v")
      .coalesce(1).write.parquet(s"$in/f0")
    Seq((2L, "b-replay"), (3L, "c")).toDF("event_id", "v")
      .coalesce(1).write.parquet(s"$in/f1")
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    val q = EventStreams.dedupUpsertStream(src, out, Seq("event_id"), ckpt)
    try q.processAllAvailable() finally q.stop()
    val snap = spark.read.parquet(out)
    assert(snap.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(snap.filter(col("event_id") === 2L).count() === 1)
    // at least two distinct batch partitions were written
    assert(snap.select(countDistinct(col("batch"))).head.getLong(0) >= 2)
  }
}
