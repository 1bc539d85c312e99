package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.VersionedTable

/** Streaming read of the versioned table's commit log
  * (`readStream.format("graft-versioned")` —
  * [[graft.sources.GraftVersionedMicroBatchStream]]): offsets are
  * version numbers, a micro-batch delivers the dirs that entered the
  * manifest in its (start, end] window, and the checkpoint makes
  * delivery exactly-once across restarts. */
class GraftVersionedStreamSpec extends SparkSuite {
  import spark.implicits._

  test("commit-log streaming: appends delivered incrementally, exactly once " +
      "across restarts; an idle restart delivers nothing") {
    val root = Files.createTempDirectory("gvstream").toString
    val dir = s"$root/t"
    val outDir = s"$root/out"
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-versioned").load(dir)
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    def sinkIds(): Seq[Long] =
      try spark.read.parquet(outDir).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }

    VersionedTable.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text"),
      dir, "id", Seq("text"), 0L)
    runOnce()
    assert(sinkIds() == Seq(1L, 2L, 3L), "first run delivers the full v1 snapshot")

    VersionedTable.commit(Seq((4L, "d"), (5L, "e")).toDF("id", "text"),
      dir, "id", Seq("text"), 1L, mode = "append")
    VersionedTable.commit(Seq((6L, "f")).toDF("id", "text"),
      dir, "id", Seq("text"), 2L, mode = "append")
    runOnce()
    assert(sinkIds() == (1L to 6L),
      "restart delivers ONLY versions 2-3's appended dirs — v1 never re-read")

    runOnce() // no new commits
    assert(sinkIds() == (1L to 6L), "idle restart delivers nothing (exactly-once)")
  }

  test("rewrite guard: a mid-stream overwrite version fails the read by " +
      "default; ignoreChanges opts in to duplicate delivery (Delta semantics)") {
    val root = Files.createTempDirectory("gvstream3").toString
    val dir = s"$root/t"
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "text"),
      dir, "id", Seq("text"), 0L)
    def runOnce(ignoreChanges: Boolean, out: String, ckpt: String): Unit = {
      val r = spark.readStream.format("graft-versioned")
      val q = (if (ignoreChanges) r.option("ignoreChanges", "true") else r)
        .load(dir)
        .writeStream.outputMode("append")
        .format("parquet").option("path", s"$root/$out")
        .option("checkpointLocation", s"$root/$ckpt")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    runOnce(ignoreChanges = false, "out", "ckpt") // v1 creation: exempt
    // v2 is a REWRITE (compaction = overwrite): default must refuse
    VersionedTable.compact(spark, dir)
    val ex = intercept[Exception] { runOnce(ignoreChanges = false, "out", "ckpt") }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(ex).exists(e =>
        e.getMessage != null && e.getMessage.contains("ignoreChanges")),
      s"expected the rewrite-guard error naming ignoreChanges, got $ex")
    // with ignoreChanges: the rewrite's fresh dirs ARE delivered — the
    // surviving rows appear twice across the stream's lifetime, exactly
    // the documented duplicate-delivery choice
    runOnce(ignoreChanges = true, "out", "ckpt")
    val ids = spark.read.parquet(s"$root/out").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 1L, 2L, 2L), s"expected duplicate delivery, got $ids")
  }

  test("NATIVE STREAMING SINK: each micro-batch commits one stamped version " +
      "exactly-once across restarts; digests validate; idle restart is a no-op") {
    val root = Files.createTempDirectory("gvsink").toString
    val in = s"$root/in"
    val tbl = s"$root/t"
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, text STRING").parquet(in)
        .writeStream.outputMode("append")
        .format("graft-versioned")
        .option("path", tbl).option("idCol", "id")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    Seq((1L, "a"), (2L, "b")).toDF("id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    runOnce()
    assert(VersionedTable.currentVersion(spark, tbl) == 1L)
    assert(VersionedTable.validateAsOf(spark, tbl, 1L)._1,
      "streamed parquet bytes must digest-validate like any other commit")
    Seq((3L, "c")).toDF("id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    runOnce()
    assert(VersionedTable.currentVersion(spark, tbl) == 2L)
    assert(VersionedTable.read(spark, tbl).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(VersionedTable.validateAsOf(spark, tbl, 2L)._1)
    // manifests carry the epoch ids (the exactly-once watermark)
    val batchIds = VersionedTable.history(spark, tbl)
      .orderBy("version").collect().map(r => r.getAs[java.lang.Long]("batch_id"))
    assert(batchIds.forall(_ != null) && batchIds.distinct.length == 2)
    runOnce() // no new input: no version, no staging leftovers
    assert(VersionedTable.currentVersion(spark, tbl) == 2L)
    // the commit-log SOURCE reads what the sink wrote: loop closed
    val loopOut = s"$root/loopout"
    val q2 = spark.readStream.format("graft-versioned").load(tbl)
      .writeStream.outputMode("append")
      .format("parquet").option("path", loopOut)
      .option("checkpointLocation", s"$root/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    assert(spark.read.parquet(loopOut).count() == 3L)
  }

  test("streaming sink outputMode complete: each epoch OVERWRITES the " +
      "snapshot (the aggregate-table shape)") {
    val root = Files.createTempDirectory("gvsinkc").toString
    val in = s"$root/in"
    val tbl = s"$root/t"
    def runOnce(): Unit = {
      val agg = spark.readStream
        .schema("id LONG, text STRING").parquet(in)
        .groupBy(col("text")).agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode("complete")
        .format("graft-versioned")
        .option("path", tbl).option("idCol", "text")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    runOnce()
    assert(VersionedTable.read(spark, tbl).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == Set(("x", 2L), ("y", 1L)))
    Seq((4L, "x")).toDF("id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    runOnce()
    val lastMode = VersionedTable.history(spark, tbl)
      .orderBy(col("version").desc).head.getString(1)
    assert(lastMode == "overwrite", "complete mode must publish snapshot overwrites")
    assert(VersionedTable.read(spark, tbl).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == Set(("x", 3L), ("y", 1L)))
  }

  test("startingVersion skips history: a fresh checkpoint from v1 sees only later appends") {
    val root = Files.createTempDirectory("gvstream2").toString
    val dir = s"$root/t"
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "text"), dir, "id", Seq("text"), 0L)
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "text"),
      dir, "id", Seq("text"), 1L, mode = "append")
    val q = spark.readStream.format("graft-versioned")
      .option("startingVersion", "1").load(dir)
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val ids = spark.read.parquet(s"$root/out").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(2L), s"offset v1 means v1 already delivered, got $ids")
  }
}
