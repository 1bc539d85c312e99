package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Streaming EWMA anomaly twin: the identical integer recurrence with a
  * single (ew, seeded) pair in the state store must reproduce the batch
  * operator row-for-row — both in a single micro-batch and with state
  * carried across two time-ordered micro-batches. */
class EwmaStreamSpec extends SparkSuite {
  import spark.implicits._

  private def purchases = Tables(spark, sfDir, "events")
    .filter(col("event_type") === "purchase")

  private def asValEv(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("event_id"), col("ts"),
      floor(col("value") * 1000000 + 0.5).cast("long").as("x"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Boolean)] =
    df.select("user_id", "event_id", "x", "ewma_prev", "anomaly").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3), r.getBoolean(4))
    }.toSet

  test("streaming EWMA == batch operator, state carried across micro-batches") {
    val expected = rows(graft.operators.TimeSeries.ewmaAnomalies(
      purchases, "user_id", "ts", "event_id", floor(col("value") * 1000000 + 0.5)))
    assert(expected.nonEmpty)

    val ev = asValEv(purchases)
    val cut = "2024-01-15"
    val root = Files.createTempDirectory("ewma_stream").toString
    val in = s"$root/in"
    // micro-batch 1: everything before the cut (time-ordered feed)
    ev.filter(col("ts") < cut).coalesce(1).write.parquet(s"$in/f0")
    val src = spark.readStream.schema(ev.schema).parquet(s"$in/*")
    val q = EventStreams.ewmaAnomalyStream(src.as[EventStreams.ValEv])
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("ewma_stream")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("ewma_stream").count()
      assert(afterB1 > 0, "first micro-batch must emit rows")
      // micro-batch 2: the rest — per-key state must carry over
      ev.filter(col("ts") >= cut).coalesce(1).write.parquet(s"$in/f1")
      q.processAllAvailable()
      assert(spark.table("ewma_stream").count() > afterB1, "second micro-batch must emit")
    } finally q.stop()
    assert(rows(spark.table("ewma_stream")) == expected,
      "streamed recurrence must equal the batch operator exactly")
  }
}
