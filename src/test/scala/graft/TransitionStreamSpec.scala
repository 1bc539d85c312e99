package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Streaming next-event-transition twin (q161's lead(1) pairing): one
  * carried last-type per user must reproduce the batch successor
  * relation row-for-row, in one micro-batch and with state carried
  * across two time-ordered micro-batches. */
class TransitionStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ev = Tables(spark, sfDir, "events")
    .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))

  // the batch successor relation as a multiset (duplicate transitions count)
  private def batchPairs: Map[(Long, String, String), Long] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sec", "event_id")
    ev.withColumn("sec", unix_timestamp(col("ts")))
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("user_id", "from_type", "to_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
  }

  private def streamedPairs(table: String): Map[(Long, String, String), Long] =
    spark.table(table)
      .groupBy("user_id", "from_type", "to_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap

  test("streaming transitions == batch lead(1), state carried across micro-batches") {
    val expected = batchPairs
    assert(expected.nonEmpty)
    val root = Files.createTempDirectory("tr_stream").toString
    val in = s"$root/in"
    val cut = "2024-01-15"
    ev.filter(col("ts") < cut).coalesce(1).write.parquet(s"$in/f0")
    val src = spark.readStream.schema(ev.schema).parquet(s"$in/*")
    val q = EventStreams.transitionStream(src.as[EventStreams.TrEv])
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("tr_stream")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("tr_stream").count()
      assert(afterB1 > 0, "first micro-batch must emit transitions")
      ev.filter(col("ts") >= cut).coalesce(1).write.parquet(s"$in/f1")
      q.processAllAvailable()
      assert(spark.table("tr_stream").count() > afterB1,
        "second micro-batch must emit — including the cross-boundary transition")
    } finally q.stop()
    assert(streamedPairs("tr_stream") == expected,
      "streamed successor relation must equal the batch window exactly")
  }
}
