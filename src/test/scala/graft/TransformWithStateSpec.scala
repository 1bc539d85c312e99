package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams
import graft.streaming.EventStreams.HashedDoc

/** The Spark-4 `transformWithState` surface ([[EventStreams
  * .firstSeenStream]]): first-seen dedup whose state survives a QUERY
  * RESTART through the checkpoint, on the RocksDB state store the API
  * requires. Runs under Trigger.AvailableNow (a continuously-running
  * TWS query schedules no-data maintenance batches forever, which a
  * test must not sit inside) into the exactly-once FILE sink (the
  * memory sink refuses checkpoint recovery). */
class TransformWithStateSpec extends SparkSuite {
  import spark.implicits._

  private def runRestart(name: String, ttlMillis: Long): (Set[(String, Long)], Set[(String, Long)]) = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory(s"tws_$name").toString
      def sink(): Set[(String, Long)] =
        try spark.read.parquet(s"$root/out")
          .as[HashedDoc].collect().map(h => (h.content_hash, h.doc_id)).toSet
        catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
      // TimeMode.None queries self-terminate under AvailableNow; a
      // ProcessingTime (TTL) query keeps scheduling state-maintenance
      // batches and never drains — so wait on the SINK, not on
      // termination, then stop
      def runOnce(expectRows: Int): Unit = {
        val q = EventStreams.firstSeenStream(
            spark.readStream.schema(Seq.empty[HashedDoc].toDF().schema)
              .parquet(s"$root/in/*").as[HashedDoc], ttlMillis)
          .toDF().writeStream.outputMode("append")
          .format("parquet").option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        try {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (sink().size < expectRows && q.isActive && System.nanoTime() < deadline)
            Thread.sleep(500)
          assert(sink().size >= expectRows,
            s"sink never reached $expectRows rows (query active=${q.isActive})")
        } finally q.stop()
      }
      // run 1: A twice in ONE batch (ids 3 and 1 — lowest must win), B once
      Seq(HashedDoc("A", 3L), HashedDoc("A", 1L), HashedDoc("B", 2L))
        .toDF().coalesce(1).write.parquet(s"$root/in/f0")
      runOnce(expectRows = 2)
      val out1 = sink()
      // run 2, SAME checkpoint: A again (state restored from the
      // checkpoint must suppress it) + new C
      Seq(HashedDoc("A", 4L), HashedDoc("C", 5L))
        .toDF().coalesce(1).write.parquet(s"$root/in/f1")
      runOnce(expectRows = 3)
      (out1, sink())
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("first-seen gate: in-batch dups resolve to the lowest id; state " +
      "survives a query restart via the checkpoint (TimeMode.None, no TTL)") {
    val (out1, outAll) = runRestart("plain", 0L)
    assert(out1 === Set(("A", 1L), ("B", 2L)),
      "in-batch duplicate must resolve to the lowest doc_id")
    assert(outAll === Set(("A", 1L), ("B", 2L), ("C", 5L)),
      "restored state must suppress the re-seen hash; only the new one emits")
  }

  test("TTL-configured path (ProcessingTime mode) behaves identically while " +
      "the TTL has not elapsed") {
    val (out1, outAll) = runRestart("ttl", 10L * 60L * 1000L)
    assert(out1 === Set(("A", 1L), ("B", 2L)))
    assert(outAll === Set(("A", 1L), ("B", 2L), ("C", 5L)))
  }
}
