package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Streaming event-pattern CEP (q215's stateful twin): cumulative
  * per-user completion counts must equal the batch full-journey count
  * under any micro-batch slicing — the reluctant-quantifier
  * prefix-stability contract — including a completion that spans the
  * batch boundary. */
class PatternStreamSpec extends SparkSuite {
  import spark.implicits._

  private val pat = "v[^e]*?c[^e]*?p"

  private def ev = Tables(spark, sfDir, "events")
    .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))

  // batch truth: non-overlapping completions over the full journey
  private def batchCounts: Map[Long, Long] = {
    ev.select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("code")).as("e"))
      .groupBy("user_id")
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        e => e.getField("code")), "").as("j"))
      .select(col("user_id"),
        size(regexp_extract_all(col("j"), lit(pat), lit(0))).cast("long").as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def streamTotals(table: String): Map[Long, Long] =
    spark.table(table).groupBy("user_id").agg(max("n_total").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streaming totals == batch counts, state carried across micro-batches") {
    val expected = batchCounts
    assert(expected.nonEmpty, "fixture must contain completed funnels")
    val root = Files.createTempDirectory("pat_stream").toString
    val in = s"$root/in"
    val cut = "2024-01-15"
    ev.filter(col("ts") < cut).coalesce(1).write.parquet(s"$in/f0")
    val src = spark.readStream.schema(ev.schema).parquet(s"$in/*")
    val q = EventStreams.patternMatchStream(src.as[EventStreams.TrEv])
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("pat_stream")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable()
      ev.filter(col("ts") >= cut).coalesce(1).write.parquet(s"$in/f1")
      q.processAllAvailable()
      assert(streamTotals("pat_stream") == expected)
    } finally q.stop()
  }

  test("checkpoint restart: state survives a stop/start, totals stay exact") {
    val root = Files.createTempDirectory("pat_restart").toString
    val in = s"$root/in"
    def rows(startId: Long, types: Seq[String]) =
      types.zipWithIndex.map { case (t, i) =>
        (3L, startId + i, new java.sql.Timestamp(1700000000000L + (startId + i) * 1000), t)
      }.toDF("user_id", "event_id", "ts", "event_type")
    val schema = "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING"
    val outDir = s"$root/out"
    // memory sinks cannot recover from a checkpoint; the recoverable
    // spelling is foreachBatch appending emissions to storage
    def start() = EventStreams.patternMatchStream(
        spark.readStream.schema(schema).parquet(s"$in/*").as[EventStreams.TrEv])
      .toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    // batch 1: one full completion + an open v..c tail, then STOP
    rows(0L, Seq("view", "click", "purchase", "view", "click"))
      .coalesce(1).write.parquet(s"$in/f0")
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint; batch 2 closes the carried tail
    rows(5L, Seq("purchase")).coalesce(1).write.parquet(s"$in/f1")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._3).toSeq
      // emission 1 pre-stop (1 completion, total 1); emission 2 after the
      // restart (1 new completion, cumulative total 2) — the carried
      // residual "vc" state closed across the restart
      assert(got == Seq((3L, 1L, 1L), (3L, 1L, 2L)))
    } finally q2.stop()
  }

  test("a completion spanning the batch boundary fires once, after the close") {
    val root = Files.createTempDirectory("pat_span").toString
    val in = s"$root/in"
    def rows(startId: Long, types: Seq[String]) =
      types.zipWithIndex.map { case (t, i) =>
        (7L, startId + i, new java.sql.Timestamp(1700000000000L + (startId + i) * 1000), t)
      }.toDF("user_id", "event_id", "ts", "event_type")
    rows(0L, Seq("view", "click")).coalesce(1).write.parquet(s"$in/f0")
    val schema = "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING"
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val q = EventStreams.patternMatchStream(src.as[EventStreams.TrEv])
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("pat_span")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("pat_span").count() == 0L, "open funnel must not fire")
      rows(2L, Seq("purchase", "view", "click", "purchase"))
        .coalesce(1).write.parquet(s"$in/f1")
      q.processAllAvailable()
      val got = spark.table("pat_span").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // one emission carrying BOTH completions: the boundary-spanning
      // v..c|..p and the fully-in-batch vcp
      assert(got == Seq((7L, 2L, 2L)))
    } finally q.stop()
  }

  test("TTL variant evicts residual AND total: the journey restarts (declared state loss)") {
    // transformWithState + TTLConfig (patternMatchStreamTtl): lazy
    // state expiry, so the query drains under Trigger.AvailableNow —
    // but a ProcessingTime-mode query still schedules maintenance
    // batches, so wait on the SINK, not on termination (the
    // TransformWithStateSpec recipe). RocksDB provider required.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("pat_ttl").toString
      val in = s"$root/in"
      val outDir = s"$root/out"
      def rows(user: Long, startId: Long, types: Seq[String]) =
        types.zipWithIndex.map { case (t, i) =>
          (user, startId + i, new java.sql.Timestamp(1700000000000L + (startId + i) * 1000), t)
        }.toDF("user_id", "event_id", "ts", "event_type")
      val schema = "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING"
      def sinkRows(): Seq[(Long, Long, Long)] =
        try spark.read.parquet(outDir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }
      def runOnce(expectRows: Int): Unit = {
        val q = EventStreams.patternMatchStreamTtl(
            spark.readStream.schema(schema).parquet(s"$in/*").as[EventStreams.TrEv],
            ttlMillis = 100L)
          .toDF().writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        try {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (sinkRows().size < expectRows && q.isActive && System.nanoTime() < deadline)
            Thread.sleep(250)
          assert(sinkRows().size >= expectRows,
            s"sink never reached $expectRows rows (query active=${q.isActive})")
        } finally q.stop()
      }
      // run 1: user 11 completes once and leaves an open "vc" tail
      rows(11L, 0L, Seq("view", "click", "purchase", "view", "click"))
        .coalesce(1).write.parquet(s"$in/f0")
      runOnce(expectRows = 1)
      // idle past the TTL, then user 11 re-appears: with the residual
      // evicted, this "purchase" does NOT close the pre-gap funnel —
      // only the sentinel user's fresh completion emits
      Thread.sleep(500L)
      (rows(11L, 20L, Seq("purchase"))
        union rows(50L, 30L, Seq("view", "click", "purchase")))
        .coalesce(1).write.parquet(s"$in/f1")
      runOnce(expectRows = 2)
      // user 11's fresh completion restarts n_total at 1, not 2
      rows(11L, 40L, Seq("view", "click", "purchase"))
        .coalesce(1).write.parquet(s"$in/f2")
      runOnce(expectRows = 3)
      val got = sinkRows().sorted
      assert(got == Seq((11L, 1L, 1L), (11L, 1L, 1L), (50L, 1L, 1L)),
        s"expected eviction to restart user 11's journey, got $got")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
