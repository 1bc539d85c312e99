package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Batch-equivalence contract for the streaming operators (SURVEY §7.2
  * M4): replaying the batch events table through a real file-source
  * stream yields the same aggregates as running the identical transform
  * in batch. */
class StreamingSpec extends SparkSuite {
  private lazy val events = Tables(spark, sfDir, "events").cache()

  test("tumbling hourly: stream replay == batch") {
    val streamed = EventStreams.replayThroughStream(
      spark, events, EventStreams.tumblingHourly, "tumbling_mem")
    val batch = EventStreams.tumblingHourly(events)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows: stream replay == batch; sessions respect the gap") {
    val streamed = EventStreams.replayThroughStream(
      spark, events, EventStreams.sessionWindows, "sessions_mem")
    val batch = EventStreams.sessionWindows(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // native session windows agree with the lag-based batch count (q23)
    val nativeCounts = batch.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val lagBased = SparkEntry.queries("q23_sessionize")(spark, sfDir)
    assert(nativeCounts.join(lagBased, "user_id")
      .filter(nativeCounts("n_sessions") =!= lagBased("n_sessions")).count() === 0)
  }

  test("stateful session counts (mapGroupsWithState) == q23 on one batch") {
    import spark.implicits._
    val evs = events.select(col("user_id"), col("ts")).as[EventStreams.Ev]
    val got = EventStreams.statefulSessionCounts(evs)
      .toDF("user_id", "n_sessions", "n_events")
    val expect = SparkEntry.queries("q23_sessionize")(spark, sfDir)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("late data beyond the watermark is dropped (append mode)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("late").toString
    val onTime = events.filter(col("event_id") < 500)
    val maxTs = onTime.agg(max("ts")).head.getTimestamp(0)
    // one event 2 hours older than the stream's max — far beyond the
    // 10-minute watermark once batch 1 advances it
    val late = events.filter(col("event_id") === 999)
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime - 2 * 3600 * 1000)))

    onTime.write.parquet(s"$dir/in/b1")
    val src = spark.readStream.schema(events.schema).parquet(s"$dir/in/*")
    val q = EventStreams.tumblingHourly(src).writeStream
      .outputMode("append")
      .format("memory").queryName("late_mem")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable() // batch 1: watermark advances to maxTs - 10min
      late.write.mode("append").parquet(s"$dir/in/b2")
      q.processAllAvailable() // batch 2: the late event must be discarded
      // a third empty-ish batch lets closed windows flush in append mode
      events.filter(col("event_id") === 0).write.mode("append").parquet(s"$dir/in/b3")
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("late_mem")
    val lateHour = new java.sql.Timestamp(
      (maxTs.getTime - 2 * 3600 * 1000) / 3600000 * 3600000)
    val lateType = late.select("event_type").head.getString(0)
    // the late event's (hour, type) cell must not include its contribution:
    // compare against batch-over-onTime (which excludes the late row)
    val batchCell = EventStreams.tumblingHourly(onTime)
      .filter(col("hour_start") === lateHour && col("event_type") === lateType)
      .select("n").collect().map(_.getLong(0)).headOption.getOrElse(0L)
    val streamCell = emitted
      .filter(col("hour_start") === lateHour && col("event_type") === lateType)
      .select("n").collect().map(_.getLong(0)).headOption.getOrElse(0L)
    assert(streamCell <= batchCell, "late event leaked into a closed window")
  }

  test("observe counters: fed rows are accounted and exactly K late rows are dropped") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("obs").toString
    val onTime = events.filter(col("event_id") < 500)
    val onTimeCount = onTime.count()
    val maxTs = onTime.agg(max("ts")).head.getTimestamp(0)
    val lateK = 7
    // K events, the i-th one (2+i) hours older than the stream's max —
    // all far beyond the 10-minute watermark once batch 1 advances it.
    // Each gets its OWN tumbling window: numRowsDroppedByWatermark
    // counts state-operator input rows, which sit downstream of the
    // map-side partial aggregate — co-windowed late rows would merge
    // before the counter. One window per row makes the group-level
    // metric equal the fed row count exactly.
    val lateW = org.apache.spark.sql.expressions.Window.orderBy("event_id")
    val late = events.filter(col("event_id") >= 500).orderBy("event_id").limit(lateK)
      .withColumn("i", row_number().over(lateW))
      .withColumn("ts", expr(s"timestamp_millis(${maxTs.getTime} - (2 + i) * 3600000L)"))
      .drop("i")
    assert(late.count() === lateK)

    onTime.write.parquet(s"$dir/in/b1")
    val src = spark.readStream.schema(events.schema).parquet(s"$dir/in/*")
    val q = EventStreams.tumblingHourly(
        EventStreams.withInputCounter(src, "obs_input")).writeStream
      .outputMode("append")
      .format("memory").queryName("obs_mem")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable() // batch 1: watermark advances to maxTs - 10min
      late.write.mode("append").parquet(s"$dir/in/b2")
      q.processAllAvailable() // batch 2: all K late rows must be discarded
      // every fed row is visible to the observe counter (drops happen
      // downstream of it, at the stateful operator)
      assert(EventStreams.observedRowCount(q, "obs_input") === onTimeCount + lateK)
      // and the state operator reports EXACTLY the K late rows dropped
      assert(EventStreams.droppedByWatermark(q) === lateK)
    } finally q.stop()
  }

  test("streaming dedup: replayed duplicates collapse to one row each") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("sdedup").toString
    val batch = events.filter(col("event_id") < 200)
    batch.write.parquet(s"$dir/in/b1")
    batch.write.mode("append").parquet(s"$dir/in/b2") // full duplicate replay
    val src = spark.readStream.schema(events.schema).parquet(s"$dir/in/*")
    val q = EventStreams.streamingDedup(src, Seq("event_id")).writeStream
      .outputMode("append")
      .format("memory").queryName("sdedup_mem")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sdedup_mem")
    assert(out.count() === batch.count(), "each duplicated event must appear exactly once")
    assert(out.select("event_id").distinct().count() === batch.count())
  }

  test("stream-stream interval join: replay == batch join") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ssjoin").toString
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")
    views.write.parquet(s"$dir/v"); purchases.write.parquet(s"$dir/p")
    val vs = spark.readStream.schema(events.schema).parquet(s"$dir/v")
    val ps = spark.readStream.schema(events.schema).parquet(s"$dir/p")
    val q = EventStreams.viewPurchaseAttribution(vs, ps).writeStream
      .outputMode("append")
      .format("memory").queryName("ssjoin_mem")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssjoin_mem")
    val batch = EventStreams.viewPurchaseAttribution(views, purchases)
    assert(streamed.count() > 0, "fixture should produce at least one attribution")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER interval join: unmatched purchases emit " +
      "null view_id once the watermark passes") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ssouter").toString
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")
    views.write.parquet(s"$dir/v"); purchases.write.parquet(s"$dir/p")
    val vs = spark.readStream.schema(events.schema).parquet(s"$dir/v")
    val ps = spark.readStream.schema(events.schema).parquet(s"$dir/p")
    val q = EventStreams.viewPurchaseAttributionOuter(vs, ps).writeStream
      .outputMode("append")
      .format("memory").queryName("ssouter_mem")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // outer rows for the tail of the fixture can only emit once the
      // watermark moves past their join interval: append one far-future
      // sentinel event (excluded from the comparison) to BOTH sources
      val maxTs = events.agg(max("ts")).head.getTimestamp(0)
      val sentinel = events.limit(1)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 4 * 3600 * 1000)))
      sentinel.write.mode("append").parquet(s"$dir/v")
      sentinel.write.mode("append").parquet(s"$dir/p")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ssouter_mem").filter(col("user_id") =!= -1L)
    val batch = EventStreams.viewPurchaseAttributionOuter(views, purchases)
    assert(streamed.filter(col("view_id").isNull).count() > 0,
      "fixture should contain at least one direct purchase")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("sliding windows: each event lands in 4 windows") {
    val total = EventStreams.slidingCounts(events).agg(sum("n")).head.getLong(0)
    assert(total === events.count() * 4)
  }

  test("sliding windows: stream replay == batch") {
    val streamed = EventStreams.replayThroughStream(
      spark, events, EventStreams.slidingCounts, "sliding_mem")
    val batch = EventStreams.slidingCounts(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("flatMapGroupsWithState emits exactly the non-final sessions") {
    import spark.implicits._
    val evs = events.select(col("user_id"), col("ts")).as[EventStreams.Ev]
    val closed = EventStreams.closedSessions(evs)
      .groupByKey(_.user_id).count().toDF("user_id", "n_closed")
    // every session except the still-open last one is emitted, so
    // n_closed == q23's n_sessions - 1 for every user
    val expect = SparkEntry.queries("q23_sessionize")(spark, sfDir)
      .select(col("user_id"), (col("n_sessions") - 1).as("n_closed"))
      .filter(col("n_closed") > 0)
    assert(closed.exceptAll(expect).isEmpty && expect.exceptAll(closed).isEmpty)
  }

  test("EventTimeTimeout flushes the final open session of a quiet user on watermark advance") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("sessflush").toString
    def ev(user: Long, sec: Long) = EventStreams.Ev(user, new java.sql.Timestamp(sec * 1000))
    // phase 1: user 1 has one session (t=1000..1200), then goes quiet —
    // under the NoTimeout variant this session would never be emitted
    Seq(ev(1, 1000), ev(1, 1200)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
    val src = spark.readStream.schema(
      org.apache.spark.sql.Encoders.product[EventStreams.Ev].schema).parquet(s"$dir/in")
    val q = EventStreams.closedSessionsStreaming(src.as[EventStreams.Ev]).writeStream
      .outputMode("append").format("memory").queryName("sessflush_mem")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sessflush_mem").isEmpty,
        "session must stay open while the watermark is behind its expiry")
      // phase 2: an unrelated user far in the future advances the
      // watermark (100000-600s) past user 1's expiry (1200+1800) —
      // user 1's session must flush WITHOUT any further user-1 event
      Seq(ev(2, 100000)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val afterP2 = spark.table("sessflush_mem").as[EventStreams.ClosedSession].collect()
      assert(afterP2.toSet === Set(EventStreams.ClosedSession(1, 1000, 1200, 2)),
        afterP2.mkString(", "))
      // phase 3: watermark passes user 2's expiry too — its singleton
      // session flushes; every session is eventually emitted exactly once
      Seq(ev(3, 300000)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val afterP3 = spark.table("sessflush_mem").as[EventStreams.ClosedSession].collect()
      assert(afterP3.toSet === Set(
        EventStreams.ClosedSession(1, 1000, 1200, 2),
        EventStreams.ClosedSession(2, 100000, 100000, 1)), afterP3.mkString(", "))
    } finally q.stop()
  }

  test("in-watermark out-of-order event in a later batch must not regress the session end") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("sessooo").toString
    def ev(user: Long, sec: Long) = EventStreams.Ev(user, new java.sql.Timestamp(sec * 1000))
    // batch 1: session spans 100000..100100 (written before the stream
    // starts — the parquet source needs an existing path)
    Seq(ev(1, 100000), ev(1, 100100)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
    val src = spark.readStream.schema(
      org.apache.spark.sql.Encoders.product[EventStreams.Ev].schema).parquet(s"$dir/in")
    val q = EventStreams.closedSessionsStreaming(src.as[EventStreams.Ev]).writeStream
      .outputMode("append").format("memory").queryName("sessooo_mem")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      // batch 2: out-of-order event INSIDE the session, within the
      // 10-min lateness (watermark = 100100-600 = 99500 < 100050).
      // A last = t overwrite here would regress the session end.
      Seq(ev(1, 100050)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // batch 3: gap exceeded — the session closes with its TRUE bounds
      Seq(ev(1, 103000)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("sessooo_mem").as[EventStreams.ClosedSession].collect()
      assert(got.toSet === Set(EventStreams.ClosedSession(1, 100000, 100100, 3)),
        got.mkString(", "))
    } finally q.stop()
  }

  test("a null-timestamp-only batch must not disarm the pending session flush") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("sessnull").toString
    def ev(user: Long, sec: Long) = EventStreams.Ev(user, new java.sql.Timestamp(sec * 1000))
    Seq(ev(1, 1000), ev(1, 1200)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
    val src = spark.readStream.schema(
      org.apache.spark.sql.Encoders.product[EventStreams.Ev].schema).parquet(s"$dir/in")
    val q = EventStreams.closedSessionsStreaming(src.as[EventStreams.Ev]).writeStream
      .outputMode("append").format("memory").queryName("sessnull_mem")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      // a batch with ONLY a null-ts event for user 1: Spark clears the
      // group's timeout unless the function re-arms it — failing to do
      // so leaks the session forever
      Seq(EventStreams.Ev(1, null)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // unrelated user far ahead advances the watermark past expiry
      Seq(ev(2, 100000)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("sessnull_mem").as[EventStreams.ClosedSession].collect()
      assert(got.toSet === Set(EventStreams.ClosedSession(1, 1000, 1200, 2)),
        got.mkString(", "))
    } finally q.stop()
  }

  test("same-batch stragglers sessionize together instead of splitting into singletons") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("sessstrag").toString
    def ev(user: Long, sec: Long) = EventStreams.Ev(user, new java.sql.Timestamp(sec * 1000))
    // gap 300s, lateness 30 min: batch 1 opens (10000,10000); batch 2
    // carries in-watermark stragglers 8300+8400 (one session, >gap from
    // 10000) and 9800 (within gap of 10000 -> merges backward)
    Seq(ev(1, 10000)).toDS().toDF().write.mode("append").parquet(s"$dir/in")
    val src = spark.readStream.schema(
      org.apache.spark.sql.Encoders.product[EventStreams.Ev].schema).parquet(s"$dir/in")
    val q = EventStreams.closedSessionsStreaming(src.as[EventStreams.Ev],
        gapSeconds = 300, lateness = "30 minutes").writeStream
      .outputMode("append").format("memory").queryName("sessstrag_mem")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      // ONE file for the straggler trio: a multi-file append lands
      // non-atomically while the stream is live, so a trigger racing
      // the write can list a subset and process the stragglers across
      // two batches — a different (valid) streaming outcome than the
      // single-batch semantics this test pins
      Seq(ev(1, 8300), ev(1, 8400), ev(1, 9800)).toDS().toDF().coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("sessstrag_mem").as[EventStreams.ClosedSession].collect()
      // the straggler pair closes as ONE session; (9800,10000,2) stays open
      assert(got.toSet === Set(EventStreams.ClosedSession(1, 8300, 8400, 2)),
        got.mkString(", "))
    } finally q.stop()
  }

  test("closedSessionsStreaming agrees with the batch twin on sessions closed by data") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("sessbatcheq").toString
    val evs = events.select(col("user_id"), col("ts")).as[EventStreams.Ev]
    evs.toDF().write.parquet(s"$dir/in")
    val src = spark.readStream.schema(
      org.apache.spark.sql.Encoders.product[EventStreams.Ev].schema).parquet(s"$dir/in")
    val q = EventStreams.closedSessionsStreaming(src.as[EventStreams.Ev]).writeStream
      .outputMode("append").format("memory").queryName("sessbatcheq_mem")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    // after the data batch, the watermark advances to max(ts)-10min and a
    // no-data batch flushes every open session already past its expiry —
    // so streamed = (sessions closed by data) ∪ (expired open sessions):
    // a superset of the batch twin, a subset of full sessionization
    val streamed = spark.table("sessbatcheq_mem")
    val batch = EventStreams.closedSessions(evs).toDF()
    assert(streamed.count() > 0)
    assert(batch.exceptAll(streamed).isEmpty,
      "every data-closed session must be streamed")
    // full sessionization (final open sessions included), lag-based
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("t")
    val full = evs.toDF()
      .withColumn("t", col("ts").cast("long"))
      .withColumn("prev", lag("t", 1).over(w))
      .withColumn("new_sess", (col("prev").isNull || col("t") - col("prev") > 1800).cast("int"))
      .withColumn("sid", sum("new_sess").over(w))
      .groupBy("user_id", "sid")
      .agg(min("t").as("start_s"), max("t").as("end_s"), count(lit(1)).as("n_events"))
      .select("user_id", "start_s", "end_s", "n_events")
    assert(streamed.exceptAll(full).isEmpty,
      "streamed sessions must all be real sessions")
    val wmSec = evs.agg(max(col("ts").cast("long"))).head.getLong(0) - 600
    val extras = streamed.exceptAll(batch)
    assert(extras.count() > 0, "fixture should flush at least one open session")
    assert(extras.filter(col("end_s") + 1800 > wmSec).count() === 0,
      "only sessions past their expiry may be timeout-flushed")
    // completeness: every session safely past expiry was emitted
    assert(full.filter(col("end_s") + 1800 < wmSec - 1).exceptAll(streamed).isEmpty,
      "expired sessions must not linger in state")
  }

  test("stream-static broadcast enrichment: replay == batch, dimension rows attach") {
    val customer = Tables(spark, sfDir, "customer")
    val streamed = EventStreams.replayThroughStream(
      spark, events, EventStreams.enrichWithCustomer(_, customer), "enrich_mem",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = EventStreams.enrichWithCustomer(events, customer)
    assert(streamed.count() === events.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.filter(col("segment").isNotNull).count() > 0)
  }
}
