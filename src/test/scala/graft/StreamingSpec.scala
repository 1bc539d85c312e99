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

  test("sliding windows: each event lands in 4 windows") {
    val total = EventStreams.slidingCounts(events).agg(sum("n")).head.getLong(0)
    assert(total === events.count() * 4)
  }
}
