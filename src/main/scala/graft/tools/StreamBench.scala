// Sustained-throughput + latency record for the streaming surface:
//
//   sbt "runMain graft.tools.StreamBench [rowsPerSec] [runSec] [stateStore]"
//
// stateStore = hdfs (default) | rocksdb. The rocksdb variant swaps in
// RocksDBStateStoreProvider with changelog checkpointing — the
// standard remedy when the HDFSBacked (in-heap hashmap + full-snapshot
// checkpoint) store is the stateful ceiling: state moves off-heap,
// and per-batch checkpointing writes only the delta.
//
// Drives the rate source at a FIXED input rate through two
// representative pipelines — the watermarked tumbling-window aggregate
// (EventStreams.tumblingHourly's shape at 1-minute grain) and the
// stateful streaming dedup — and records, from the engine's own
// StreamingQueryProgress stream: sustained processedRowsPerSecond
// (p50/p95 across micro-batches after warmup), end-to-end batch
// latency (triggerExecution p50/p95/max), and watermark lag vs the
// newest event seen (p50/p95). One JSON line per pipeline; commit the
// output as BENCH_STREAM_r{N}.json.
//
// Methodology notes:
//  - the rate source emits (timestamp, value) rows at rowsPerSec with
//    no skew; event time = emission time, so watermark lag measures
//    pipeline-internal delay, not data lateness;
//  - the first warmupSec of progress events are dropped (stream start
//    + first-batch codegen);
//  - sustained throughput is per-batch processedRowsPerSecond, which
//    for a keeping-up pipeline oscillates around the input rate — a
//    p50 far below rowsPerSec means the pipeline can't keep up at
//    this rate on this box.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object StreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerSec = args.lift(0).map(_.toInt).getOrElse(200000)
    val runSec = args.lift(1).map(_.toInt).getOrElse(60)
    val stateStore = args.lift(2).getOrElse("hdfs")
    val warmupSec = 15
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("stream-bench")
    if (stateStore == "rocksdb") {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rate() = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec)
      .option("numPartitions", cpus.toInt)
      .load() // (timestamp TIMESTAMP, value LONG)

    // pipeline 1: watermarked tumbling-window count+sum per key band —
    // the EventStreams.tumblingHourly shape at 1-minute grain, keyed so
    // state is bounded (256 key bands × window)
    def windowed() = rate()
      .withWatermark("timestamp", "10 seconds")
      .groupBy(window(col("timestamp"), "1 minute"),
        (col("value") % 256).as("band"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))

    // pipeline 2: stateful exact dedup on (value % 1M) — dropDuplicates
    // with watermark-expired state, the streaming-dedup shape
    def dedup() = rate()
      .withWatermark("timestamp", "10 seconds")
      .select(col("timestamp"), (col("value") % 1000000).as("k"))
      .dropDuplicates("k", "timestamp")

    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0
      else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))

    for ((name, df, outputMode) <- Seq(
        ("windowed_agg", windowed(), "update"),
        ("stateful_dedup", dedup(), "append"))) {
      val q = df.writeStream.format("noop").outputMode(outputMode)
        .trigger(Trigger.ProcessingTime("1 second"))
        .queryName(s"bench_$name").start()
      val t0 = System.nanoTime()
      while ((System.nanoTime() - t0) / 1e9 < runSec) Thread.sleep(500)
      val progress = q.recentProgress.toSeq
      q.stop()
      // drop warmup; keep batches that actually processed rows
      val settled =
        if (progress.isEmpty) Seq.empty
        else {
          val startMs = java.time.Instant.parse(progress.head.timestamp).toEpochMilli
          progress.filter(p => java.time.Instant.parse(p.timestamp).toEpochMilli
            >= startMs + warmupSec * 1000L).filter(_.numInputRows > 0)
        }
      val thr = settled.map(_.processedRowsPerSecond)
      val lat = settled.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toDouble))
      val wmLag = settled.flatMap { p =>
        for {
          wm <- Option(p.eventTime.get("watermark"))
          mx <- Option(p.eventTime.get("max"))
          wmMs = java.time.Instant.parse(wm).toEpochMilli
          // batches before the first watermark advance report the 1970
          // initial watermark — a meaningless lag; drop them
          if wmMs > 1000000000000L
        } yield (java.time.Instant.parse(mx).toEpochMilli - wmMs).toDouble
      }
      val kept = settled.map(_.numInputRows).sum
      println(f"""{"pipeline":"$name","state_store":"$stateStore",""" +
        f""""rows_per_sec_in":$rowsPerSec,"run_sec":$runSec,""" +
        f""""batches":${settled.size},"rows_processed":$kept,""" +
        f""""throughput_p50":${pct(thr, 0.5)}%.0f,"throughput_p95":${pct(thr, 0.95)}%.0f,""" +
        f""""batch_ms_p50":${pct(lat, 0.5)}%.0f,"batch_ms_p95":${pct(lat, 0.95)}%.0f,""" +
        f""""batch_ms_max":${if (lat.isEmpty) -1.0 else lat.max}%.0f,""" +
        f""""watermark_lag_ms_p50":${pct(wmLag, 0.5)}%.0f,""" +
        f""""watermark_lag_ms_p95":${pct(wmLag, 0.95)}%.0f,""" +
        f""""keeping_up":${pct(thr, 0.5) >= rowsPerSec * 0.9}}""")
    }
    spark.stop()
  }
}
