package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming trending top-k (q142's streaming twin): the append-mode
  * windowed count + foreachBatch rank recipe reproduces the batch
  * ranking exactly for every window the watermark closes, across
  * micro-batch boundaries. */
class TrendingStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("stream == batch for closed windows, ranked across micro-batches") {
    val root = Files.createTempDirectory("trending").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    // window 10:00: a×3, b×2, c×1 → ranks a,b,c; window 11:00: b×2, c×2
    // → ranks b,c (tie → type order); window 12:00 only pushes the
    // watermark past 11:00 and itself never closes
    val w10 = Seq(("a", 0), ("a", 5), ("b", 10), ("a", 20), ("b", 40), ("c", 55))
    val w11 = Seq(("b", 60), ("c", 65), ("c", 100), ("b", 110))
    val sentinel = Seq(("z", 125))
    def df(rows: Seq[(String, Int)]) =
      rows.map { case (t, m) => (ts(m), t) }.toDF("ts", "event_type")
    // two real batches + the sentinel batch that closes window 11:00
    df(w10).coalesce(1).write.parquet(s"$in/f0")
    df(w11).coalesce(1).write.parquet(s"$in/f1")
    df(sentinel).coalesce(1).write.parquet(s"$in/f2")
    val src = spark.readStream.schema(df(w10).schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
    val q = EventStreams.trendingTopKStream(src, k = 2, out, ckpt,
      windowDur = "1 hour", watermark = "0 seconds")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out)
      .select(col("w_start"), col("event_type"), col("cnt"), col("rn"))
    // batch twin over the SAME data, restricted to windows the stream
    // closed (everything before the sentinel's window)
    val batch = EventStreams.trendingTopK(df(w10 ++ w11 ++ sentinel), k = 2)
      .filter(col("w_start") < ts(120))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.collect().mkString(",")} batch=${batch.collect().mkString(",")}")
    // the open window (the sentinel's own) must NOT be in the sink
    assert(streamed.filter(col("w_start") >= ts(120)).count() == 0)
  }
}
