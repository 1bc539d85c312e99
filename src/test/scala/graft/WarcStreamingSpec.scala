package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{VersionedTable, WarcSource}

/** The continuous crawl front door end-to-end: fetchers drop WARC
  * files into a landing directory; a micro-batch stream parses the
  * records, extracts main text, and lands each batch EXACTLY ONCE in
  * the versioned table. Restarting from the checkpoint picks up only
  * new files; the monotone-name offset contract is exercised both
  * ways (a new larger name is consumed, a stale smaller name is
  * ignored by design). */
class WarcStreamingSpec extends SparkSuite {
  import spark.implicits._

  private val cols = Seq("record_id", "warc_type", "target_uri", "content_type", "payload")

  private def recordsDf(ids: Range) =
    ids.map(i => (s"urn:graft:$i", "resource", s"https://x.com/doc/$i",
      "text/html", (s"<html><body><p>record $i body with enough words to " +
        s"survive the extraction length rule applied downstream</p>" +
        s"</body></html>").getBytes("UTF-8"))).toDF(cols: _*)

  /** Drop a WARC file into `landing` under a controlled, increasing name. */
  private def drop(landing: String, name: String, ids: Range): Unit = {
    val tmp = Files.createTempDirectory("warcdrop").toString
    WarcSource.writeRecords(recordsDf(ids).coalesce(1), tmp)
    val src = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".warc")).head
    java.nio.file.Files.copy(src.toPath, new java.io.File(landing, name).toPath)
  }

  test("landing-dir stream -> extract -> exactly-once versioned commits across restarts") {
    val landing = Files.createTempDirectory("warcland").toString
    val ckpt = Files.createTempDirectory("warcckpt").toString
    val table = Files.createTempDirectory("warctab").toString + "/t"
    drop(landing, "part-00001.warc", 1 to 5)

    def runOnce(): Unit = {
      val q = spark.readStream.format("warc-records").load(landing)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          // the pipeline stage: doc id from the target URI, text from the
          // payload — the q205 shape, per micro-batch
          val docs = b.select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
              .cast("long").as("id"),
            col("payload").cast("string").as("text"))
          VersionedTable.commitStreamBatch(docs, table, "id", Seq("text"), id): Unit
        }.start()
      q.awaitTermination()
    }

    runOnce()
    assert(VersionedTable.currentVersion(spark, table) == 1L)
    assert(VersionedTable.read(spark, table).count() == 5L)

    // second drop under a LARGER name: restart consumes only the delta
    drop(landing, "part-00002.warc", 6 to 8)
    runOnce()
    assert(VersionedTable.currentVersion(spark, table) == 2L)
    assert(VersionedTable.read(spark, table)
      .collect().map(_.getLong(0)).sorted.toSeq == (1L to 8L))
    // and the pre-drop table still time travels
    assert(VersionedTable.readAsOf(spark, table, 1L).count() == 5L)

    // a STALE name (below the committed offset) is ignored by design —
    // the documented monotone-name contract of the landing zone
    drop(landing, "part-00000.warc", 100 to 101)
    runOnce()
    assert(VersionedTable.currentVersion(spark, table) == 2L,
      "a lexically-stale drop must not produce a batch")

    // no-op run: no new files, no new version
    runOnce()
    assert(VersionedTable.currentVersion(spark, table) == 2L)
  }

  test("batch and streaming scans agree on the same landing directory") {
    val landing = Files.createTempDirectory("warcland2").toString
    drop(landing, "part-00001.warc", 1 to 4)
    drop(landing, "part-00002.warc", 5 to 6)
    val batch = WarcSource.read(spark, landing)
      .select("record_id").as[String].collect().sorted.toSeq
    val sink = new scala.collection.mutable.ArrayBuffer[String]()
    val q = spark.readStream.format("warc-records").load(landing)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        sink.synchronized { sink ++= b.select("record_id").as[String].collect() }: Unit
      }.start()
    q.awaitTermination()
    assert(sink.sorted.toSeq == batch && batch.size == 6)
  }
}
