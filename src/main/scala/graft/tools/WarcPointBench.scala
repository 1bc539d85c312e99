package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the cdx offset index's point-access claim
  * ([[graft.sources.WarcSource.readAt]]): per-record gzip members plus
  * an offset index turn "fetch K documents out of an archive" from a
  * full decode pass into O(K) ranged reads — the Common Crawl access
  * pattern, and the contrast the round-11 prune record said gzip
  * honestly could not deliver without an index (decode-to-skip).
  *
  * Two legs over the same generated `.warc.gz` archive (~8 KiB
  * deterministic payloads, per-record members, cdx sibling files):
  *
  *  - `scan_filter`: the indexless spelling — full connector scan,
  *    `filter(record_id IN ...)`, payloads materialized for the hits;
  *    every member in the archive still inflates (decode-to-skip).
  *  - `point_readAt`: index join (ids broadcast) → seek + ranged read
  *    of exactly K member byte ranges → gunzip K members.
  *
  * Both legs return identical (record_id, payload-digest) sets —
  * equality-asserted before any timing is reported, the bake-off
  * discipline every BENCH record follows.
  *
  * {{{
  * sbt "runMain graft.tools.WarcPointBench 50000 20 3"
  * }}}
  */
object WarcPointBench {
  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(50000)
    val kPoints = args.lift(1).map(_.toInt).getOrElse(20)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~8 KiB deterministic payloads (the WarcPruneBench corpus shape)
    val payloadExpr = unhex(concat((0 until 256).map(i =>
      md5(concat(col("id").cast("string"), lit(s"|$i")))): _*))
    val records = spark.range(0, nRecords.toLong).select(
        concat(lit("urn:graft:"), col("id").cast("string")).as("record_id"),
        lit("resource").as("warc_type"),
        concat(lit("https://x.com/doc/"), col("id").cast("string")).as("target_uri"),
        lit("application/octet-stream").as("content_type"),
        payloadExpr.as("payload"))
      .repartition(16)
    val gzDir = graft.operators.Scratch.dir("wpt") + "/gz"
    graft.sources.WarcSource.writeRecords(records, gzDir,
      gzip = true, cdxIndex = true)

    // deterministic spread of lookup ids across the archive
    val ids = (0 until kPoints).map(i =>
      s"urn:graft:${(i.toLong * nRecords / kPoints) min (nRecords - 1L)}")

    def digestOf(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      df.select(col("record_id"), xxhash64(col("payload")).as("d"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    def scanLeg() = graft.sources.WarcSource.read(spark, gzDir)
      .filter(col("record_id").isin(ids: _*))
    def pointLeg() = graft.sources.WarcSource.readAt(spark, gzDir, ids)

    // equality gate BEFORE timing: both legs must return the same rows
    val dScan = digestOf(scanLeg())
    val dPoint = digestOf(pointLeg())
    require(dScan == dPoint && dScan.size == kPoints,
      s"legs disagree: scan=${dScan.size} point=${dPoint.size} " +
        s"diff=${(dScan diff dPoint).take(3)} ${(dPoint diff dScan).take(3)}")

    def time(body: => Long): Double = {
      body // warmup
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val tScan = time(scanLeg().agg(sum(length(col("payload")))).head().getLong(0))
    val tPoint = time(pointLeg().agg(sum(length(col("payload")))).head().getLong(0))

    // BYTES TOUCHED — the scale-faithful metric (at local[32] with a warm
    // page cache, idle threads absorb a small archive's full decode the
    // same way they absorbed the AQE straggler win; the I/O ledger is
    // what survives a 1000-executor cold-cache reality): the scan leg
    // must inflate EVERY member; the point leg reads the tiny index plus
    // exactly K member ranges.
    def listBytes(dir: String, suffix: String, negate: Boolean = false): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(s => s.isFile &&
        (s.getPath.getName.endsWith(suffix) != negate)).map(_.getLen).sum
    }
    val archiveBytes = listBytes(gzDir, ".cdx", negate = true)
    val indexBytes = listBytes(gzDir, ".cdx")
    val pointDataBytes = graft.sources.WarcSource.readIndex(spark, gzDir)
      .join(broadcast(ids.toDF("record_id")), Seq("record_id"))
      .agg(sum(col("length"))).head().getLong(0)

    // FAT LEG — the media-asset shape where inflate volume dominates:
    // ~4 MiB decoded per record (compressible, so the archive stays
    // small on disk but the scan still pays the full decompress-out
    // volume; the point leg inflates K members only).
    val nFat = 2000
    val fatPayload = encode(repeat(
      md5(col("id").cast("string")), 131072), "UTF-8") // 32 B hex * 128 Ki = 4 MiB
    val fatRecords = spark.range(0, nFat.toLong, 1, 8).select(
        concat(lit("urn:graft:fat:"), col("id").cast("string")).as("record_id"),
        lit("resource").as("warc_type"),
        concat(lit("https://x.com/fat/"), col("id").cast("string")).as("target_uri"),
        lit("application/octet-stream").as("content_type"),
        fatPayload.as("payload"))
    val fatDir = graft.operators.Scratch.dir("wpt") + "/fat"
    graft.sources.WarcSource.writeRecords(fatRecords, fatDir,
      gzip = true, cdxIndex = true)
    val fatIds = (0 until kPoints).map(i =>
      s"urn:graft:fat:${(i.toLong * nFat / kPoints) min (nFat - 1L)}")
    def fatScan() = graft.sources.WarcSource.read(spark, fatDir)
      .filter(col("record_id").isin(fatIds: _*))
    def fatPoint() = graft.sources.WarcSource.readAt(spark, fatDir, fatIds)
    require(digestOf(fatScan()) == digestOf(fatPoint()),
      "fat legs disagree")
    val tFatScan = time(fatScan().agg(sum(length(col("payload")))).head().getLong(0))
    val tFatPoint = time(fatPoint().agg(sum(length(col("payload")))).head().getLong(0))

    println(f"""{"metric":"warc_point_access","reps":$reps,"small":{"n_records":$nRecords,"payload_b":8192,"k_points":$kPoints,"scan_filter_sec":$tScan%.3f,"point_readAt_sec":$tPoint%.3f,"speedup":${tScan / tPoint}%.2f,"archive_bytes":$archiveBytes,"index_bytes":$indexBytes,"point_data_bytes":$pointDataBytes},"fat":{"n_records":$nFat,"payload_b":4194304,"k_points":$kPoints,"scan_filter_sec":$tFatScan%.3f,"point_readAt_sec":$tFatPoint%.3f,"speedup":${tFatScan / tFatPoint}%.2f},"equal_results":true}""")
    spark.stop()
  }
}
