package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the WARC connector's payload-skip column pruning — the
  * claim behind `SupportsPushDownRequiredColumns` in
  * [[graft.sources.WarcSource]]: a metadata-only query `skip()`s
  * `Content-Length` bytes instead of buffering them, so header scans
  * cost a fraction of full reads. Three legs over the same generated
  * archive (small ~8 KiB payloads — the web-page shape — plus a fat
  * ~4 MiB media-asset leg):
  *
  *  - `metadata_only`: group/count record types + sum lengths — the
  *    payload column never reaches the scan (plan-asserted in
  *    WarcSourceSpec; here we time it);
  *  - `full_payload`: the same aggregate plus a forced payload
  *    consumption (sum of payload sizes via length(payload)) — every
  *    byte buffers;
  *  - `gzip_metadata`: the pruned scan over the gzip twin — honest
  *    caveat leg: gzip members must DECOMPRESS to skip, so pruning
  *    saves allocation/copy but not inflate CPU (the reason real
  *    pipelines keep a cdx-style external index for point access).
  *
  * {{{
  * sbt "runMain graft.tools.WarcPruneBench 50000 3"
  * }}}
  */
object WarcPruneBench {
  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(50000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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

    // ~8 KiB deterministic payloads: hex-expanded md5 chain, no RNG
    val payloadExpr = unhex(concat((0 until 256).map(i =>
      md5(concat(col("id").cast("string"), lit(s"|$i")))): _*))
    val records = spark.range(0, nRecords).select(
        concat(lit("urn:graft:"), col("id").cast("string")).as("record_id"),
        lit("resource").as("warc_type"),
        concat(lit("https://x.com/doc/"), col("id").cast("string")).as("target_uri"),
        lit("application/octet-stream").as("content_type"),
        payloadExpr.as("payload"))
      .repartition(16)
    val plainDir = graft.operators.Scratch.dir("wpb") + "/plain"
    val gzDir = graft.operators.Scratch.dir("wpb") + "/gz"
    graft.sources.WarcSource.writeRecords(records, plainDir)
    graft.sources.WarcSource.writeRecords(records, gzDir, gzip = true)

    def time(body: => Long): (Double, Long) = {
      body // warmup
      var last = 0L
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); last = body; (System.nanoTime() - t0) / 1e9
      }
      (samples.min, last)
    }
    def metaAgg(dir: String): Long =
      graft.sources.WarcSource.read(spark, dir)
        .agg(count(lit(1)), sum(col("content_length"))).collect().head.getLong(0)
    def fullAgg(dir: String): Long =
      graft.sources.WarcSource.read(spark, dir)
        .agg(count(lit(1)), sum(length(col("payload")))).collect().head.getLong(0)

    val (tMeta, nMeta) = time(metaAgg(plainDir))
    val (tFull, nFull) = time(fullAgg(plainDir))
    val (tGzMeta, nGz) = time(metaAgg(gzDir))
    require(nMeta == nRecords && nFull == nRecords && nGz == nRecords,
      s"row counts diverge: $nMeta/$nFull/$nGz vs $nRecords")

    // FAT leg: ~4 MiB payloads (media-asset shape) — above the reader's
    // seek threshold, the pruned scan seeks past each payload instead of
    // copying it; this is where column pruning pays even on a warm local
    // page cache (one lseek replaces 4 MiB of memcpy per record)
    val nFat = 1000
    val fatPayload = encode(repeat(
      md5(col("id").cast("string")), 131072), "UTF-8") // 32 B hex * 128 Ki = 4 MiB
    // 8 generation partitions, NO repartition: 32 concurrent tasks each
    // materializing multi-MiB rows through an exchange OOM'd the default
    // heap; writing straight from 8 range splits streams row-at-a-time
    val fatRecords = spark.range(0, nFat, 1, 8).select(
        concat(lit("urn:graft:fat:"), col("id").cast("string")).as("record_id"),
        lit("resource").as("warc_type"),
        concat(lit("https://x.com/fat/"), col("id").cast("string")).as("target_uri"),
        lit("application/octet-stream").as("content_type"),
        fatPayload.as("payload"))
    val fatDir = graft.operators.Scratch.dir("wpb") + "/fat"
    graft.sources.WarcSource.writeRecords(fatRecords, fatDir)
    // full leg FIRST: it warms the page cache, biasing AGAINST the
    // pruning claim — the metadata leg wins on seeks, not cold cache
    val (tFatFull, nFf) = time(fullAgg(fatDir))
    val (tFatMeta, nFm) = time(metaAgg(fatDir))
    require(nFm == nFat && nFf == nFat, s"fat counts diverge: $nFm/$nFf vs $nFat")

    println(
      s"""{"metric":"warc_payload_prune","reps":$reps,
         |"small":{"n_records":$nRecords,"payload_b":8192,
         |"metadata_only_sec":$tMeta,"full_payload_sec":$tFull,
         |"gzip_metadata_sec":$tGzMeta,
         |"prune_speedup":${(tFull / tMeta * 100).round / 100.0}},
         |"fat":{"n_records":$nFat,"payload_b":4194304,
         |"metadata_only_sec":$tFatMeta,"full_payload_sec":$tFatFull,
         |"prune_speedup":${(tFatFull / tFatMeta * 100).round / 100.0}},
         |"equal_counts":true}""".stripMargin.replace("\n", ""))
    spark.stop()
  }
}
