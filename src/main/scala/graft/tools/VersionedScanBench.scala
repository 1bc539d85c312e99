package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** FULL-SCAN THROUGHPUT of the `graft-versioned` DSv2 connector vs the
  * native parquet path ([[VersionedTable.readAsOf]]) — the round-14
  * verdict-task-5 gate: an UNPRUNED analytical scan through the
  * connector must sit within ~1.2× of the native scan now that the
  * batch read path is Spark's own `VectorizedParquetRecordReader`
  * (before this round it was row-at-a-time parquet-mr Groups — honest
  * but silently slow for full scans).
  *
  * Method: one versioned table, `rows` rows × (id BIGINT, x DOUBLE,
  * text VARCHAR) committed as 4 appends; timed query = full-scan
  * aggregate (sum(x), count, sum(length(text))) — scan-dominated, no
  * shuffle beyond the final partial-agg exchange. min-of-3 after one
  * warmup, fresh table per run dir. Usage:
  *
  * {{{ sbt "runMain graft.tools.VersionedScanBench [rows]" }}}
  *
  * Prints one JSON line; committed as BENCH_VSCAN_r14.json.
  */
object VersionedScanBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("vscan").toString + "/t"
    val batch = rows / 4
    (0 until 4).foreach { b =>
      VersionedTable.commit(
        spark.range(b * batch, (b + 1) * batch, 1, 4)
          .select(col("id"), (col("id") % 9973).cast("double").as("x"),
            concat(lit("doc-"), col("id"), lit("-"),
              md5(col("id").cast("string"))).as("text")),
        dir, "id", Seq("text"), b.toLong, mode = "append")
    }
    val bytes = {
      val root = new java.io.File(dir, "data")
      def size(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      size(root)
    }

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def agg(df: org.apache.spark.sql.DataFrame): Unit = {
      val r = df.groupBy()
        .agg(sum("x"), count(lit(1)), sum(length(col("text")))).collect()
      require(r.head.getLong(1) == rows, s"row count drift: ${r.head.getLong(1)}")
    }
    def minOf3(body: => Unit): Double = {
      timed(body) // warmup
      Seq.fill(3)(timed(body)).min
    }
    // DataFrames built once — the timed region is query EXECUTION (the
    // repeated-read shape); resolution/listing costs are one-time
    val nativeDf = VersionedTable.readAsOf(spark, dir, 4L)
    val dsv2Df = spark.read.format("graft-versioned").load(dir)
    val native = minOf3(agg(nativeDf))
    val dsv2 = minOf3(agg(dsv2Df))
    // control: Spark's OWN DSv2 parquet (ParquetScan via BatchScanExec)
    // over the same files — isolates BatchScanExec-vs-FileSourceScanExec
    // overhead from anything this connector adds
    val dataDirs = new java.io.File(dir, "data").listFiles.map(_.toString).sorted
    val sparkV2 = {
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      try {
        val df = spark.read.parquet(dataDirs: _*)
        minOf3(agg(df))
      } finally spark.conf.set("spark.sql.sources.useV1SourceList",
        "avro,csv,json,kafka,orc,parquet,text")
    }
    // projection-only scan (single column) — the pruning+columnar combo
    val nativeNarrow = minOf3 {
      require(nativeDf.groupBy().agg(sum("x")).collect().nonEmpty)
    }
    val dsv2Narrow = minOf3 {
      require(dsv2Df.groupBy().agg(sum("x")).collect().nonEmpty)
    }
    println(f"""{"record":"VersionedScanBench r14","rows":$rows,"data_bytes":$bytes,"full_scan_sec":{"native_readAsOf":$native%.3f,"spark_own_dsv2_parquet":$sparkV2%.3f,"dsv2_connector":$dsv2%.3f,"ratio_vs_v1":${dsv2 / native}%.3f,"ratio_vs_spark_dsv2":${dsv2 / sparkV2}%.3f},"narrow_scan_sec":{"native_readAsOf":$nativeNarrow%.3f,"dsv2_connector":$dsv2Narrow%.3f,"ratio":${dsv2Narrow / nativeNarrow}%.3f},"gate":"dsv2/native <= 1.2"}""")
    spark.stop()
  }
}
