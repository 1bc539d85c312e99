package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Source/sink helpers beyond the parquet catalog: the engine reads and
  * writes parquet/orc/csv/json, with partitioned layouts as the default for
  * anything at scale (partition-column directories → partition pruning
  * at read time, verified in SinksSpec via the plan's PartitionFilters).
  */
object Sinks {

  /** Manifest row-hash encoding version ([[writeWithManifest]]):
    * 2 = NULL-distinguishing '1'++value / '0' (round 9+); 1 (implicit,
    * field absent) = the old coalesce-to-'' encoding. */
  val DigestVersion = 2

  /** Partitioned columnar write — the standard large-scale layout. */
  def writePartitioned(df: DataFrame, outDir: String, partitionCols: Seq[String],
      format: String = "parquet"): Unit = {
    val w = df.write.mode("overwrite").format(format)
    val p = if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    (if (format == "csv") p.option("header", "true") else p).save(outDir)
  }

  /** Bucketed managed table: pre-hash-partitioned on the join/agg key
    * so repeated joins and aggregations on that key plan with NO
    * shuffle exchange (verified in BucketingSpec). At 100 TB this is
    * the difference between re-shuffling the fact table per query and
    * shuffling it once at ingest. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** SCHEMA-EVOLUTION read: parquet footers under `dir` may disagree
    * (a pipeline added a column mid-stream — the normal drift of a
    * long-lived ingest); `mergeSchema` unions the per-file schemas and
    * older files surface the new columns as NULL. Spark skips schema
    * merging by default because footer-merging costs a pass over file
    * metadata — turn it on only at snapshot boundaries, not on every
    * hot-path read. For DataFrame-level (not file-level) drift the
    * same contract is `unionByName(…, allowMissingColumns = true)`,
    * spec-asserted equal in SinksAndSkewSpec. */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Parquet write with a bloom filter on `key` — data skipping for
    * EQUALITY probes on a high-cardinality, unclustered column, the
    * case min/max stats (and z-order, which needs the column in the
    * sort key) cannot prune: when values are scattered, every row
    * group's min/max spans the whole domain, but the per-row-group
    * bloom proves absence and the reader skips the group without
    * decoding it (SinksAndSkewSpec measures the scan-row collapse).
    * At 100 TB this is the "find one document by content hash"
    * primitive: a needle probe touches ~1 row group instead of the
    * full table. `ndv` sizes the filter (~1.2 KB per 1M NDV per row
    * group at the default 1% FPP). */
  def writeBloomFiltered(df: DataFrame, outDir: String, key: String, ndv: Long,
      rowGroupBytes: Long = 8L << 20): Unit =
    df.write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$key", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$key", ndv.toString)
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(outDir)

  /** Small-file compaction: rewrite a directory into
    * ceil(bytes / targetBytes) files. The small-files problem is the
    * perennial failure mode of partitioned ingest at scale — thousands
    * of KB-sized parquet files per partition destroy scan throughput. */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetBytes: Long = 128L << 20): Unit = {
    // size through the path's own Hadoop FileSystem (same contract as
    // writeWithManifest) so compaction works where the data lives
    // (HDFS/S3), not only on the driver's local disk
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.getFileStatus(root).isDirectory, s"compact: $dir is not a directory")
    // recursive walk so partitioned layouts size correctly; the output
    // is a FLAT parquet directory (partition columns become data
    // columns) — re-partition with writePartitioned afterwards if the
    // directory layout must be preserved
    def bytesOf(p: org.apache.hadoop.fs.Path): Long = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory) fs.listStatus(p).map(s => bytesOf(s.getPath)).sum
      else if (p.getName.startsWith(".") || p.getName.startsWith("_")) 0L
      else st.getLen
    }
    val files = math.max(1, math.ceil(bytesOf(root).toDouble / targetBytes).toInt)
    spark.read.parquet(dir).repartition(files).write.mode("overwrite").parquet(outDir)
  }

  /** BUCKETED TABLE WRITE — the co-located-join primitive: hash-bucket
    * the table on its join key at WRITE time so every later join or
    * aggregation on that key runs with ZERO exchanges (Spark reads the
    * bucket spec from the catalog and plans a shuffle-free sort-merge
    * join when both sides bucket on the key with equal counts).
    *
    * The 100 TB arithmetic: a fact-fact join shuffles BOTH sides every
    * query — at 100 TB that is the dominant cost of the whole plan,
    * paid per query. Bucketing pays one shuffle once, at publish, and
    * every subsequent join/groupBy on the key rides the layout
    * (BucketedJoinSpec asserts the zero-Exchange plan; the bench
    * record measures the break-even). `sortCols` additionally orders
    * rows within each bucket file (scan-time merge locality).
    * Managed-table CTAS into the session warehouse — at scale, point
    * the warehouse at the shared filesystem and this is the standard
    * bucketed-parquet publish. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"writeBucketed: nBuckets must be positive, got $nBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** PUBLISH WITH A MANIFEST: write parquet, re-read what landed, and
    * record `_MANIFEST.json` — row count, part-file count, and the
    * order-insensitive 48-bit XOR content digest over (id | content
    * cols) ([[graft.operators.MerkleDiff]]'s digest contract). The
    * reproducible-export gate: any later consumer proves the snapshot
    * is exactly what the producer published (no lost files, no
    * duplicated task output, no silent re-write) by recomputing two
    * numbers — without trusting the transport or the file listing.
    * The digest pass costs one scan of the written data; at 100 TB
    * that is the price of a publish boundary, paid once. */
  def writeWithManifest(df: DataFrame, outDir: String, idCol: String,
      contentCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(outDir)
    val back = spark.read.parquet(outDir)
    val d = graft.operators.MerkleDiff
      .leafDigests(back, idCol, contentCols, leaves = 1)
      .collect().headOption.map(r => (r.getLong(1), r.getLong(2)))
      .getOrElse((0L, 0L)) // an empty snapshot digests as (0, 0)
    val nFiles = back.inputFiles.length
    // digest_v versions the ROW-HASH ENCODING, not the data: v2 is the
    // NULL-distinguishing '1'++value / '0' scheme (round 9); v1 (no
    // field) was coalesce-to-''. Without the version, a v1 manifest
    // read by a v2 validator reports a digest mismatch that looks
    // exactly like data corruption instead of a format bump.
    val json =
      s"""{"digest_v": $DigestVersion, "rows": ${d._1}, "digest": ${d._2}, """ +
        s""""files": $nFiles, """ +
        s""""id_col": "$idCol", "content_cols": "${contentCols.mkString(",")}"}"""
    // through the Hadoop FileSystem of the OUTPUT path — the publish
    // boundary must work where the data landed (HDFS/S3), not only on
    // the driver's local disk
    val mPath = new org.apache.hadoop.fs.Path(outDir, "_MANIFEST.json")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(mPath, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Validate a manifested directory: recompute (rows, digest) from the
    * CURRENT contents and compare to `_MANIFEST.json`. Returns
    * (ok, expectedRows, actualRows, expectedDigest, actualDigest). */
  def validateManifest(spark: SparkSession,
      outDir: String): (Boolean, Long, Long, Long, Long) = {
    val mPath = new org.apache.hadoop.fs.Path(outDir, "_MANIFEST.json")
    val mfs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val text = {
      val in = mfs.open(mPath)
      try org.apache.commons.io.IOUtils.toString(
        in, java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    def field(name: String): String =
      s""""$name": (-?\\w+)""".r.findFirstMatchIn(text)
        .getOrElse(sys.error(s"manifest missing $name")).group(1)
    def str(name: String): String =
      s""""$name": "([^"]*)"""".r.findFirstMatchIn(text)
        .getOrElse(sys.error(s"manifest missing $name")).group(1)
    // version gate BEFORE comparing digests: a manifest written under
    // a different row-hash encoding must fail as "format bump", never
    // masquerade as corruption (v1 = coalesce-to-'', pre-round-9)
    val gotV = s""""digest_v": (\\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toInt).getOrElse(1)
    if (gotV != DigestVersion)
      sys.error(s"manifest at $outDir uses digest_v=$gotV but this validator " +
        s"computes digest_v=$DigestVersion (the row-hash NULL encoding changed); " +
        "re-publish with writeWithManifest — the digests are incomparable, " +
        "this is a format bump, not data corruption")
    val expRows = field("rows").toLong
    val expDig = field("digest").toLong
    val idCol = str("id_col")
    val cols = str("content_cols").split(",").toSeq.filter(_.nonEmpty)
    val d = graft.operators.MerkleDiff
      .leafDigests(spark.read.parquet(outDir), idCol, cols, leaves = 1)
      .collect().headOption.map(r => (r.getLong(1), r.getLong(2)))
      .getOrElse((0L, 0L))
    val ok = d._1 == expRows && d._2 == expDig
    (ok, expRows, d._1, expDig, d._2)
  }

  def read(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame = {
    val r = spark.read.format(format)
    (format match {
      case "csv" => r.option("header", "true").option("inferSchema", "true")
      case _ => r
    }).load(dir)
  }
}
