package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** VTDEPTH at REAL BATCH VOLUMES (round-13 verdict task 7): the r12
  * depth record ran 120 × 500-row commits — it proved the manifest
  * chain is flat in DEPTH, but 500 rows say nothing about the cost
  * that scales with BYTES (the data write, the stat scan, the bloom
  * build, the incremental digest's one pass over the new dir). This
  * tool repeats the story with >= 50 MB per commit (sf0.1-ish daily
  * drops: N rows × ~1.2 KB payload), with `statCols` + `bloomCols` on
  * EVERY commit so the per-commit index build — including the
  * round-13 executor-side bloom aggregate — is inside the window
  * means, and records compaction WITH re-indexing
  * (`compact(statCols, bloomCols)` — the d17bf92 path) in the same
  * run.
  *
  * Column design: `id` is append-ordered (day-banded), so the ID-STAT
  * prune serves range reads; `key` = md5(id) makes every dir span the
  * FULL lexicographic range (string min/max can never prune a point
  * probe) while each VALUE lives in exactly one dir — the shape the
  * bloom index exists for, at volume.
  *
  * What the design predicts: commit windows FLAT across depth (cost
  * is O(batch bytes), never O(table)); deep read LINEAR in dirs,
  * reset by compact; key point read opens ~1 dir via the bloom.
  *
  * {{{
  * sbt "runMain graft.tools.VersionedVolumeBench 30 50000"
  * }}}
  */
object VersionedVolumeBench {
  def main(args: Array[String]): Unit = {
    val depth = args.headOption.map(_.toInt).getOrElse(30)
    val rowsPerCommit = args.lift(1).map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = graft.operators.Scratch.dir("vtv") + "/t"
    // ~1.2 KB payload per row: 50k rows ≈ 60 MB raw per commit (md5 hex
    // compresses poorly — by design, this is a volume bench)
    def batch(day: Int) = {
      val lo = day.toLong * rowsPerCommit
      spark.range(lo, lo + rowsPerCommit)
        .select(col("id"),
          md5(col("id").cast("string")).as("key"),
          concat_ws("", (0 until 36).map(i =>
            md5(concat(col("id").cast("string"), lit(s"|$i")))): _*).as("text"))
    }

    val commitSec = new Array[Double](depth)
    (0 until depth).foreach { day =>
      val t0 = System.nanoTime()
      VersionedTable.commit(batch(day), dir, "id", Seq("text"),
        expectedVersion = day.toLong, mode = "append",
        statCols = Seq("key"), bloomCols = Seq("key"))
      commitSec(day) = (System.nanoTime() - t0) / 1e9
    }
    def windowMean(a: Array[Double], from: Int, until: Int): Double = {
      val s = a.slice(from, until); s.sum / s.length
    }
    val win = math.max(1, depth / 4)
    val windows = (0 until depth by win).map(w =>
      f"""\"d${w + 1}-${math.min(w + win, depth)}\":${windowMean(commitSec, w, math.min(w + win, depth))}%.3f""")

    // committed volume, for the MB/commit claim
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength

    def time(body: => Long): Double = {
      body
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    }
    val tReadDeep = time(VersionedTable.read(spark, dir).count())
    // id range point read: stat-pruned to ~1 dir (append-ordered ids)
    val mid = depth.toLong * rowsPerCommit / 2
    val tPointId = time(
      VersionedTable.readAsOfWhere(spark, dir, depth.toLong, mid, mid).count())
    val pointIdDirs = VersionedTable
      .readAsOfWhere(spark, dir, depth.toLong, mid, mid)
      .inputFiles.map(_.replaceAll("/[^/]*$", "")).distinct.length
    // key point read: every dir's [min,max] hex band contains every
    // probe — only the bloom can prune. Expect ~1 dir (plus rare fps).
    val probeKey = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(mid.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val tPointKey = time(VersionedTable
      .readAsOfPoint(spark, dir, depth.toLong, "key", Seq(probeKey)).count())
    val pointKeyDirs = VersionedTable
      .readAsOfPoint(spark, dir, depth.toLong, "key", Seq(probeKey))
      .inputFiles.map(_.replaceAll("/[^/]*$", "")).distinct.length
    // compact WITH re-indexing: the OPTIMIZE move at volume
    val t0c = System.nanoTime()
    val vc = VersionedTable.compact(spark, dir, targetPartitions = cpus.toInt,
      statCols = Seq("key"), bloomCols = Seq("key"))
    val tCompact = (System.nanoTime() - t0c) / 1e9
    val tReadCompacted = time(VersionedTable.readAsOf(spark, dir, vc).count())
    // the re-registered bloom still serves point reads post-compact
    val tPointKeyC = time(VersionedTable
      .readAsOfPoint(spark, dir, vc, "key", Seq(probeKey)).count())
    val t0v = System.nanoTime()
    val (dirsDel, manDel) = VersionedTable.vacuum(spark, dir, retain = 1,
      orphanGraceMs = 0L)
    val tVacuum = (System.nanoTime() - t0v) / 1e9

    println(f"""{"metric":"versioned_volume","depth":$depth,"rows_per_commit":$rowsPerCommit,"mb_per_commit":${totalBytes / depth / 1048576}%d,"commit_sec_windows":{${windows.mkString(",")}},"read_deep_sec":$tReadDeep%.3f,"compact_reindex_sec":$tCompact%.3f,"read_compacted_sec":$tReadCompacted%.3f,"point_id_sec":$tPointId%.3f,"point_id_dirs":$pointIdDirs,"point_key_sec":$tPointKey%.3f,"point_key_dirs":$pointKeyDirs,"point_key_compacted_sec":$tPointKeyC%.3f,"vacuum_sec":$tVacuum%.3f,"vacuum_reclaimed":{"dirs":$dirsDel,"manifests":$manDel}}""")
    spark.stop()
  }
}
