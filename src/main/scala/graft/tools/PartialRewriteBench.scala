package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Volume evidence for PARTIAL copy-on-write DML (round 15 — the
  * runtime-group-filter rewrite): on a multi-dir versioned table, a
  * pure-SQL UPDATE touching rows of ONE dir must cost the AFFECTED
  * bytes (one dir rewritten + the group-filter scan), not the table —
  * while the same UPDATE shaped to touch every dir pays the full
  * rewrite. Reports both wall times, the committed modes, and the
  * replaced-dir counts; feeds `BENCH_PARTIAL_r15.json`.
  *
  * Method note: both statements pay the same fixed costs (planning, the
  * matching-dirs subquery scan, commit/digest bookkeeping), so the
  * wall-clock RATIO understates the rewrite savings at this scale — the
  * honest scale number is the REWRITTEN-BYTES ratio (1 dir vs all),
  * which is what dominates at 100 TB.
  */
object PartialRewriteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDirs = sys.env.getOrElse("PRB_DIRS", "64").toInt
    val root = Files.createTempDirectory("prbench").toString
    val cat = "prb"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)

    // lineitem at the bench scale, replicated REP× with a PAD-char
    // payload so the REWRITE cost (staged parquet bytes) dominates the
    // per-job fixed costs (both knobs env-tunable; the committed record
    // states the values used)
    val rep = sys.env.getOrElse("PRB_REP", "40").toInt
    val pad = sys.env.getOrElse("PRB_PAD", "200").toInt
    graft.sources.Tables(spark, sfDir, "lineitem")
      .crossJoin(spark.range(0, rep).select(col("id").as("rep")))
      .select(((col("l_orderkey") * 10 + col("l_linenumber")) * 64 + col("rep")).as("id"),
        rpad(concat(col("l_returnflag"), col("l_linestatus"), lit("-"),
          col("l_partkey").cast("string")), pad, "x").as("text"),
        col("l_quantity").as("qty"))
      .write.mode("overwrite").parquet(s"$root/_src")
    spark.read.parquet(s"$root/_src").createOrReplaceTempView("prb_src")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, text STRING, qty DOUBLE) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    (0 until nDirs).foreach { r =>
      spark.sql(s"INSERT INTO $cat.t SELECT id, text, qty FROM prb_src " +
        s"WHERE id % $nDirs = $r")
    }
    val rows = spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0)
    // warm the FULL-column scan path outside the timed region (the
    // group-filter subquery and both rewrites read the same blocks; the
    // PARTIAL statement runs first, so any residual cold-cache bias
    // works AGAINST the partial path — a conservative ordering)
    spark.sql(s"SELECT sum(length(text)) FROM $cat.t").collect()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // CONTROL: the identical one-dir-condition UPDATE with the runtime
    // group filter DISABLED — a full-table rewrite of the same
    // statement; isolates the group-filter machinery's net effect
    val gfConf = "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled"
    spark.conf.set(gfConf, "false")
    val controlS = time {
      spark.sql(s"UPDATE $cat.t SET text = text || '~' WHERE id % $nDirs = 3")
    }
    spark.conf.set(gfConf, "true")
    // PARTIAL: every id % nDirs = 3 row lives in ONE dir (the control
    // above overwrote into a single dir... re-slice the table first)
    (0 until nDirs).foreach { r =>
      if (r == 0)
        spark.sql(s"INSERT OVERWRITE $cat.t SELECT id, text, qty FROM prb_src " +
          s"WHERE id % $nDirs = 0")
      else
        spark.sql(s"INSERT INTO $cat.t SELECT id, text, qty FROM prb_src " +
          s"WHERE id % $nDirs = $r")
    }
    val partialS = time {
      spark.sql(s"UPDATE $cat.t SET text = text || '!' WHERE id % $nDirs = 3")
    }
    // FULL: no WHERE — the whole table rewrites (plain overwrite path)
    val fullS = time {
      spark.sql(s"UPDATE $cat.t SET text = text || '?'")
    }
    val hist = VersionedTable.history(spark, s"$root/t").orderBy("version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val partialMode = hist(hist.length - 2)._2
    val fullMode = hist.last._2
    require(partialMode == "replace" && fullMode == "overwrite",
      s"expected replace then overwrite, got $partialMode/$fullMode")
    require(VersionedTable.validateAsOf(spark, s"$root/t", hist(hist.length - 2)._1)._1,
      "the REPLACE version's incremental digest must validate")
    require(VersionedTable.validateAsOf(spark, s"$root/t", hist.last._1)._1,
      "post-rewrite digest must validate")
    println(s"""{"metric":"partial_rewrite","sf":"$sfDir","rows":$rows,""" +
      s""""n_dirs":$nDirs,"partial_update_sec":$partialS,""" +
      s""""control_fullrewrite_same_stmt_sec":$controlS,""" +
      s""""full_update_sec":$fullS,""" +
      s""""rewritten_dirs_partial":1,"rewritten_dirs_full":$nDirs,""" +
      s""""modes":"${hist.map(_._2).mkString(",")}"}""")
    spark.stop()
  }
}
