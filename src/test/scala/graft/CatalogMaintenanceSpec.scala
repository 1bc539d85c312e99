package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.VersionedTable

/** Round-15 catalog surfaces beyond DML: `CALL <cat>.system.vacuum/
  * compact` (ProcedureCatalog), `ALTER TABLE … ADD COLUMN` (zero-row
  * evolving append), and temporal/decimal columns through every
  * connector surface — catalog SQL write/read (columnar), the
  * streaming sink, and the commit-log streaming READ (the row-mode
  * vectorized reader). */
class CatalogMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"cmnt$n"
    val root = Files.createTempDirectory("cmnt").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  test("CALL system.compact + system.vacuum: a 3-append chain compacts to " +
      "one dir and vacuum reclaims aged dirs/manifests — result rows carry " +
      "the counts") {
    val (c, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 30)
      .select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("cmnt_src")
    (0 to 2).foreach { r =>
      spark.sql(s"INSERT INTO $c.t SELECT id, text FROM cmnt_src WHERE id % 3 = $r")
    }
    val compacted = spark.sql(
      s"CALL $c.system.compact(table => 't', target_partitions => 1)")
    assert(compacted.columns.toSeq == Seq("new_version"))
    assert(compacted.head.getLong(0) == 4L)
    val vac = spark.sql(
      s"CALL $c.system.vacuum(table => 't', retain => 1, grace_ms => 0)")
    assert(vac.columns.toSeq == Seq("removed_data_dirs", "removed_manifests"))
    assert((vac.head.getInt(0), vac.head.getInt(1)) == (3, 3))
    // only the compacted version remains; content intact
    assert(VersionedTable.versions(spark, s"$root/t") == Seq(4L))
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 30L)
    // positional CALL uses the declared defaults for trailing params
    spark.sql(s"INSERT INTO $c.t SELECT id + 100, text FROM cmnt_src")
    assert(spark.sql(s"CALL $c.system.compact('t')").head.getLong(0) == 6L)
  }

  test("CALL system.zorder re-clusters the current version on two columns " +
      "— content-identical, new version") {
    val (c, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, a BIGINT, b BIGINT) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 1000)
      .select(col("id"), (col("id") % 97).as("a"), (col("id") % 89).as("b"))
      .createOrReplaceTempView("cmnt_z_src")
    spark.sql(s"INSERT INTO $c.t SELECT id, a, b FROM cmnt_z_src")
    val v = spark.sql(
      s"CALL $c.system.zorder(table => 't', col_a => 'a', col_b => 'b')")
      .head.getLong(0)
    assert(v == 2L)
    // content-identical (the digest gate inside compactZOrdered enforces
    // it; re-check through the SQL surface)
    assert(spark.sql(s"SELECT sum(id), sum(a), sum(b), count(*) FROM $c.t")
      .head.toSeq == spark.sql(
        s"SELECT sum(id), sum(a), sum(b), count(*) FROM $c.t VERSION AS OF 1")
      .head.toSeq)
    assert(VersionedTable.validateAsOf(spark, s"$root/t", 2L)._1)
  }

  test("CALL errors are loud: unknown procedure, missing table") {
    val (c, _) = freshCatalog()
    val e1 = intercept[Exception] { spark.sql(s"CALL $c.system.reindex('t')") }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    // Spark wraps loadProcedure errors in FAILED_TO_LOAD_ROUTINE; our
    // "unknown procedure" diagnosis rides in the cause chain
    assert(chain(e1).exists(x => x.getMessage != null &&
      x.getMessage.contains("unknown procedure")), e1)
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $c.system.vacuum(table => 'nope', retain => 1)")
    }
    assert(e2.getMessage.toLowerCase.contains("table"), e2.getMessage)
  }

  test("ALTER TABLE ADD COLUMN lands as a zero-row evolving append: " +
      "standing rows read NULL, the next insert carries the column, v1 " +
      "still reads the pre-evolution schema") {
    val (c, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 5)
      .select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("cmnt_alter_src")
    spark.sql(s"INSERT INTO $c.t SELECT id, text FROM cmnt_alter_src")
    spark.sql(s"ALTER TABLE $c.t ADD COLUMN quality DOUBLE")
    // the evolution is a REAL version: zero new rows, append mode
    val hist = VersionedTable.history(spark, s"$root/t")
      .orderBy("version").collect()
    assert(hist.map(_.getString(1)).toSeq == Seq("append", "append"))
    assert(hist(1).getLong(2) == hist(0).getLong(2))
    // standing rows read back NULL for the added column
    assert(spark.sql(s"SELECT count(*) FROM $c.t WHERE quality IS NULL")
      .head.getLong(0) == 5L)
    // the next insert carries it
    spark.sql(s"INSERT INTO $c.t SELECT id + 100, text, CAST(id AS DOUBLE) " +
      "FROM cmnt_alter_src")
    assert(spark.sql(s"SELECT sum(quality) FROM $c.t").head.getDouble(0) == 10.0)
    // pre-evolution snapshot unchanged
    assert(spark.sql(s"SELECT * FROM $c.t VERSION AS OF 1").columns.toSeq
      == Seq("id", "text"))
  }

  test("ALTER TABLE rejections stay loud: non-ADD changes, nested adds, " +
      "duplicate columns") {
    val (c, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.t DROP COLUMN text")
    }
    assert(e1.getMessage.contains("only ADD COLUMN"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.t ADD COLUMN text STRING")
    }
    assert(e2.getMessage.toLowerCase.contains("exists"), e2.getMessage)
    // declared-only table: ALTER evolves the declaration itself
    spark.sql(s"ALTER TABLE $c.t ADD COLUMN lang STRING")
    assert(spark.sql(s"SELECT * FROM $c.t").columns.toSeq
      == Seq("id", "text", "lang"))
  }

  test("TRUNCATE TABLE: copy-on-write empty version — prior snapshots " +
      "still travel; truncating a never-written table is a no-op") {
    val (c, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.sql(s"TRUNCATE TABLE $c.t") // declared-only: no-op
    assert(VersionedTable.versions(spark, s"$root/t").isEmpty)
    spark.range(0, 7).select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("cmnt_trunc_src")
    spark.sql(s"INSERT INTO $c.t SELECT id, text FROM cmnt_trunc_src")
    spark.sql(s"TRUNCATE TABLE $c.t")
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $c.t VERSION AS OF 1")
      .head.getLong(0) == 7L)
  }

  test("metadata tables through catalog identifiers: cat.ns.t.history / " +
      ".files in plain SQL, composing with VERSION AS OF; loud on " +
      "nonexistent kinds") {
    val (c, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $c.lake")
    spark.sql(s"CREATE TABLE $c.lake.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 10).select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("cmnt_meta_src")
    spark.sql(s"INSERT INTO $c.lake.t SELECT id, text FROM cmnt_meta_src WHERE id < 4")
    spark.sql(s"INSERT INTO $c.lake.t SELECT id, text FROM cmnt_meta_src WHERE id >= 4")
    val hist = spark.sql(s"SELECT version, mode, n_rows FROM $c.lake.t.history " +
      "ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(hist == Seq((1L, "append", 4L), (2L, "append", 10L)), hist)
    assert(spark.sql(s"SELECT count(*) FROM $c.lake.t.files").head.getLong(0) == 2L)
    // time travel composes: v1's snapshot listed one dir
    assert(spark.sql(s"SELECT count(*) FROM $c.lake.t.files VERSION AS OF 1")
      .head.getLong(0) == 1L)
    intercept[Exception] { spark.sql(s"SELECT * FROM $c.lake.t.snapshots") }
  }

  test("metadata columns _graft_dir/_graft_version: per-commit provenance " +
      "through SQL, composing with time travel and dir pruning") {
    val (c, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 12).select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("cmnt_prov_src")
    (0 to 2).foreach { r =>
      spark.sql(s"INSERT INTO $c.t SELECT id, text FROM cmnt_prov_src " +
        s"WHERE id % 3 = $r")
    }
    // census by commit version (the q242 shape)
    val census = spark.sql(s"SELECT _graft_version, count(*) FROM $c.t " +
      "GROUP BY 1 ORDER BY 1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(census == Seq(1L -> 4L, 2L -> 4L, 3L -> 4L), census)
    // _graft_dir values are real manifest dirs
    val dirs = spark.sql(s"SELECT DISTINCT _graft_dir FROM $c.t").collect()
      .map(_.getString(0)).toSeq
    assert(dirs.size == 3 && dirs.forall(_.startsWith("data/")), dirs)
    // time travel: a v2 read only ever reports versions <= 2
    val v2max = spark.sql(
      s"SELECT max(_graft_version) FROM $c.t VERSION AS OF 2").head.getLong(0)
    assert(v2max == 2L)
    // a metadata-only projection (no file columns at all) still scans
    assert(spark.sql(s"SELECT _graft_version FROM $c.t").count() == 12L)
    // row-level filter composes (the filter is residual, per the contract)
    assert(spark.sql(
      s"SELECT _graft_version FROM $c.t WHERE id = 7").head.getLong(0) == 2L)
    // ordinary reads are unaffected (metadata stays invisible to SELECT *)
    assert(spark.sql(s"SELECT * FROM $c.t").columns.toSeq == Seq("id", "text"))
    VersionedTable.currentVersion(spark, s"$root/t") // touch root: used
  }

  test("readStream.table over a catalog table: the commit-log streaming " +
      "source resolves through the SQL name, appends stream through") {
    val (c, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.s (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 12).select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("cmnt_rs_src")
    (0 to 2).foreach { r =>
      spark.sql(s"INSERT INTO $c.s SELECT id, text FROM cmnt_rs_src WHERE id % 3 = $r")
    }
    val outName = s"cmnt_rs_mem$n"
    val q = spark.readStream.table(s"$c.s")
      .writeStream.format("memory").queryName(outName)
      .option("checkpointLocation", s"$root/rs-ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    assert(spark.table(outName).count() == 12L)
    assert(spark.table(outName).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (0L to 11L))
  }

  test("CHECK constraints: declared at CREATE or ALTER, engine-enforced on " +
      "every write, droppable; non-CHECK kinds rejected loudly") {
    val (c, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, score DOUBLE, " +
      "CONSTRAINT score_range CHECK (score >= 0 AND score <= 1)) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.sql(s"INSERT INTO $c.t VALUES (1, 0.5), (2, 0.9)")
    // a violating INSERT fails BEFORE anything commits
    val e1 = intercept[Exception] {
      spark.sql(s"INSERT INTO $c.t VALUES (3, 1.5)")
    }
    assert(e1.getMessage.contains("score_range") ||
      e1.getMessage.toUpperCase.contains("CHECK"), e1.getMessage)
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 2L)
    // …and a violating UPDATE through the row-level path fails too
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE $c.t SET score = 2.0 WHERE id = 1")
    }
    assert(e2.getMessage.contains("score_range") ||
      e2.getMessage.toUpperCase.contains("CHECK"), e2.getMessage)
    assert(spark.sql(s"SELECT max(score) FROM $c.t").head.getDouble(0) == 0.9)
    // ALTER ADD CONSTRAINT validates standing rows first
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.t ADD CONSTRAINT hi CHECK (score > 0.7)")
    }
    assert(e3.getMessage.toUpperCase.contains("CHECK") ||
      e3.getMessage.contains("hi"), e3.getMessage)
    spark.sql(s"ALTER TABLE $c.t ADD CONSTRAINT ids CHECK (id > 0)")
    intercept[Exception] { spark.sql(s"INSERT INTO $c.t VALUES (-5, 0.5)") }
    // DROP releases the gate
    spark.sql(s"ALTER TABLE $c.t DROP CONSTRAINT ids")
    spark.sql(s"INSERT INTO $c.t VALUES (-5, 0.5)")
    assert(spark.sql(s"SELECT count(*) FROM $c.t WHERE id = -5").head.getLong(0) == 1L)
    // non-CHECK constraint kinds are refused, never silent metadata
    val e4 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.pk (id BIGINT PRIMARY KEY, v STRING) " +
        "TBLPROPERTIES ('idCol' = 'id')")
    }
    assert(e4.getMessage.contains("only CHECK"), e4.getMessage)
  }

  test("column DEFAULT values: partial-column INSERTs fill declared " +
      "defaults before AND after v1 (metadata overlay on committed loads); " +
      "ADD COLUMN DEFAULT is refused") {
    val (c, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, lang STRING DEFAULT 'und', " +
      "score DOUBLE DEFAULT 0.5) TBLPROPERTIES ('idCol' = 'id')")
    spark.sql(s"INSERT INTO $c.t (id) VALUES (1)") // pre-v1: declared schema
    spark.sql(s"INSERT INTO $c.t (id, lang) VALUES (2, 'fr')") // post-v1: overlay
    spark.sql(s"INSERT INTO $c.t VALUES (3, DEFAULT, 0.9)")
    val got = spark.sql(s"SELECT id, lang, score FROM $c.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "und", 0.5), (2L, "fr", 0.5), (3L, "und", 0.9)), got)
    // a default on an ADDED column would lie about committed bytes
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.t ADD COLUMN q DOUBLE DEFAULT 1.0")
    }
    assert(e.getMessage.contains("DEFAULT"), e.getMessage)
  }

  test("timestamp/date/decimal round-trip: catalog INSERT → columnar read, " +
      "streaming sink append, and the commit-log streaming READ all carry " +
      "the events-fixture shapes") {
    val (c, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.ev (id BIGINT, ts TIMESTAMP, day DATE, " +
      "amount DECIMAL(10,2)) TBLPROPERTIES ('idCol' = 'id')")
    val src = spark.range(0, 6).select(col("id"),
      expr("timestamp_micros(1700000000000000 + id * 3600000000)").as("ts"),
      expr("to_date(timestamp_micros(1700000000000000 + id * 86400000000))").as("day"),
      expr("CAST(id * 1.25 AS DECIMAL(10,2))").as("amount"))
    src.createOrReplaceTempView("cmnt_ev")
    spark.sql(s"INSERT INTO $c.ev SELECT id, ts, day, amount FROM cmnt_ev " +
      "WHERE id < 3")
    // streaming SINK appends the rest into the same table dir
    val in = Files.createTempDirectory("cmnt-in").toString
    src.filter(col("id") >= 3).coalesce(1).write.mode("overwrite").parquet(in)
    val q = spark.readStream
      .schema("id LONG, ts TIMESTAMP, day DATE, amount DECIMAL(10,2)")
      .parquet(in)
      .writeStream.outputMode("append").format("graft-versioned")
      .option("path", s"$root/ev")
      .option("checkpointLocation", s"$in-ckpt")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    // catalog read (columnar scan) equals the source frame exactly
    val viaCatalog = spark.sql(s"SELECT * FROM $c.ev").orderBy("id").collect()
    val expected = src.orderBy("id").collect()
    assert(viaCatalog.toSeq == expected.toSeq,
      s"catalog read drifted: ${viaCatalog.toSeq} vs ${expected.toSeq}")
    // commit-log streaming READ (row-mode reader) delivers the same rows
    val outName = s"cmnt_mem$n"
    val q2 = spark.readStream.format("graft-versioned").load(s"$root/ev")
      .writeStream.format("memory").queryName(outName)
      .option("checkpointLocation", s"$in-ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    val viaStream = spark.table(outName).orderBy("id").collect()
    assert(viaStream.toSeq == expected.toSeq,
      s"streaming read drifted: ${viaStream.toSeq} vs ${expected.toSeq}")
  }
}
