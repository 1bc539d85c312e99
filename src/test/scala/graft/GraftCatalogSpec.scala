package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** SQL catalog for versioned tables ([[graft.sources.GraftCatalog]]):
  * CREATE/INSERT/SELECT/time-travel/DROP through pure SQL, the declared
  * first-insert schema gate, and the one-table property across the
  * catalog, path-based-connector, and Scala surfaces. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): String = {
    n += 1
    val name = s"gcat$n"
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root",
      Files.createTempDirectory("gcat").toString)
    name
  }

  test("CREATE / INSERT / SELECT / VERSION AS OF / INSERT OVERWRITE / " +
      "SHOW TABLES / DROP — the full SQL lifecycle") {
    val c = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $c.bronze")
    spark.sql(s"CREATE TABLE $c.bronze.docs (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    // empty declared table reads as its declared schema, zero rows
    assert(spark.sql(s"SELECT * FROM $c.bronze.docs").columns.toSeq
      == Seq("id", "text"))
    assert(spark.sql(s"SELECT * FROM $c.bronze.docs").count() == 0L)
    spark.range(0, 10).select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("gcat_src")
    spark.sql(s"INSERT INTO $c.bronze.docs SELECT id, text FROM gcat_src WHERE id < 5")
    spark.sql(s"INSERT INTO $c.bronze.docs SELECT id, text FROM gcat_src WHERE id >= 5")
    assert(spark.sql(s"SELECT count(*) FROM $c.bronze.docs").head.getLong(0) == 10L)
    spark.sql(s"INSERT OVERWRITE $c.bronze.docs SELECT id, text FROM gcat_src WHERE id = 7")
    assert(spark.sql(s"SELECT id FROM $c.bronze.docs").collect().map(_.getLong(0)).toSeq
      == Seq(7L))
    // time travel back through the overwrite, pure SQL
    assert(spark.sql(s"SELECT count(*) FROM $c.bronze.docs VERSION AS OF 2")
      .head.getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) FROM $c.bronze.docs VERSION AS OF 1")
      .head.getLong(0) == 5L)
    assert(spark.sql(s"SHOW TABLES IN $c.bronze").collect()
      .map(_.getString(1)).toSeq == Seq("docs"))
    spark.sql(s"DROP TABLE $c.bronze.docs")
    assert(spark.sql(s"SHOW TABLES IN $c.bronze").count() == 0L)
  }

  test("TIMESTAMP AS OF resolves through the manifest commit clock") {
    val c = freshCatalog()
    val t0 = 1700000000000L
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, v STRING)")
    VersionedTable.nowMs = () => t0
    try {
      spark.sql(s"INSERT INTO $c.t VALUES (1, 'a')")
      VersionedTable.nowMs = () => t0 + 60000L
      spark.sql(s"INSERT INTO $c.t VALUES (2, 'b')")
    } finally VersionedTable.nowMs = () => System.currentTimeMillis()
    val asOf = spark.sql(
      s"SELECT id FROM $c.t TIMESTAMP AS OF " +
        s"timestamp_millis(${t0 + 1000L})")
    assert(asOf.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("insert output resolution: positional aliases map to the declared " +
      "schema (SQL INSERT semantics), wrong column COUNT fails the " +
      "declaration gate; ALTER and partition transforms are rejected; " +
      "empty-table time travel fails loudly") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) TBLPROPERTIES('idCol'='id')")
    // positional: the SELECT's alias doesn't matter, values land by position
    spark.sql(s"INSERT INTO $c.t SELECT id, concat('x', id) AS wrong FROM range(3)")
    assert(spark.sql(s"SELECT text FROM $c.t WHERE id = 2").head.getString(0) == "x2")
    // column-count mismatch: no resolution possible — the declaration gate
    // fires on a fresh table
    val c2 = freshCatalog()
    spark.sql(s"CREATE TABLE $c2.t (id BIGINT, text STRING) TBLPROPERTIES('idCol'='id')")
    val ex = intercept[Exception] {
      spark.sql(s"INSERT INTO $c2.t SELECT id FROM range(3)")
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // round 15: catalog tables no longer declare ACCEPT_ANY_SCHEMA, so
    // the ANALYZER's own arity gate fires first (the standard SQL error)
    // — the commit-side declaration gate remains the backstop for the
    // path-based surface, which still skips analyzer resolution
    assert(msgs(ex).contains("ARITY") || msgs(ex).contains("declared"), msgs(ex))
    // round 15: ADD COLUMN is now SUPPORTED (zero-row evolving append —
    // CatalogMaintenanceSpec pins the semantics); non-ADD changes stay loud
    spark.sql(s"ALTER TABLE $c.t ADD COLUMN extra BIGINT")
    assert(spark.sql(s"SELECT * FROM $c.t").columns.toSeq
      == Seq("id", "text", "extra"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.t RENAME COLUMN extra TO extra2")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.p (id BIGINT, d STRING) PARTITIONED BY (d)")
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $c2.t VERSION AS OF 1").collect()
    }
  }

  test("CTAS: CREATE TABLE AS SELECT declares from the query schema and " +
      "lands as commit v1 (idCol property honored)") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.ct TBLPROPERTIES('idCol'='id') AS " +
      "SELECT id, concat('t', id) AS text FROM range(12)")
    assert(spark.sql(s"SELECT count(*) FROM $c.ct").head.getLong(0) == 12L)
    val root = spark.conf.get(s"spark.sql.catalog.$c.root")
    assert(VersionedTable.currentVersion(spark, s"$root/ct") == 1L)
    assert(VersionedTable.validateAsOf(spark, s"$root/ct", 1L)._1)
    // the digest id column came from the property, not the default
    assert(spark.sql(s"DESCRIBE TABLE $c.ct").collect()
      .map(_.getString(0)).contains("id"))
  }

  test("DELETE FROM: copy-on-write rewrite through SQL; history still " +
      "time-travels; untranslatable predicates take the row-level rewrite") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) TBLPROPERTIES('idCol'='id')")
    spark.sql(s"INSERT INTO $c.t SELECT id, concat('t', id) AS text FROM range(20)")
    spark.sql(s"DELETE FROM $c.t WHERE id < 5 OR id >= 18")
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 13L)
    assert(spark.sql(s"SELECT min(id), max(id) FROM $c.t").head.toSeq == Seq(5L, 17L))
    // the delete is a NEW version; the pre-delete snapshot survives
    assert(spark.sql(s"SELECT count(*) FROM $c.t VERSION AS OF 1")
      .head.getLong(0) == 20L)
    val root = spark.conf.get(s"spark.sql.catalog.$c.root")
    assert(VersionedTable.validateAsOf(spark, s"$root/t", 2L)._1)
    // round 15: a condition the filter translation can't carry no longer
    // refuses — it runs through the row-level REWRITE
    // (SupportsRowLevelOperations; RowLevelDmlSpec pins the semantics).
    // ids 5..17 have text 't5'..'t17': length 2 for 5..9, 3 for 10..17
    spark.sql(s"DELETE FROM $c.t WHERE length(text) % 2 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 8L)
    assert(spark.sql(s"SELECT min(id) FROM $c.t").head.getLong(0) == 10L)
  }

  test("one table, three surfaces: SQL-catalog writes are readable through " +
      "the path connector and the Scala API (same manifest chain)") {
    val c = freshCatalog()
    val root = spark.conf.get(s"spark.sql.catalog.$c.root")
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) TBLPROPERTIES('idCol'='id')")
    spark.sql(s"INSERT INTO $c.t SELECT id, concat('t', id) AS text FROM range(20)")
    val dir = s"$root/t"
    assert(VersionedTable.currentVersion(spark, dir) == 1L)
    assert(VersionedTable.validateAsOf(spark, dir, 1L)._1)
    val viaPath = spark.read.format("graft-versioned").load(dir)
    assert(viaPath.count() == 20L)
    // and back: a Scala-API append is visible to the next SQL read
    VersionedTable.commit(Seq((99L, "z")).toDF("id", "text"),
      dir, "id", Seq("text"), expectedVersion = 1L, mode = "append")
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 21L)
  }
}
