package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GraftVersionedBatchWrite, VersionedTable}

/** SQL row-level DML on versioned catalog tables (round 15 —
  * [[graft.sources.GraftRowLevelOperation]] /
  * `SupportsRowLevelOperations`): MERGE INTO with all three clause
  * kinds, UPDATE…SET with cross-column expressions, DELETE with
  * previously-untranslatable predicates, bare DELETE (AlwaysTrue), the
  * copy-on-write version semantics of each, and the
  * optimistic-concurrency loser of the staged batch write. */
class RowLevelDmlSpec extends SparkSuite {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"rdml$n"
    val root = Files.createTempDirectory("rdml").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def mkDocs(c: String): Unit = {
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 10)
      .select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("rdml_src")
    spark.sql(s"INSERT INTO $c.t SELECT id, text FROM rdml_src")
  }

  test("MERGE INTO: matched-delete, matched-update, not-matched-insert land " +
      "as ONE copy-on-write overwrite version; the base snapshot time-travels") {
    val (c, root) = freshCatalog()
    mkDocs(c)
    Seq((2L, "u2"), (4L, "u4"), (6L, "u6"), (100L, "new100"), (101L, "new101"))
      .toDF("id", "text").createOrReplaceTempView("rdml_upd")
    spark.sql(
      s"""MERGE INTO $c.t AS t USING rdml_upd AS u ON t.id = u.id
         |WHEN MATCHED AND u.id = 6 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET text = u.text
         |WHEN NOT MATCHED THEN INSERT (id, text) VALUES (u.id, u.text)
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, text FROM $c.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(0L -> "t0", 1L -> "t1", 2L -> "u2", 3L -> "t3",
      4L -> "u4", 5L -> "t5", 7L -> "t7", 8L -> "t8", 9L -> "t9",
      100L -> "new100", 101L -> "new101"), got)
    // one overwrite version; v1 still reads the pre-merge rows
    val modes = VersionedTable.history(spark, s"$root/t")
      .orderBy("version").collect().map(_.getString(1)).toSeq
    assert(modes == Seq("append", "overwrite"), modes)
    assert(spark.sql(s"SELECT count(*) FROM $c.t VERSION AS OF 1")
      .head.getLong(0) == 10L)
  }

  test("MERGE INTO a declared-but-empty table: every source row is " +
      "not-matched and inserts (the bootstrap shape)") {
    val (c, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .createOrReplaceTempView("rdml_boot")
    spark.sql(
      s"""MERGE INTO $c.t AS t USING rdml_boot AS u ON t.id = u.id
         |WHEN MATCHED THEN UPDATE SET text = u.text
         |WHEN NOT MATCHED THEN INSERT (id, text) VALUES (u.id, u.text)
         |""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 2L)
  }

  test("UPDATE … SET with a cross-column expression keeps row context; " +
      "untouched rows and the pre-update snapshot are intact") {
    val (c, root) = freshCatalog()
    mkDocs(c)
    spark.sql(s"UPDATE $c.t SET text = text || '/' || CAST(id AS STRING) " +
      "WHERE id >= 8")
    val got = spark.sql(s"SELECT id, text FROM $c.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.take(8) == (0 to 7).map(i => i.toLong -> s"t$i"), got)
    assert(got.drop(8) == Seq(8L -> "t8/8", 9L -> "t9/9"), got)
    val modes = VersionedTable.history(spark, s"$root/t")
      .orderBy("version").collect().map(_.getString(1)).toSeq
    assert(modes == Seq("append", "overwrite"), modes)
    assert(spark.sql(s"SELECT text FROM $c.t VERSION AS OF 1 WHERE id = 9")
      .head.getString(0) == "t9")
  }

  test("DELETE with an untranslatable predicate (no V1 filter form) now " +
      "runs through the row-level rewrite instead of being refused") {
    val (c, _) = freshCatalog()
    mkDocs(c)
    // length(text) > 2 has no sources.Filter translation — the r14
    // surface errored in canDeleteWhere; the rewrite path handles it
    spark.sql(s"DELETE FROM $c.t WHERE length(text) > 2 OR id % 2 = 1")
    val got = spark.sql(s"SELECT id FROM $c.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 2L, 4L, 6L, 8L), got)
  }

  test("bare DELETE FROM (no WHERE → AlwaysTrue) empties the table as a " +
      "copy-on-write version — history still time-travels") {
    val (c, root) = freshCatalog()
    mkDocs(c)
    spark.sql(s"DELETE FROM $c.t")
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $c.t VERSION AS OF 1")
      .head.getLong(0) == 10L)
    val rows = VersionedTable.history(spark, s"$root/t")
      .orderBy("version").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows == Seq(1L -> 10L, 2L -> 0L), rows)
  }

  test("concurrency loser: a row-level write whose base version moved " +
      "underneath fails with ConcurrentModificationException, committing nothing") {
    val dir = Files.createTempDirectory("rdml-race").toString + "/t"
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "text"),
      dir, "id", Seq("text"), expectedVersion = 0L)
    // a MERGE/UPDATE write pinned at base v1…
    val bw = new GraftVersionedBatchWrite(dir, schema, 1L, None,
      Some((schema, "id")))
    val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
    w.write(new GenericInternalRow(
      Array[Any](9L, UTF8String.fromString("stale"))))
    val msg = w.commit()
    // …loses to a commit that landed between its scan and its publish
    VersionedTable.commit(Seq((3L, "c")).toDF("id", "text"),
      dir, "id", Seq("text"), expectedVersion = 1L, mode = "append")
    intercept[java.util.ConcurrentModificationException] {
      bw.commit(Array(msg))
    }
    assert(VersionedTable.currentVersion(spark, dir) == 2L)
    assert(VersionedTable.read(spark, dir).filter(col("id") === 9L).count() == 0L)
  }

  private def mkResidueDocs(c: String): Unit = {
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, text STRING) " +
      "TBLPROPERTIES ('idCol' = 'id')")
    spark.range(0, 30)
      .select(col("id"), concat(lit("t"), col("id")).as("text"))
      .createOrReplaceTempView("rdml_res_src")
    (0 to 2).foreach { r =>
      spark.sql(s"INSERT INTO $c.t SELECT id, text FROM rdml_res_src " +
        s"WHERE id % 3 = $r")
    }
  }

  test("PARTIAL rewrite via runtime group filtering: an UPDATE touching one " +
      "of three dirs replaces ONLY that dir (mode 'replace'), unaffected " +
      "dirs survive with their provenance; the digest still validates") {
    val (c, root) = freshCatalog()
    mkResidueDocs(c)
    val dirsBefore = spark.sql(s"SELECT dir FROM $c.t.files ORDER BY dir_pos")
      .collect().map(_.getString(0)).toSeq
    // every id % 3 = 1 row lives in dir 2 (the residue slicing)
    spark.sql(s"UPDATE $c.t SET text = text || '!' WHERE id % 3 = 1")
    val hist = VersionedTable.history(spark, s"$root/t").orderBy("version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(hist.map(_._2) == Seq("append", "append", "append", "replace"), hist)
    assert(hist.last._3 == 30L, hist)
    // v4 keeps the two UNAFFECTED dirs byte-identical and replaces dir 2
    val dirsAfter = spark.sql(s"SELECT dir FROM $c.t.files ORDER BY dir_pos")
      .collect().map(_.getString(0)).toSeq
    assert(dirsAfter.size == 3)
    assert(dirsAfter.toSet.intersect(dirsBefore.toSet)
      == dirsBefore.toSet - dirsBefore(1),
      s"only dir 2 may be replaced: before=$dirsBefore after=$dirsAfter")
    // provenance: untouched rows keep their original commit versions,
    // rewritten rows carry the new one
    val census = spark.sql(s"SELECT _graft_version, count(*) FROM $c.t " +
      "GROUP BY 1 ORDER BY 1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(census == Seq(1L -> 10L, 3L -> 10L, 4L -> 10L), census)
    // content correct + incremental replace-digest matches a full re-derive
    assert(spark.sql(s"SELECT count(*) FROM $c.t WHERE text LIKE '%!'")
      .head.getLong(0) == 10L)
    assert(VersionedTable.validateAsOf(spark, s"$root/t", 4L)._1,
      "replace digest must equal the full re-derivation")
    // time travel to the pre-update snapshot is intact
    assert(spark.sql(s"SELECT count(*) FROM $c.t VERSION AS OF 3 " +
      "WHERE text LIKE '%!'").head.getLong(0) == 0L)
  }

  test("PARTIAL rewrite: a no-match UPDATE publishes NO version; an " +
      "insert-only MERGE lands as a plain append (no rewrite)") {
    val (c, root) = freshCatalog()
    mkResidueDocs(c)
    spark.sql(s"UPDATE $c.t SET text = 'x' WHERE id = 999999")
    assert(VersionedTable.currentVersion(spark, s"$root/t") == 3L,
      "a no-match update must not publish a version")
    // insert-only MERGE: no target row matches ⇒ pure append
    spark.range(100, 105)
      .select(col("id"), lit("new").as("text"))
      .createOrReplaceTempView("rdml_ins_src")
    spark.sql(
      s"""MERGE INTO $c.t AS t USING rdml_ins_src AS u ON t.id = u.id
         |WHEN MATCHED THEN UPDATE SET text = u.text
         |WHEN NOT MATCHED THEN INSERT (id, text) VALUES (u.id, u.text)
         |""".stripMargin)
    val hist = VersionedTable.history(spark, s"$root/t").orderBy("version")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(hist.last == ("append", 35L), hist)
    assert(VersionedTable.validateAsOf(spark, s"$root/t", 4L)._1)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: the table-sync idiom — target " +
      "rows without a source match update or delete by their own clauses") {
    val (c, root) = freshCatalog()
    mkDocs(c)
    Seq((2L, "u2"), (50L, "new50")).toDF("id", "text")
      .createOrReplaceTempView("rdml_sync")
    spark.sql(
      s"""MERGE INTO $c.t AS t USING rdml_sync AS u ON t.id = u.id
         |WHEN MATCHED THEN UPDATE SET text = u.text
         |WHEN NOT MATCHED THEN INSERT (id, text) VALUES (u.id, u.text)
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 8 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.id = 0 THEN UPDATE SET text = 'stale'
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, text FROM $c.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(0L -> "stale", 1L -> "t1", 2L -> "u2", 3L -> "t3",
      4L -> "t4", 5L -> "t5", 6L -> "t6", 7L -> "t7", 50L -> "new50"), got)
    assert(VersionedTable.validateAsOf(spark, s"$root/t",
      VersionedTable.currentVersion(spark, s"$root/t"))._1)
  }

  test("MERGE WITH SCHEMA EVOLUTION: the source's extra column lands as the " +
      "catalog's zero-row evolving append, the merge re-resolves against the " +
      "evolved table, and the whole thing composes with the partial rewrite") {
    val (c, root) = freshCatalog()
    mkDocs(c)
    Seq((2L, "u2", 0.9), (50L, "new50", 0.1)).toDF("id", "text", "score")
      .createOrReplaceTempView("rdml_evo")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $c.t AS t USING rdml_evo AS u
         |ON t.id = u.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, text, score FROM $c.t " +
      "WHERE id IN (1, 2, 50) ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq((1L, "t1", None), (2L, "u2", Some(0.9)),
      (50L, "new50", Some(0.1))), got)
    // history: v1 corpus, v2 = the evolution's zero-row append, v3 = the
    // merge (a replace when the group filter narrowed, else overwrite)
    val hist = VersionedTable.history(spark, s"$root/t").orderBy("version")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(hist.take(2) == Seq(("append", 10L), ("append", 10L)), hist)
    assert(hist(2)._2 == 11L && (hist(2)._1 == "replace" || hist(2)._1 == "overwrite"),
      hist)
    assert(VersionedTable.validateAsOf(spark, s"$root/t", 3L)._1)
    // the 2-column pre-evolution snapshot still time-travels
    assert(spark.sql(s"SELECT * FROM $c.t VERSION AS OF 1").columns.toSeq
      == Seq("id", "text"))
  }

  test("MERGE duplicate source matches fail the cardinality check " +
      "(standard SQL MERGE semantics, not silent double-apply)") {
    val (c, _) = freshCatalog()
    mkDocs(c)
    Seq((2L, "x"), (2L, "y")).toDF("id", "text")
      .createOrReplaceTempView("rdml_dup")
    val ex = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $c.t AS t USING rdml_dup AS u ON t.id = u.id
           |WHEN MATCHED THEN UPDATE SET text = u.text
           |""".stripMargin)
    }
    assert(ex.getMessage.toLowerCase.contains("merge"), ex.getMessage)
  }
}
