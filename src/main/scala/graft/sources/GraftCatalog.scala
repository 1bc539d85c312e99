package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** CATALOG for versioned tables (the Delta/Iceberg `TableCatalog`
  * move — Spark's native SQL front door, one step above the
  * path-based `format("graft-versioned")` reads/writes):
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.lake.root", "/data/lakehouse")
  *
  * CREATE NAMESPACE lake.bronze
  * CREATE TABLE lake.bronze.docs (doc_id BIGINT, text STRING)
  *   TBLPROPERTIES ('idCol' = 'doc_id')
  * INSERT INTO lake.bronze.docs SELECT ...          -- append commit
  * INSERT OVERWRITE lake.bronze.docs SELECT ...     -- overwrite commit
  * SELECT * FROM lake.bronze.docs VERSION AS OF 2   -- time travel
  * SELECT * FROM lake.bronze.docs TIMESTAMP AS OF '...'
  * }}}
  *
  * Identifier → directory: `root/<namespace…>/<table>` — the catalog
  * is a NAMING layer only; every read resolves through the same
  * manifest chain ([[VersionedTable.resolveVersion]]) and every write
  * through the same optimistic commit protocol as the Scala API and
  * the path-based connector, so all three surfaces are one table.
  * `VERSION AS OF` / `TIMESTAMP AS OF` lower onto the standard
  * `loadTable(ident, version|timestampMicros)` hooks.
  *
  * `CREATE TABLE` records the declared schema and id column
  * (`_schema.json` + `_catalog.json` in the table dir — driver-side
  * metadata files, the commit log still owns all data state); the
  * FIRST insert validates its exact (name, type) signature against
  * the declaration and becomes commit v1. Partition transforms are
  * rejected loudly: the versioned table's layout mechanisms are its
  * skipping indexes (statCols/bloomCols) and compaction re-clustering,
  * not hive-style dirs. `ALTER TABLE ADD COLUMN` lowers onto the
  * commit protocol's schema evolution as a zero-row evolving append
  * (see [[alterTable]]); every other ALTER is rejected loudly — it
  * would require rewriting committed bytes, never a metadata-only
  * edit. Maintenance runs through `CALL <cat>.system.vacuum/compact`
  * (see the procedures section).
  *
  * Namespaces are directories; a directory is a TABLE iff it has a
  * commit log (or a `CREATE TABLE` declaration awaiting v1). Scale
  * shape: every catalog operation is O(children) driver-side listing
  * of tiny metadata — no data touched.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var root: HPath = _

  private def spark = SparkSession.active
  private def fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = new HPath(Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name': spark.sql.catalog.$name.root is required")))
  }
  override def name(): String = catalogName

  /** CHECK constraints (round 15 — the Delta invariants move on Spark
    * 4's native ANSI-constraint hooks): the catalog STORES and REPORTS
    * them; the ENGINE enforces them — `ResolveTableConstraints` injects
    * a `CheckInvariant` over every catalog write (INSERT, MERGE,
    * UPDATE), failing the statement before a violating row can commit,
    * and `ALTER TABLE … ADD CONSTRAINT` validates standing rows before
    * this catalog is asked to persist. Only CHECK is accepted: PRIMARY
    * KEY/UNIQUE/FOREIGN KEY would be unenforced metadata (the Delta
    * position) — rejected loudly rather than recorded as a lie. */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def constraintsPath(dir: HPath): HPath =
    new HPath(dir, "_constraints.json")
  private def readChecks(dir: HPath): Seq[(String, String)] = {
    val p = constraintsPath(dir)
    if (!fs.exists(p)) Nil
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(readSmall(p))
      (0 until node.size).map(i =>
        (node.get(i).get("name").asText, node.get(i).get("sql").asText))
    }
  }
  private def writeChecks(dir: HPath, checks: Seq[(String, String)]): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = m.createArrayNode()
    checks.foreach { case (n, sql) =>
      val o = arr.addObject(); o.put("name", n); o.put("sql", sql): Unit
    }
    if (fs.exists(constraintsPath(dir))) fs.delete(constraintsPath(dir), false)
    writeSmall(constraintsPath(dir), m.writeValueAsString(arr))
  }
  private def asChecks(cs: Seq[org.apache.spark.sql.connector.catalog.constraints.Constraint])
      : Seq[(String, String)] =
    cs.map {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        require(c.predicateSql != null && c.predicateSql.nonEmpty,
          s"graft catalog: CHECK constraint ${c.name} carries no predicate SQL")
        (c.name, c.predicateSql)
      case other => sys.error(
        s"graft catalog: only CHECK constraints are supported (enforced on " +
          s"every write) — ${other.toDDL} would be unenforced metadata")
    }

  private def pathOf(parts: Seq[String]): HPath =
    parts.foldLeft(root)((p, s) => new HPath(p, s))
  private def dirOf(ident: Identifier): HPath =
    pathOf(ident.namespace.toSeq :+ ident.name)

  private def isTable(p: HPath): Boolean =
    fs.exists(new HPath(p, "_commits")) || fs.exists(new HPath(p, "_schema.json"))

  private def readSmall(p: HPath): String = {
    val in = fs.open(p)
    try org.apache.commons.io.IOUtils.toString(in, java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
  private def writeSmall(p: HPath, s: String): Unit = {
    val out = fs.create(p, false)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The CREATE TABLE declaration, if present: (schema, idCol). */
  private def declared(dir: HPath): Option[(StructType, String)] = {
    val sp = new HPath(dir, "_schema.json")
    if (!fs.exists(sp)) None
    else {
      val schema = DataType.fromJson(readSmall(sp)).asInstanceOf[StructType]
      val idCol = """"id_col": "([^"]*)"""".r
        .findFirstMatchIn(readSmall(new HPath(dir, "_catalog.json")))
        .map(_.group(1))
        .getOrElse(sys.error(s"graft catalog: $dir/_catalog.json missing id_col"))
      Some((schema, idCol))
    }
  }

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = pathOf(namespace.toSeq)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(catalogName +: namespace)
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && isTable(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .sortBy(_.name)
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    fs.exists(dir) && isTable(dir)
  }

  private def load(ident: Identifier, versionAsOf: Option[Long],
      tsMillis: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (!tableExists(ident)) {
      // METADATA TABLES through catalog identifiers (the Iceberg
      // `SELECT * FROM cat.ns.t.history` surface — round 15): when the
      // identifier's name is a metadata kind and its namespace resolves
      // to a TABLE, serve that table's history/files relation. Time
      // travel composes: `cat.ns.t.files VERSION AS OF 2` lists v2's
      // dirs. Resolution order keeps real tables authoritative — a
      // directory named `history` that IS a table wins above.
      val parentIsTable = ident.namespace.nonEmpty && {
        val p = Identifier.of(ident.namespace.init, ident.namespace.last)
        tableExists(p)
      }
      if (parentIsTable && (ident.name == "history" || ident.name == "files")) {
        val tDir = pathOf(ident.namespace.toSeq).toString
        require(VersionedTable.versions(spark, tDir).nonEmpty,
          s"graft catalog: ${ident.namespace.mkString(".")} has no committed " +
            "versions — no metadata to read")
        val v = VersionedTable.resolveVersion(spark, tDir, versionAsOf, tsMillis)
        return new GraftVersionedMetadataTable(tDir, ident.name, v)
      }
      throw new NoSuchTableException(ident)
    }
    val dirStr = dir.toString
    if (VersionedTable.versions(spark, dirStr).isEmpty) {
      // declared but never written: readable as its empty declared
      // schema, writable (v1 must match the declaration)
      require(versionAsOf.isEmpty && tsMillis.isEmpty,
        s"graft catalog: $ident has no committed versions to time travel to")
      val (schema, idCol) = declared(dir).getOrElse(
        throw new NoSuchTableException(ident))
      new GraftVersionedTable(dirStr, 0L, None, schema, Some((schema, idCol)),
        acceptAnySchema = false, checks = readChecks(dir))
    } else {
      val v = VersionedTable.resolveVersion(spark, dirStr, versionAsOf, tsMillis)
      val committed = VersionedTable.readAsOf(spark, dirStr, v).schema
      committed.fields.foreach { f =>
        require(GraftVersionedSource.supported(f.dataType),
          s"graft catalog: unsupported column type ${f.dataType.simpleString} for '${f.name}'")
      }
      // COLUMN DEFAULTS ride in StructField METADATA, which parquet
      // footers do not carry — overlay the CREATE TABLE declaration's
      // field metadata (by name) onto the committed schema so an
      // INSERT omitting defaulted columns keeps resolving after v1
      val decl = declared(dir)
      val schema = decl.map(_._1) match {
        case Some(ds) => StructType(committed.fields.map { f =>
          ds.fields.find(_.name == f.name)
            .filter(_.metadata != org.apache.spark.sql.types.Metadata.empty)
            .map(d => f.copy(metadata = d.metadata)).getOrElse(f)
        })
        case None => committed
      }
      new GraftVersionedTable(dirStr, v,
        Some(VersionedTable.readManifest(spark, dirStr, v)), schema,
        decl, acceptAnySchema = false, checks = readChecks(dir))
    }
  }

  override def loadTable(ident: Identifier): Table = load(ident, None, None)
  /** `VERSION AS OF <n>` lowers here. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(java.lang.Long.parseLong(version)), None)
  /** `TIMESTAMP AS OF <ts>` lowers here (MICROseconds since epoch). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, None, Some(Math.floorDiv(timestampMicros, 1000L)))

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    require(info.partitions().isEmpty,
      "graft catalog: partition transforms are not supported — the versioned " +
        "table's layout mechanisms are its skipping indexes (statCols/bloomCols) " +
        "and compaction re-clustering, not hive-style partition dirs")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val schema = info.schema()
    require(schema.nonEmpty, "graft catalog: CREATE TABLE needs at least one column")
    schema.fields.foreach { f =>
      require(GraftVersionedSource.supported(f.dataType),
        s"graft catalog: unsupported column type ${f.dataType.simpleString} for '${f.name}'")
    }
    val idCol = info.properties().asScala
      .collectFirst { case (k, v) if k.equalsIgnoreCase("idcol") => v }
      .getOrElse(schema.fieldNames.head) // documented default: first column
    require(schema.fieldNames.contains(idCol),
      s"graft catalog: idCol '$idCol' is not a declared column")
    val dir = dirOf(ident)
    val checks = asChecks(info.constraints().toSeq)
    fs.mkdirs(dir)
    writeSmall(new HPath(dir, "_schema.json"), schema.json)
    writeSmall(new HPath(dir, "_catalog.json"), s"""{"id_col": "$idCol"}""")
    if (checks.nonEmpty) writeChecks(dir, checks)
    new GraftVersionedTable(dir.toString, 0L, None, schema, Some((schema, idCol)),
      acceptAnySchema = false, checks = checks)
  }

  /** `ALTER TABLE … ADD COLUMN` (round-15 verdict task 6), lowered onto
    * the COMMIT PROTOCOL's declared schema evolution — never a
    * metadata-only edit that would lie about committed bytes: the new
    * column lands as a ZERO-ROW evolving append
    * (`allowSchemaEvolution`, the q213 machinery), so the manifest's
    * merge-read flag flips and every standing row reads back NULL for
    * the added column — exactly what an `INSERT` carrying the column
    * would have done, minus the rows. Only top-level nullable ADDs of
    * connector-supported types are accepted; every other change (type
    * evolution, drops, renames, repositioning) stays a loud rejection —
    * those genuinely require rewriting committed bytes. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // CONSTRAINT changes arrive on their own (each ALTER … ADD/DROP
    // CONSTRAINT is one statement); the engine has already VALIDATED
    // standing rows for an enforced ADD before calling here
    val conAdds = changes.collect { case c: TableChange.AddConstraint => c }
    val conDrops = changes.collect { case d: TableChange.DropConstraint => d }
    if (conAdds.nonEmpty || conDrops.nonEmpty) {
      require(conAdds.size + conDrops.size == changes.size,
        "graft catalog: constraint changes cannot mix with other ALTERs")
      val dir = dirOf(ident)
      var checks = readChecks(dir)
      conAdds.foreach { a =>
        val Seq((n, sql)) = asChecks(Seq(a.constraint()))
        require(!checks.exists(_._1 == n),
          s"graft catalog: constraint '$n' already exists on $ident")
        checks :+= ((n, sql))
      }
      conDrops.foreach { d =>
        if (checks.exists(_._1 == d.name)) checks = checks.filterNot(_._1 == d.name)
        else if (!d.ifExists) sys.error(
          s"graft catalog: no constraint '${d.name}' on $ident")
      }
      writeChecks(dir, checks)
      return loadTable(ident)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    require(adds.nonEmpty && adds.size == changes.size,
      "graft catalog: ALTER TABLE supports only ADD COLUMN — type changes, " +
        "drops, renames and repositioning would require rewriting committed " +
        "bytes; evolve those with an explicit overwrite commit")
    adds.foreach { a =>
      require(a.fieldNames.length == 1,
        s"graft catalog: ADD COLUMN ${a.fieldNames.mkString(".")} — nested " +
          "columns are not supported (the versioned table commits flat schemas)")
      require(a.isNullable,
        s"graft catalog: ADD COLUMN ${a.fieldNames.head} must be nullable — " +
          "standing rows read back NULL for an added column")
      require(a.position() == null,
        s"graft catalog: ADD COLUMN ${a.fieldNames.head} with a position is " +
          "not supported — added columns append at the end of the schema")
      require(a.defaultValue() == null,
        s"graft catalog: ADD COLUMN ${a.fieldNames.head} with a DEFAULT is " +
          "not supported — standing rows read an added column as NULL (the " +
          "merge-read contract); a backfilled default would claim bytes that " +
          "were never committed. Declare defaults at CREATE TABLE")
      require(GraftVersionedSource.supported(a.dataType),
        s"graft catalog: unsupported column type ${a.dataType.simpleString} " +
          s"for added column '${a.fieldNames.head}'")
    }
    val dir = dirOf(ident)
    val dirStr = dir.toString
    val cur = VersionedTable.currentVersion(spark, dirStr)
    if (cur == 0L) {
      // declared, never written: evolve the declaration itself — v1 will
      // validate against it
      val (schema, idCol) = declared(dir).getOrElse(
        throw new NoSuchTableException(ident))
      schema.fieldNames.intersect(adds.map(_.fieldNames.head)).headOption.foreach(
        c => sys.error(s"graft catalog: column '$c' already exists in $ident"))
      val evolved = StructType(schema.fields ++ adds.map(a =>
        StructField(a.fieldNames.head, a.dataType, nullable = true)))
      fs.delete(new HPath(dir, "_schema.json"), false)
      writeSmall(new HPath(dir, "_schema.json"), evolved.json)
      new GraftVersionedTable(dirStr, 0L, None, evolved, Some((evolved, idCol)),
        acceptAnySchema = false)
    } else {
      val m = VersionedTable.readManifest(spark, dirStr, cur)
      val standing = VersionedTable.readAsOf(spark, dirStr, cur).schema
      standing.fieldNames.intersect(adds.map(_.fieldNames.head)).headOption.foreach(
        c => sys.error(s"graft catalog: column '$c' already exists in $ident"))
      val evolved = StructType(standing.fields ++ adds.map(a =>
        StructField(a.fieldNames.head, a.dataType, nullable = true)))
      // zero-row evolving append: one empty schema-carrying parquet file
      // enters the commit log (repartition(1) pins one write task so the
      // footer lands even with no rows) — history shows the evolution as
      // a real version, exactly like a row-carrying evolved INSERT
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), evolved)
        .repartition(1)
      VersionedTable.commit(empty, dirStr, m.idCol, m.contentCols,
        expectedVersion = cur, mode = "append", allowSchemaEvolution = true): Unit
      // keep a standing declaration (if any) in step, so a later
      // first-insert gate can never see a stale column list
      if (fs.exists(new HPath(dir, "_schema.json"))) {
        fs.delete(new HPath(dir, "_schema.json"), false)
        writeSmall(new HPath(dir, "_schema.json"), evolved.json)
      }
      loadTable(ident)
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!tableExists(ident)) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val dest = dirOf(newIdent)
    if (!fs.exists(dest.getParent)) fs.mkdirs(dest.getParent)
    if (!fs.rename(dirOf(oldIdent), dest))
      sys.error(s"graft catalog: rename $oldIdent -> $newIdent failed")
  }

  // -------------------------------------------------------- namespaces

  private def childNamespaces(p: HPath): Seq[String] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && !isTable(s.getPath))
      .map(_.getPath.getName).sorted

  override def listNamespaces(): Array[Array[String]] =
    childNamespaces(root).map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val p = pathOf(namespace.toSeq)
    if (namespace.nonEmpty && !fs.exists(p))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    childNamespaces(p).map(n => namespace :+ n).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = pathOf(namespace.toSeq)
    namespace.isEmpty || (fs.exists(p) && !isTable(p))
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    java.util.Collections.emptyMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace) && fs.exists(pathOf(namespace.toSeq)))
      throw new NamespaceAlreadyExistsException(catalogName +: namespace)
    fs.mkdirs(pathOf(namespace.toSeq)): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = pathOf(namespace.toSeq)
    if (!namespaceExists(namespace) || !fs.exists(p))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new NonEmptyNamespaceException(catalogName +: namespace)
    fs.delete(p, true)
  }

  // -------------------------------------------------------- procedures

  /** TABLE-MAINTENANCE PROCEDURES (round-15 verdict task 5 — the
    * Iceberg `CALL catalog.system.<proc>` surface, Spark 4's native
    * `ProcedureCatalog`): [[VersionedTable.vacuum]] and
    * [[VersionedTable.compact]] become SQL statements —
    *
    * {{{
    * CALL lake.system.vacuum(table => 'ns.t', retain => 2, grace_ms => 0)
    * CALL lake.system.compact(table => 'ns.t', target_partitions => 1,
    *                          sort_cols => 'host,fetched_at')
    * }}}
    *
    * Each returns one LOCAL result row (the driver-side counts the
    * library call already reports) through Spark's `LocalScan` hook —
    * procedures are side-effecting maintenance, not data scans. The
    * `system` namespace is virtual: it never collides with a directory
    * namespace because procedures and tables resolve through different
    * hooks. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array("compact", "vacuum", "zorder").map(Identifier.of(namespace, _))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.toSeq == Seq("system"),
      s"graft catalog: procedures live in the 'system' namespace " +
        s"(CALL $catalogName.system.<proc>), got $ident")
    ident.name match {
      case "vacuum" => GraftCatalog.VacuumProcedure(this)
      case "compact" => GraftCatalog.CompactProcedure(this)
      case "zorder" => GraftCatalog.ZOrderProcedure(this)
      case other => sys.error(
        s"graft catalog: unknown procedure '$other' — supported: vacuum, " +
          "compact, zorder")
    }
  }

  /** Resolve a procedure's `table` argument ('t' or 'ns.t', relative to
    * this catalog) to its directory. */
  private[sources] def tableDirOf(tableArg: String): String = {
    val parts = tableArg.split("\\.").toSeq
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"graft catalog: bad table argument '$tableArg' — expected 'ns.table'")
    val ident = Identifier.of(parts.init.toArray, parts.last)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    dirOf(ident).toString
  }
}

object GraftCatalog {
  private def oneRowScan(schema: StructType, values: Array[Any]): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(new GenericInternalRow(values))
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  /** `CALL <cat>.system.vacuum(table, retain, grace_ms)` — age
    * unreferenced data dirs and expired manifests out of the retention
    * window. `grace_ms` defaults to the library's 6-hour orphan grace
    * (an in-flight writer's staged dir must never be swept mid-commit);
    * pass 0 to reclaim immediately when no writer can be racing. */
  final case class VacuumProcedure(cat: GraftCatalog)
      extends BoundProcedure with UnboundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "reclaim data dirs and manifests outside the retention window"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("retain", IntegerType).build(),
      ProcedureParameter.in("grace_ms", LongType)
        .defaultValue(VersionedTable.DefaultVacuumGraceMs.toString).build())
    override def bind(inputType: StructType): BoundProcedure = this
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = cat.tableDirOf(input.getUTF8String(0).toString)
      val (deadDirs, deadManifests) = VersionedTable.vacuum(
        SparkSession.active, dir, input.getInt(1), input.getLong(2))
      oneRowScan(
        StructType(Seq(StructField("removed_data_dirs", IntegerType, nullable = false),
          StructField("removed_manifests", IntegerType, nullable = false))),
        Array[Any](deadDirs, deadManifests))
    }
  }

  /** `CALL <cat>.system.zorder(table, col_a, col_b, target_partitions,
    * bits)` — rewrite the current version re-clustered on the
    * INTERLEAVED bits of two columns ([[VersionedTable.compactZOrdered]]
    * — the OPTIMIZE ZORDER shape): point/range reads on EITHER column
    * turn into row-group skips, where a lexicographic sort only serves
    * the leading column. Content-identical new version, same optimistic
    * publish. */
  final case class ZOrderProcedure(cat: GraftCatalog)
      extends BoundProcedure with UnboundProcedure {
    override def name(): String = "zorder"
    override def description(): String =
      "rewrite the current version z-order-clustered on two columns"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("col_a", StringType).build(),
      ProcedureParameter.in("col_b", StringType).build(),
      ProcedureParameter.in("target_partitions", IntegerType)
        .defaultValue("1").build(),
      ProcedureParameter.in("bits", IntegerType).defaultValue("21").build())
    override def bind(inputType: StructType): BoundProcedure = this
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = cat.tableDirOf(input.getUTF8String(0).toString)
      val v = VersionedTable.compactZOrdered(SparkSession.active, dir,
        input.getUTF8String(1).toString, input.getUTF8String(2).toString,
        targetPartitions = input.getInt(3), bits = input.getInt(4))
      oneRowScan(
        StructType(Seq(StructField("new_version", LongType, nullable = false))),
        Array[Any](v))
    }
  }

  /** `CALL <cat>.system.compact(table, target_partitions, sort_cols)` —
    * rewrite the current version into `target_partitions` files
    * (optionally re-clustered by `sort_cols`, comma-separated) as a new
    * content-identical version; small dirs age out via vacuum. */
  final case class CompactProcedure(cat: GraftCatalog)
      extends BoundProcedure with UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite the current version into fewer (optionally re-clustered) files"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("target_partitions", IntegerType)
        .defaultValue("1").build(),
      ProcedureParameter.in("sort_cols", StringType).defaultValue("''").build())
    override def bind(inputType: StructType): BoundProcedure = this
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = cat.tableDirOf(input.getUTF8String(0).toString)
      val sortCols = input.getUTF8String(2).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val v = VersionedTable.compact(SparkSession.active, dir,
        targetPartitions = input.getInt(1), sortCols = sortCols)
      oneRowScan(
        StructType(Seq(StructField("new_version", LongType, nullable = false))),
        Array[Any](v))
    }
  }
}
