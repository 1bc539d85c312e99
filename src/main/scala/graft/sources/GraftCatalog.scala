package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.types.{DataType, StructType}
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
  * not hive-style dirs. `ALTER TABLE` is rejected: schema evolution
  * goes through the commit protocol (`allowSchemaEvolution`), never a
  * metadata-only edit that would lie about committed bytes.
  *
  * Namespaces are directories; a directory is a TABLE iff it has a
  * commit log (or a `CREATE TABLE` declaration awaiting v1). Scale
  * shape: every catalog operation is O(children) driver-side listing
  * of tiny metadata — no data touched.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

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
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dirStr = dir.toString
    if (VersionedTable.versions(spark, dirStr).isEmpty) {
      // declared but never written: readable as its empty declared
      // schema, writable (v1 must match the declaration)
      require(versionAsOf.isEmpty && tsMillis.isEmpty,
        s"graft catalog: $ident has no committed versions to time travel to")
      val (schema, idCol) = declared(dir).getOrElse(
        throw new NoSuchTableException(ident))
      new GraftVersionedTable(dirStr, 0L, None, schema, Some((schema, idCol)))
    } else {
      val v = VersionedTable.resolveVersion(spark, dirStr, versionAsOf, tsMillis)
      val schema = VersionedTable.readAsOf(spark, dirStr, v).schema
      schema.fields.foreach { f =>
        require(GraftVersionedSource.supported(f.dataType),
          s"graft catalog: unsupported column type ${f.dataType.simpleString} for '${f.name}'")
      }
      new GraftVersionedTable(dirStr, v,
        Some(VersionedTable.readManifest(spark, dirStr, v)), schema,
        declared(dir))
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
    fs.mkdirs(dir)
    writeSmall(new HPath(dir, "_schema.json"), schema.json)
    writeSmall(new HPath(dir, "_catalog.json"), s"""{"id_col": "$idCol"}""")
    new GraftVersionedTable(dir.toString, 0L, None, schema, Some((schema, idCol)))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE is not supported — schema evolution goes " +
        "through the commit protocol (append with allowSchemaEvolution), " +
        "never a metadata-only edit")

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
}
