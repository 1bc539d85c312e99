package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, InsertableRelation, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 front door for [[VersionedTable]] — the lakehouse's
  * plain-SQL surface (round-13, the q210 move applied to the
  * versioned table):
  *
  * {{{
  * spark.read.format("graft-versioned")
  *   .option("versionAsOf", 3)          // or timestampAsOf = epoch ms
  *   .load(tableDir)
  *   .filter($"doc_id".isin(9, 33, 63)) // bloom/stat dirs pruned at plan time
  * }}}
  *
  * resolves through the SAME manifest chain as the Scala API
  * ([[VersionedTable.resolveVersion]]), so SQL and Scala can never
  * read different snapshots for the same options — and gets the
  * manifest's data skipping through ordinary filters instead of the
  * dedicated `readAsOfWhere`/`readAsOfWhereEq`/`readAsOfPoint`
  * entry points:
  *
  *  - **id range/point pruning**: `=`, `IN`, `<`, `<=`, `>`, `>=` on
  *    the table's id column intersect against the manifest's per-dir
  *    id min/max (the Delta checkpoint-stats recipe).
  *  - **string-stat equality pruning**: `=`/`IN` on a `statCols`
  *    column checks the per-dir lexicographic band.
  *  - **bloom point pruning**: `=`/`IN` on a `bloomCols` column probes
  *    the per-dir bloom (md5-sliced positions — the same digest the
  *    commit computed, [[VersionedTable.bloomPositions]]).
  *
  * Every filter is also RETURNED as residual from `pushFilters`, so
  * Spark re-applies it row-level: pruning is an access-path hint,
  * never the correctness carrier (a dir without stats/bloom for the
  * column is conservatively kept — the [[VersionedTable]] contract,
  * verbatim). Column pruning pushes the projection into the parquet
  * readers (`SupportsPushDownRequiredColumns`), and the scan reports
  * kept-file byte statistics so a pruned fixture joined against a big
  * table broadcasts.
  *
  * Schema-evolution (merge-read) chains work by construction: each
  * partition reader emits the snapshot's UNION schema and NULL-fills
  * fields its file predates — the same shape
  * [[VersionedTable.prunedRead]] guarantees, enforced here per file
  * rather than per plan.
  *
  * Supported column types are the versioned table's committed shapes:
  * flat BOOLEAN/INT/BIGINT/FLOAT/DOUBLE/STRING/BINARY columns
  * (everything the declared fixtures and queries commit). A chain
  * whose schema falls outside that is rejected LOUDLY at resolution
  * time — never a silently wrong scan.
  *
  * Scale shape: one input partition per data FILE, size-binned like
  * the WARC connector is not needed here because the commit path
  * already controls file sizes (one dir per commit, files from the
  * writing job's partitioning); at 1000 executors the per-file
  * partitions ARE the parallelism, and dir pruning removes whole
  * commits from the scan before a single task launches.
  */
class GraftVersionedSource extends TableProvider with DataSourceRegister {
  // VERSION PIN (ADVICE r13): inferSchema and getTable are two separate
  // driver calls; without a pin, a commit landing between them would
  // make the scan read a NEWER snapshot than the one the schema was
  // inferred from (a schema-evolved column silently absent). The first
  // resolution per (path, versionAsOf, timestampAsOf) option set is
  // cached on this provider instance — Spark constructs a fresh
  // provider per read, so the pin's lifetime is one resolution, which
  // is exactly the window that needs the consistency.
  @volatile private var pinned: Map[String, Long] = Map.empty
  private def pinKey(path: String, options: CaseInsensitiveStringMap): String =
    path + "|" + Option(options.get("versionAsOf")).getOrElse("") +
      "|" + Option(options.get("timestampAsOf")).getOrElse("")
  private def pinnedVersion(spark: SparkSession, path: String,
      options: CaseInsensitiveStringMap): Long = {
    val key = pinKey(path, options)
    pinned.getOrElse(key, {
      val v = GraftVersionedSource.resolvedVersion(spark, path, options)
      pinned += key -> v
      v
    })
  }

  override def shortName(): String = "graft-versioned"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-versioned: .load(<tableDir>) is required"))
    GraftVersionedSource.metadataKind(options) match {
      case Some(kind) => GraftVersionedMetadataTable.schemaOf(kind)
      case None =>
        if (VersionedTable.versions(spark, path).isEmpty)
          // no commits yet: an EMPTY schema enables create-on-first-write
          // (the write path takes the data schema; ACCEPT_ANY_SCHEMA skips
          // output resolution against this placeholder) — a READ of the
          // empty table still fails loudly in newScanBuilder
          new StructType()
        else {
          val v = pinnedVersion(spark, path, options)
          val schema = VersionedTable.readAsOf(spark, path, v).schema
          schema.fields.foreach { f =>
            require(GraftVersionedSource.supported(f.dataType),
              s"graft-versioned: unsupported column type ${f.dataType.simpleString} " +
                s"for '${f.name}' — the connector reads the flat primitive schemas " +
                "the versioned table commits (boolean/int/bigint/float/double/string/binary)")
          }
          schema
        }
    }
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val spark = SparkSession.active
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-versioned: .load(<tableDir>) is required"))
    val opts = new CaseInsensitiveStringMap(properties)
    GraftVersionedSource.metadataKind(opts) match {
      case Some(kind) =>
        val v = pinnedVersion(spark, path, opts)
        new GraftVersionedMetadataTable(path, kind, v)
      case None =>
        if (VersionedTable.versions(spark, path).isEmpty)
          new GraftVersionedTable(path, 0L, None, schema)
        else {
          // reuse the schema-time resolution (the pin): schema and scan
          // always address the same snapshot
          val v = pinnedVersion(spark, path, opts)
          new GraftVersionedTable(path, v,
            Some(VersionedTable.readManifest(spark, path, v)), schema)
        }
    }
  }
  override def supportsExternalMetadata(): Boolean = false
}

object GraftVersionedSource {
  private[sources] def resolvedVersion(spark: SparkSession, path: String,
      options: CaseInsensitiveStringMap): Long =
    VersionedTable.resolveVersion(spark, path,
      Option(options.get("versionAsOf")).map(_.toLong),
      Option(options.get("timestampAsOf")).map(_.toLong))

  private[sources] def metadataKind(options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("metadata")).map { k =>
      require(k == "history" || k == "files",
        s"graft-versioned: unknown metadata table '$k' — supported: history, files")
      k
    }

  private[sources] def supported(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BinaryType => true
    case _ => false
  }

  /** V1 Filter → Column, for `DELETE FROM` conditions (None = a shape
    * this translation doesn't carry — canDeleteWhere then refuses and
    * the caller falls back to the Scala API). */
  private[sources] def filterToColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(c, v) => Some(col(c) === lit(v))
      case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
      case GreaterThan(c, v) => Some(col(c) > lit(v))
      case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
      case LessThan(c, v) => Some(col(c) < lit(v))
      case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
      case In(c, vs) => Some(col(c).isin(vs.toIndexedSeq.map(lit(_)): _*))
      case IsNull(c) => Some(col(c).isNull)
      case IsNotNull(c) => Some(col(c).isNotNull)
      case StringStartsWith(c, v) => Some(col(c).startsWith(v))
      case StringEndsWith(c, v) => Some(col(c).endsWith(v))
      case StringContains(c, v) => Some(col(c).contains(v))
      case And(l, r) => for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a && b
      case Or(l, r) => for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a || b
      case Not(x) => filterToColumn(x).map(!_)
      case _ => None
    }
  }
}

class GraftVersionedTable(path: String, version: Long,
    m: Option[VersionedTable.Manifest], tableSchema: StructType,
    declared: Option[(StructType, String)] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {
  override def name(): String = s"graft_versioned(`$path`@v$version)"
  override def schema(): StructType = tableSchema
  // ACCEPT_ANY_SCHEMA: output resolution is delegated to
  // [[VersionedTable.commit]]'s own gates (exact name+type signature on
  // append, explicit allowSchemaEvolution) — the same division of labor
  // Delta declares; without it a create-on-first-write (empty placeholder
  // schema) could never resolve.
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    m match {
      case Some(manifest) =>
        new GraftVersionedScanBuilder(path, manifest, tableSchema,
          Option(options.get("startingVersion")).map(_.toLong),
          Option(options.get("ignoreChanges")).exists(_.toBoolean))
      case None if tableSchema.nonEmpty =>
        // CREATE TABLE declared, never written: standard SQL reads it as
        // zero rows of the declared schema
        new ScanBuilder {
          override def build(): Scan = new Scan with Batch {
            override def readSchema(): StructType = tableSchema
            override def toBatch: Batch = this
            override def description(): String =
              s"graft-versioned $path (declared, no commits)"
            override def planInputPartitions(): Array[InputPartition] = Array.empty
            override def createReaderFactory(): PartitionReaderFactory =
              new GraftVersionedReaderFactory(tableSchema,
                new SerializableHadoopConf(
                  graft.operators.InvertedIndex.activeHadoopConf()))
          }
        }
      case None => sys.error(
        s"graft-versioned: $path has no committed versions — nothing to read " +
          "(write first, or check the path)")
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftVersionedWriteBuilder(path, info, declared)

  /** SQL `DELETE FROM <catalog>.<ns>.<t> WHERE …` — lowers onto
    * [[VersionedTable.deleteWhere]]'s copy-on-write rewrite (a NEW
    * version minus the matching rows through the same optimistic
    * publish; history still time-travels, vacuum ages the bytes out —
    * the GDPR story stays the library one). A condition this V1-filter
    * translation can't carry is REFUSED in canDeleteWhere, so Spark
    * errors loudly instead of deleting the wrong rows. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(GraftVersionedSource.filterToColumn(_).nonEmpty)
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val pred = filters.toSeq.flatMap(GraftVersionedSource.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    VersionedTable.deleteWhere(spark, path, pred): Unit
  }
}

/** SQL-NATIVE WRITE PATH (round-14 verdict task 2): routes
  * `df.write.format("graft-versioned").mode("append"|"overwrite")
  * .save(tableDir)` through the SAME commit protocol as the Scala API
  * ([[VersionedTable.commit]]) — optimistic concurrency, digest
  * accounting, stats/bloom registration, append schema gate — via
  * Spark's V1Write bridge (`V1_BATCH_WRITE`): the commit protocol is a
  * whole-DataFrame publish (write dir → digest → stage manifest →
  * rename), so the InsertableRelation surface that hands the planner's
  * DataFrame to the driver IS the right granularity; per-row
  * DataWriters would have to reassemble exactly this.
  *
  * Options (all optional on an existing table):
  *  - `idCol` — manifest id column; default: the standing manifest's.
  *    REQUIRED on first write (table creation).
  *  - `contentCols` — comma-separated digest columns; default: the
  *    standing manifest's (creation default: every non-id column).
  *  - `expectedVersion` — the optimistic-concurrency base; default:
  *    the table's current version at insert time. Pass explicitly to
  *    surface the loser path through SQL (a stale writer raises
  *    [[java.util.ConcurrentModificationException]]).
  *  - `statCols`, `bloomCols` — comma-separated index registrations,
  *    same as the Scala API.
  *  - `allowSchemaEvolution` — append may ADD columns (merge-read).
  *
  * `mode("overwrite")` arrives as the truncate() call (Spark's
  * OverwriteByExpression with the always-true filter) and maps to the
  * commit's `overwrite` mode; `mode("append")` maps to `append`. */
class GraftVersionedWriteBuilder(path: String, info: LogicalWriteInfo,
    declared: Option[(StructType, String)] = None)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    /** `ds.writeStream.format("graft-versioned")` — the NATIVE
      * streaming sink (outputMode append → one append commit per
      * micro-batch; outputMode complete arrives via truncate() → one
      * overwrite commit per micro-batch, the aggregate-snapshot
      * shape). See [[GraftVersionedStreamingWrite]]. */
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftVersionedStreamingWrite(path, info, declared, overwrite)
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
            ignored: Boolean): Unit = {
          val opts = info.options()
          val spark = data.sparkSession
          val cur = VersionedTable.currentVersion(spark, path)
          val standing: Option[VersionedTable.Manifest] =
            if (cur > 0) Some(VersionedTable.readManifest(spark, path, cur)) else None
          // OUTPUT RESOLUTION (ACCEPT_ANY_SCHEMA means the analyzer
          // skipped it, so the bridge does Delta's job here): against
          // the KNOWN target schema (standing version, or the CREATE
          // TABLE declaration), resolve BY NAME when the incoming
          // column-name set matches (a df.write with reordered columns
          // maps by name, never silently by position), else BY POSITION
          // when the column count matches (SQL `INSERT INTO … VALUES/
          // SELECT` semantics — literal frames arrive as col1, col2,
          // …), casting to the target types (ANSI: a narrowing cast
          // that loses data throws, never corrupts). Any other shape
          // passes through to the commit protocol's own gates
          // (schema evolution's extra columns included).
          import org.apache.spark.sql.functions.col
          val target: Option[StructType] =
            (if (cur > 0) Some(VersionedTable.readAsOf(spark, path, cur).schema)
             else None).orElse(declared.map(_._1))
          // a SCHEMA-CHANGING overwrite (Delta's overwriteSchema option):
          // skip resolution entirely — the incoming frame's schema re-bases
          // the table, exactly as the Scala API's overwrite commit does
          val overwriteSchema = overwrite &&
            Option(opts.get("overwriteSchema")).exists(_.toBoolean)
          val adapted = if (overwriteSchema) data else target match {
            case Some(ts) if data.columns.toSet == ts.fieldNames.toSet =>
              data.select(ts.fields.toSeq.map(f =>
                col(f.name).cast(f.dataType).as(f.name)): _*)
            case Some(ts) if data.columns.length == ts.length &&
                !Option(opts.get("allowSchemaEvolution")).exists(_.toBoolean) =>
              data.toDF(ts.fieldNames.toSeq: _*)
                .select(ts.fields.toSeq.map(f =>
                  col(f.name).cast(f.dataType).as(f.name)): _*)
            case _ => data
          }
          // CATALOG-DECLARED schema gate: the commit protocol's append
          // gate only fires from v2 on (v1 defines the schema for a
          // path-based table), but a CREATE TABLE declared the shape —
          // the FIRST insert must match it (after resolution above), or
          // the declaration was a lie
          def sig(s: StructType) =
            s.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
          declared.foreach { case (schema, _) =>
            if (cur == 0 && sig(adapted.schema) != sig(schema))
              sys.error(s"graft catalog: first insert into $path has schema " +
                s"${adapted.schema.simpleString}, but CREATE TABLE declared " +
                s"${schema.simpleString} — names and types must match exactly")
          }
          val idCol = Option(opts.get("idCol"))
            .orElse(standing.map(_.idCol))
            .orElse(declared.map(_._2))
            .getOrElse(throw new IllegalArgumentException(
              s"graft-versioned: first write to $path must declare " +
                ".option(\"idCol\", …) — the manifest digest needs an id column"))
          require(adapted.columns.contains(idCol),
            s"graft-versioned: idCol '$idCol' is not a column of the written " +
              s"data (${adapted.columns.mkString(", ")})")
          val contentCols = Option(opts.get("contentCols"))
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .orElse(standing.map(_.contentCols))
            .getOrElse(adapted.columns.filterNot(_ == idCol).toSeq)
          def csv(k: String): Seq[String] = Option(opts.get(k))
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
          val expected = Option(opts.get("expectedVersion")).map(_.toLong)
            .getOrElse(cur)
          VersionedTable.commit(adapted, path, idCol, contentCols,
            expectedVersion = expected,
            mode = if (overwrite) "overwrite" else "append",
            statCols = csv("statCols"),
            allowSchemaEvolution =
              Option(opts.get("allowSchemaEvolution")).exists(_.toBoolean),
            bloomCols = csv("bloomCols")): Unit
        }
      }
  }
}

/** METADATA TABLES through the connector (round-14 verdict task 3 —
  * the Delta `DESCRIBE HISTORY` / Iceberg `.files` surface):
  * `.option("metadata", "history")` serves [[VersionedTable.history]]'s
  * rows, `"files"` serves [[VersionedTable.files]] for the resolved
  * version (versionAsOf/timestampAsOf compose). Rows are derived from
  * the O(versions) driver-side manifests at PLAN time and shipped in
  * the single input partition — metadata scale, no data files touched,
  * same as the library calls they mirror. */
class GraftVersionedMetadataTable(path: String, kind: String, version: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_versioned(`$path`@v$version).$kind"
  override def schema(): StructType = GraftVersionedMetadataTable.schemaOf(kind)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftVersionedMetadataScan(path, kind, version)
    }
}

object GraftVersionedMetadataTable {
  def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("mode", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_dirs", LongType, nullable = false),
      StructField("batch_id", LongType, nullable = true),
      StructField("committed_at_ms", LongType, nullable = true)))
    case "files" => StructType(Seq(
      StructField("dir_pos", LongType, nullable = false),
      StructField("dir", StringType, nullable = false),
      StructField("id_lo", LongType, nullable = true),
      StructField("id_hi", LongType, nullable = true),
      StructField("n_stat_cols", LongType, nullable = false),
      StructField("has_bloom", BooleanType, nullable = false)))
    case other => sys.error(s"graft-versioned: unknown metadata table '$other'")
  }
}

/** One partition carrying the driver-derived metadata rows (tiny by
  * construction: one row per version or per data dir). */
case class GraftVersionedMetadataPartition(rows: Seq[Seq[Any]]) extends InputPartition

class GraftVersionedMetadataScan(path: String, kind: String, version: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = GraftVersionedMetadataTable.schemaOf(kind)
  override def toBatch: Batch = this
  override def description(): String = s"graft-versioned $path metadata=$kind"
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val rows: Seq[Seq[Any]] = kind match {
      case "history" =>
        VersionedTable.versions(spark, path).map { v =>
          val m = VersionedTable.readManifest(spark, path, v)
          Seq[Any](v, m.mode, m.rows, m.dirs.size.toLong,
            m.batchId.orNull, m.committedAtMs.orNull)
        }
      case "files" =>
        val m = VersionedTable.readManifest(spark, path, version)
        m.dirs.zipWithIndex.map { case (d, i) =>
          val stats = m.dirStats.get(d)
          Seq[Any](i.toLong, d, stats.map(_._1).orNull, stats.map(_._2).orNull,
            m.dirStrStats.get(d).map(_.size.toLong).getOrElse(0L),
            m.dirBlooms.get(d).exists(_.nonEmpty))
        }
    }
    Array(GraftVersionedMetadataPartition(rows))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[GraftVersionedMetadataPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = new GenericInternalRow(
            rows(i).map {
              case s: String => UTF8String.fromString(s)
              case other => other
            }.toArray)
          override def close(): Unit = ()
        }
      }
    }
}

/** Version offset for the streaming read: "everything committed up to
  * and including manifest `v` has been delivered". */
case class GraftVersionedOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"version":$v}"""
}

/** STREAMING SOURCE over the commit log (the Delta streaming-source
  * shape): each micro-batch delivers the data dirs that ENTERED the
  * manifest between two versions — offsets are version numbers, so
  * exactly-once across restarts is the checkpoint replaying the same
  * (start, end] version window. Contract: incremental consumption is
  * defined for APPEND chains (a batch = the appended dirs). A
  * NON-APPEND version in the window (overwrite / delete / compaction —
  * a REWRITE) is a hard error by default, exactly Delta's behavior:
  * the rewritten snapshot's fresh dirs re-enter the log as new data,
  * so delivering them silently would duplicate every surviving row
  * downstream. `.option("ignoreChanges", true)` opts in explicitly —
  * the fresh dirs are delivered and the duplicate-delivery semantics
  * become the CALLER'S declared choice (Delta's option of the same
  * name). No data is ever re-read otherwise: dirs are immutable and
  * identified by attempt-unique names, so set difference over
  * manifest dir lists is exact. `startingVersion` (default 0 = from
  * the beginning) sets the initial offset for a fresh checkpoint. */
class GraftVersionedMicroBatchStream(path: String, required: StructType,
    startingVersion: Long, confCarrier: SerializableHadoopConf,
    ignoreChanges: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def spark = SparkSession.active

  override def initialOffset(): Offset = GraftVersionedOffset(startingVersion)
  override def latestOffset(): Offset =
    GraftVersionedOffset(VersionedTable.currentVersion(spark, path))
  override def deserializeOffset(json: String): Offset = {
    val m = """\{"version":(\d+)\}""".r
    json.trim match {
      case m(v) => GraftVersionedOffset(v.toLong)
      case other => sys.error(s"graft-versioned: bad offset json: $other")
    }
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val v0 = start.asInstanceOf[GraftVersionedOffset].v
    val v1 = end.asInstanceOf[GraftVersionedOffset].v
    if (v1 <= v0) return Array.empty
    val prevDirs: Set[String] =
      if (v0 == 0L) Set.empty
      else VersionedTable.readManifest(spark, path, v0).dirs.toSet
    // union of dirs across (v0, v1] minus what v0 already had: covers
    // chains where an intermediate version's dirs were later rewritten
    // (its fresh dirs still entered the log and must be delivered once)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    ((v0 + 1) to v1).foreach { v =>
      val mv = VersionedTable.readManifest(spark, path, v)
      // REWRITE GUARD: an overwrite version's dirs are a re-publish of
      // rows already delivered by earlier batches — refusing is the
      // default (Delta's contract); ignoreChanges delivers them as the
      // caller's explicit duplicate-accepting choice. Version 1 is
      // exempt: the CREATION commit (mode "overwrite" by default) has
      // no prior rows to duplicate.
      if (mv.mode != "append" && v > 1L && !ignoreChanges)
        sys.error(s"graft-versioned streaming: version $v of $path is a " +
          s"'${mv.mode}' (rewrite) — a streaming read past a rewrite would " +
          "re-deliver surviving rows as fresh data. Set " +
          ".option(\"ignoreChanges\", true) to accept duplicate delivery, " +
          "or restart the stream from a fresh startingVersion past the rewrite")
      mv.dirs.filterNot(prevDirs).foreach(seen += _)
    }
    val fs = new HPath(path).getFileSystem(confCarrier.value)
    GraftVersionedFilePartition.pack(seen.toSeq.flatMap { d =>
      val p = new HPath(new HPath(path), d)
      if (!fs.exists(p)) Seq.empty // vacuumed mid-window: rows were rewritten forward
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
    }, splitFiles = false) // the row reader takes whole files
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftVersionedReaderFactory(required, confCarrier)
}

class GraftVersionedScanBuilder(path: String, m: VersionedTable.Manifest,
    tableSchema: StructType, startingVersion: Option[Long] = None,
    ignoreChanges: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = tableSchema
  private var pushedArr: Array[Filter] = Array.empty
  // accumulated dir-level constraints, ANDed at build():
  private var idBands: Seq[(Long, Long)] = Nil      // any-overlap per band set? see below
  private var strEqs: Seq[(String, Seq[String])] = Nil
  private var bloomProbes: Seq[(String, Seq[String])] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Capture prunable predicates as dir-pruning hints. Conjunction
    * semantics: each captured filter must independently allow a dir
    * to survive (they are ANDed, matching WHERE semantics). For `IN`,
    * a dir survives if ANY value might be present. ALL filters are
    * returned residual — Spark re-applies them row-level. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val captured = scala.collection.mutable.ArrayBuffer.empty[Filter]
    def num(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    val strStatted = (c: String) => m.dirStrStats.values.exists(_.contains(c))
    val bloomed = (c: String) => m.dirBlooms.values.exists(_.contains(c))
    // STRING-KEYED index probes (str stats, blooms) may only take
    // literals whose JVM rendering provably equals Spark's
    // `cast(col AS string)` — the form the COMMIT side statted/hashed.
    // An Array[Byte] EqualTo literal (BinaryType is a supported column
    // type) stringifies as "[B@…": the bloom would answer "definitely
    // absent" and prune dirs that HOLD matching rows, and dir pruning
    // runs before the residual row filter can save correctness. Any
    // literal outside the proven set simply doesn't feed the string
    // indexes — the dirs fall back to the conservative keep.
    def strCastStable(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case s: UTF8String => Some(s.toString)
      case l: Long => Some(l.toString)
      case i: Int => Some(i.toString)
      case s: Short => Some(s.toString)
      case b: Byte => Some(b.toString)
      case b: Boolean => Some(b.toString)
      case _ => None // Array[Byte], floats (sci-notation drift), dates, …
    }
    // a filter can feed SEVERAL indexes at once: an IN on the id column
    // checks the id band AND probes the id bloom if one was committed
    // (interleaved ingest defeats min/max but not the bloom — q218's
    // whole point); capture every applicable hint per filter
    def onEquality(f: Filter, c: String, vs: Seq[Any]): Unit = {
      var used = false
      if (c == m.idCol && vs.forall(num(_).nonEmpty)) {
        val ls = vs.flatMap(num)
        idBands :+= ((ls.min, ls.max)); used = true
      }
      val stable = vs.map(strCastStable)
      if (stable.forall(_.nonEmpty)) {
        val ss = stable.flatten
        if (strStatted(c)) { strEqs :+= ((c, ss)); used = true }
        if (bloomed(c)) { bloomProbes :+= ((c, ss)); used = true }
      }
      if (used) captured += f
    }
    filters.foreach {
      case f @ EqualTo(c, v) if v != null => onEquality(f, c, Seq(v))
      case f @ In(c, vs) if vs.nonEmpty && vs.forall(_ != null) =>
        onEquality(f, c, vs.toSeq)
      case f @ GreaterThanOrEqual(c, v) if c == m.idCol && num(v).nonEmpty =>
        idBands :+= ((num(v).get, Long.MaxValue)); captured += f
      case f @ GreaterThan(c, v) if c == m.idCol && num(v).nonEmpty =>
        idBands :+= ((num(v).get, Long.MaxValue)); captured += f
      case f @ LessThanOrEqual(c, v) if c == m.idCol && num(v).nonEmpty =>
        idBands :+= ((Long.MinValue, num(v).get)); captured += f
      case f @ LessThan(c, v) if c == m.idCol && num(v).nonEmpty =>
        idBands :+= ((Long.MinValue, num(v).get)); captured += f
      case _ => ()
    }
    pushedArr = captured.toArray
    filters // ALL residual — pruning is a hint, never the correctness carrier
  }
  override def pushedFilters(): Array[Filter] = pushedArr

  override def build(): Scan = {
    val kept = m.dirs.filter { d =>
      val idOk = idBands.forall { case (lo, hi) =>
        m.dirStats.get(d) match {
          case Some((dLo, dHi)) => dHi >= lo && dLo <= hi
          case None => true // unstatted ⇒ conservative keep
        }
      }
      val strOk = strEqs.forall { case (c, vs) =>
        m.dirStrStats.get(d).flatMap(_.get(c)) match {
          // compare in UTF8String (UTF-8 byte) order — the order the
          // commit's Spark min/max aggregates used. Java String UTF-16
          // order disagrees on supplementary-plane code points (U+FFFF
          // sorts above U+10000 in UTF-16, below in UTF-8), so a
          // UTF-16 band check could wrongly prune a dir holding the
          // probe value (ADVICE r13).
          case Some((lo, hi)) => vs.exists { v =>
            val u = UTF8String.fromString(v)
            UTF8String.fromString(lo).compareTo(u) <= 0 &&
              u.compareTo(UTF8String.fromString(hi)) <= 0
          }
          case None => true
        }
      }
      val bloomOk = bloomProbes.forall { case (c, vs) =>
        m.dirBlooms.get(d).flatMap(_.get(c)) match {
          case Some((mBits, b64)) =>
            val bits = java.util.BitSet.valueOf(
              java.util.Base64.getDecoder.decode(b64))
            vs.exists(v =>
              VersionedTable.bloomPositions(v, mBits).forall(bits.get))
          case None => true
        }
      }
      idOk && strOk && bloomOk
    }
    new GraftVersionedScan(path, m.dirs.size, kept, required, startingVersion,
      ignoreChanges)
  }
}

/** A byte range of one parquet file; `start == 0 && length == fileLen`
  * means the whole file (the only shape the row reader accepts — the
  * columnar reader hands ranges to the parquet split machinery, which
  * assigns each row group to the range containing its start offset). */
case class GraftFileChunk(path: String, start: Long, length: Long, fileLen: Long)

/** One input partition = a size-binned PACK of parquet file CHUNKS,
  * following Spark's own `FilePartition.maxSplitBytes` policy: the
  * split target is min(maxPartitionBytes, max(openCost, (totalBytes +
  * files·openCost) / parallelism)) — so a scan SMALLER than
  * cores×128 MiB still fans out across the cluster (the round-14 fix:
  * the old fixed-128 MiB first-fit packed a 0.9 GB table into 8 tasks
  * on 32 cores and read 1.5× slower than the native scan for pure
  * parallelism reasons), while a year of tiny appends still bins into
  * few tasks (task count tracks bytes, not commit count) and one giant
  * compacted file is SPLIT at the target size like the native reader
  * splits it. Chunks are packed first-fit-decreasing with Spark's
  * 4 MiB per-chunk open cost. */
case class GraftVersionedFilePartition(chunks: Seq[GraftFileChunk]) extends InputPartition

object GraftVersionedFilePartition {
  val DefaultMaxPartitionBytes: Long = 128L << 20
  val OpenCostBytes: Long = 4L << 20

  def pack(files: Seq[org.apache.hadoop.fs.FileStatus],
      maxBytes: Long = DefaultMaxPartitionBytes,
      splitFiles: Boolean = true): Array[InputPartition] = {
    val parallelism =
      try SparkSession.active.sparkContext.defaultParallelism catch { case _: Throwable => 1 }
    val totalCost = files.map(_.getLen).sum + files.size.toLong * OpenCostBytes
    val target = math.min(maxBytes,
      math.max(OpenCostBytes, totalCost / math.max(1, parallelism)))
    val chunks = files.flatMap { f =>
      if (!splitFiles || f.getLen <= target)
        Seq(GraftFileChunk(f.getPath.toString, 0L, f.getLen, f.getLen))
      else (0L until f.getLen by target).map(off =>
        GraftFileChunk(f.getPath.toString, off,
          math.min(target, f.getLen - off), f.getLen))
    }
    val bins = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[GraftFileChunk], Long)]
    chunks.sortBy(c => (-c.length, c.path, c.start)).foreach { c =>
      val cost = c.length + OpenCostBytes
      bins.indexWhere(_._2 + cost <= target + OpenCostBytes) match {
        case -1 =>
          bins += ((scala.collection.mutable.ArrayBuffer(c), cost))
        case i =>
          bins(i)._1 += c
          bins(i) = (bins(i)._1, bins(i)._2 + cost)
      }
    }
    bins.map(b => GraftVersionedFilePartition(b._1.toSeq): InputPartition).toArray
  }
}

class GraftVersionedScan(path: String, totalDirs: Int, keptDirs: Seq[String],
    required: StructType, startingVersion: Option[Long] = None,
    ignoreChanges: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics {
  private val confCarrier = new SerializableHadoopConf(
    graft.operators.InvertedIndex.activeHadoopConf())

  private lazy val files: Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = new HPath(path).getFileSystem(confCarrier.value)
    keptDirs.flatMap { d =>
      fs.listStatus(new HPath(new HPath(path), d)).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-versioned $path, kept_dirs=${keptDirs.size}/$totalDirs"
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = files.map(_.getLen).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
  override def planInputPartitions(): Array[InputPartition] =
    GraftVersionedFilePartition.pack(files)
  // batch scans read COLUMNAR (round-14 verdict task 5); the streaming
  // path below keeps the row reader (micro-batches are small appends
  // by construction)
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftVersionedReaderFactory(required, confCarrier, columnar = true)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftVersionedMicroBatchStream(path, required,
      startingVersion.getOrElse(0L), confCarrier, ignoreChanges)
}

/** Per-file readers, two paths:
  *
  *  - **COLUMNAR (batch scans — round-14 verdict task 5)**: Spark's own
  *    `VectorizedParquetRecordReader` driven directly (the engine's
  *    vectorized decoder — page-level decoding into ColumnVectors, the
  *    path `spark.read.parquet` itself takes), with the projection in
  *    `ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA` and fields a file
  *    predates (merge-read chains) emitted as constant-NULL vectors by
  *    the reader's own missing-column handling. A full analytical scan
  *    through the connector now decodes at native-parquet speed instead
  *    of the row-at-a-time Group path (spec-gated within 1.2× of
  *    `VersionedTable.readAsOf`). Rebase modes are pinned CORRECTED —
  *    the connector's supported types exclude date/timestamp, so no
  *    legacy-calendar file can reach them.
  *  - **ROW (streaming micro-batches)**: parquet-mr `GroupReadSupport`
  *    with the projection pushed into the parquet read schema —
  *    micro-batches deliver small fresh appends, where per-row
  *    materialization is not the bottleneck. */
class GraftVersionedReaderFactory(required: StructType,
    confCarrier: SerializableHadoopConf, columnar: Boolean = false)
    extends PartitionReaderFactory {
  import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
  import org.apache.spark.sql.vectorized.ColumnarBatch

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val chunks = partition.asInstanceOf[GraftVersionedFilePartition].chunks
    new PartitionReader[ColumnarBatch] {
      private var idx = -1
      private var cur: VectorizedParquetRecordReader = _
      // one conf per PARTITION, not per chunk (Configuration copies are
      // milliseconds each — visible on narrow scans): its content is
      // chunk-independent and the readers only consult it
      private lazy val conf: Configuration = {
        val c = new Configuration(confCarrier.value)
        // the conf contract ParquetFileFormat's reader function sets up
        c.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
          classOf[ParquetReadSupport].getName)
        c.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, required.json)
        c.setBoolean("spark.sql.parquet.binaryAsString", false)
        c.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
        c.setBoolean("spark.sql.caseSensitive", false)
        c.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
        c.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
        c
      }
      private def open(chunk: GraftFileChunk): VectorizedParquetRecordReader = {
        val r = new VectorizedParquetRecordReader(
          java.time.ZoneId.of("UTC"), "CORRECTED", "UTC", "CORRECTED", "UTC",
          /* useOffHeap = */ false, /* capacity = */ 4096)
        // mapred.FileSplit (extends the mapreduce one): the reader base
        // downcasts to the old API internally. The (start, length) range
        // selects the row groups whose start offset falls inside it —
        // exactly how the native scan consumes its splits.
        val split = new org.apache.hadoop.mapred.FileSplit(
          new HPath(chunk.path), chunk.start, chunk.length, Array.empty[String])
        val tac = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
          conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
        try {
          r.initialize(split, tac)
          r.initBatch(new StructType(), InternalRow.empty)
          r.enableReturningBatches()
          r
        } catch { case e: Throwable => r.close(); throw e }
      }
      override def next(): Boolean = {
        while (cur == null || !cur.nextBatch()) {
          if (cur != null) cur.close()
          idx += 1
          if (idx >= chunks.length) { cur = null; return false }
          cur = open(chunks(idx))
        }
        true
      }
      override def get(): ColumnarBatch = cur.resultBatch()
      override def close(): Unit = if (cur != null) { cur.close(); cur = null }
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val chunks = partition.asInstanceOf[GraftVersionedFilePartition].chunks
    // chain the pack's files sequentially behind one PartitionReader
    new PartitionReader[InternalRow] {
      private var idx = -1
      private var cur: PartitionReader[InternalRow] = _
      override def next(): Boolean = {
        while (cur == null || !cur.next()) {
          if (cur != null) cur.close()
          idx += 1
          if (idx >= chunks.length) { cur = null; return false }
          val c = chunks(idx)
          require(c.start == 0L && c.length == c.fileLen,
            s"row reader takes whole files, got range $c") // streaming packs whole
          cur = fileReader(c.path)
        }
        true
      }
      override def get(): InternalRow = cur.get()
      override def close(): Unit = if (cur != null) cur.close()
    }
  }

  private def fileReader(file: String): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private val conf = new Configuration(confCarrier.value)
      private val fileFields: Set[String] = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new HPath(file), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .map(_.getName).toSet
        finally r.close()
      }
      private val reader: ParquetReader[org.apache.parquet.example.data.Group] = {
        // push the projection into parquet: only requested fields the
        // file actually has; an empty intersection (pure-evolved
        // projection) still needs row COUNT, so fall back to full
        // schema in that rare shape
        val want = required.fieldNames.filter(fileFields)
        if (want.nonEmpty) {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new HPath(file), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val full = try r.getFooter.getFileMetaData.getSchema finally r.close()
          val fields: java.util.List[org.apache.parquet.schema.Type] =
            want.map(n => full.getType(Seq(n): _*)).toBuffer.asJava
          val proj = new org.apache.parquet.schema.MessageType(full.getName, fields)
          conf.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
        }
        ParquetReader.builder(new GroupReadSupport(), new HPath(file))
          .withConf(conf).build()
      }
      private var current: org.apache.parquet.example.data.Group = _
      override def next(): Boolean = { current = reader.read(); current != null }
      override def get(): InternalRow = {
        val vals = new Array[Any](required.length)
        var i = 0
        while (i < required.length) {
          val f = required.fields(i)
          vals(i) =
            if (!fileFields(f.name) ||
                current.getType.getFields.asScala.forall(_.getName != f.name) ||
                current.getFieldRepetitionCount(f.name) == 0) null
            else f.dataType match {
              case LongType => current.getLong(f.name, 0)
              case IntegerType => current.getInteger(f.name, 0)
              case DoubleType => current.getDouble(f.name, 0)
              case FloatType => current.getFloat(f.name, 0)
              case BooleanType => current.getBoolean(f.name, 0)
              case StringType => UTF8String.fromString(current.getString(f.name, 0))
              case BinaryType => current.getBinary(f.name, 0).getBytes
              case other => sys.error(
                s"graft-versioned: unsupported type ${other.simpleString}")
            }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = reader.close()
    }
  }
}

/** One successful task's staged file (name + row count) — the only
  * state that crosses from executors to the streaming commit. */
case class GraftStreamFileMessage(fileName: String, rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** NATIVE STREAMING SINK (`ds.writeStream.format("graft-versioned")` —
  * the write-side completion of the r13 commit-log streaming SOURCE;
  * the foreachBatch + [[VersionedTable.commitStreamBatch]] recipe made
  * a first-class sink):
  *
  *  - executors write each task's rows DIRECTLY to parquet in an
  *    epoch-staging dir under the table root
  *    (`data/stream-<query>-e<epoch>`; attempt-unique file names, so
  *    task retries never clobber),
  *  - the driver's `commit(epoch, messages)` keeps exactly the files
  *    the COMMITTED tasks reported (a failed attempt's orphan file is
  *    deleted before anything is digested), then publishes the staged
  *    dir through [[VersionedTable.publishStagedDir]] — the same
  *    digest / stats / bloom / optimistic-rename protocol every other
  *    write takes, stamped with the epoch as the manifest `batch_id`,
  *  - EXACTLY-ONCE across restarts: a replayed epoch (failure after
  *    publish, before the checkpoint advanced — the at-least-once
  *    window every sink sees) is detected against the manifest batch
  *    watermark ([[VersionedTable.lastStampedBatchId]]) and skipped,
  *    its staged dir reclaimed. An EMPTY micro-batch publishes no
  *    version (re-running it is harmlessly empty again).
  *
  * `outputMode("append")` maps each epoch to an append commit;
  * `outputMode("complete")` (arriving via truncate()) to an overwrite
  * commit — the aggregate-snapshot shape. Options mirror the batch
  * write surface: `idCol` (required on first write), `contentCols`,
  * `statCols`, `bloomCols`. An aborted epoch's staging is deleted
  * best-effort; anything missed is an unreferenced dir for
  * [[VersionedTable.vacuum]] — the same orphan story as a batch
  * commit's loser. Single-writer per table, like commitStreamBatch. */
class GraftVersionedStreamingWrite(path: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
    declared: Option[(StructType, String)], truncateMode: Boolean)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val schema = info.schema()
  private val qid = info.queryId().replace("-", "").take(8)
  schema.fields.foreach { f =>
    require(GraftVersionedSource.supported(f.dataType),
      s"graft-versioned streaming sink: unsupported column type " +
        s"${f.dataType.simpleString} for '${f.name}'")
  }

  private def stagingRel(epochId: Long): String = f"data/stream-$qid-e$epochId%08d"

  override def createStreamingWriterFactory(
      pi: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftVersionedStreamingWriterFactory(path, qid, schema,
      new SerializableHadoopConf(graft.operators.InvertedIndex.activeHadoopConf()))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedRel = stagingRel(epochId)
    val stagedPath = new HPath(new HPath(path), stagedRel)
    def dropStaged(): Unit = if (fs.exists(stagedPath)) fs.delete(stagedPath, true): Unit
    // idempotent replay: this epoch already published (crash between
    // publish and checkpoint advance) — reclaim the fresh staging, done
    if (epochId <= VersionedTable.lastStampedBatchId(spark, path)) {
      dropStaged(); return
    }
    // keep exactly the committed tasks' files: a failed attempt's
    // orphan must never enter the digest
    val committed = messages.collect {
      case m: GraftStreamFileMessage => m.fileName
    }.toSet
    if (fs.exists(stagedPath))
      fs.listStatus(stagedPath).foreach { s =>
        if (s.isFile && !committed(s.getPath.getName))
          fs.delete(s.getPath, false): Unit
      }
    if (committed.isEmpty || !fs.exists(stagedPath)) {
      dropStaged(); return // empty micro-batch: no version published
    }
    val opts = info.options()
    val cur = VersionedTable.currentVersion(spark, path)
    val standing: Option[VersionedTable.Manifest] =
      if (cur > 0) Some(VersionedTable.readManifest(spark, path, cur)) else None
    val idCol = Option(opts.get("idCol"))
      .orElse(standing.map(_.idCol))
      .orElse(declared.map(_._2))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-versioned streaming sink: first write to $path must declare " +
          ".option(\"idCol\", …)"))
    def csv(k: String): Seq[String] = Option(opts.get(k))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val contentCols = Option(opts.get("contentCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(standing.map(_.contentCols))
      .getOrElse(schema.fieldNames.filterNot(_ == idCol).toSeq)
    VersionedTable.publishStagedDir(spark, path, stagedRel, idCol, contentCols,
      expectedVersion = cur,
      mode = if (truncateMode) "overwrite" else "append",
      batchId = Some(epochId),
      statCols = csv("statCols"),
      bloomCols = csv("bloomCols")): Unit
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedPath = new HPath(new HPath(path), stagingRel(epochId))
    // best-effort: anything missed is an unreferenced dir for vacuum
    try { if (fs.exists(stagedPath)) fs.delete(stagedPath, true): Unit }
    catch { case _: java.io.IOException => () }
  }
}

class GraftVersionedStreamingWriterFactory(path: String, qid: String,
    schema: StructType, confCarrier: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  import org.apache.spark.sql.connector.write.DataWriter
  import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

  /** Builder shim: parquet-mr's Builder is the non-deprecated way to
    * construct a writer over a custom WriteSupport (Spark's own
    * InternalRow one). */
  private class IRBuilder(file: HPath, support: ParquetWriteSupport)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[InternalRow, IRBuilder](file) {
    override def self(): IRBuilder = this
    override def getWriteSupport(conf: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] = support
  }

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    // attempt-unique name (taskId is unique per attempt): retries never
    // clobber, and only the committed attempt's name reaches the driver
    val fileName = f"part-$partitionId%05d-$taskId.parquet"
    val file = new HPath(new HPath(new HPath(path),
      f"data/stream-$qid-e$epochId%08d"), fileName)
    val conf = new Configuration(confCarrier.value)
    // the conf contract ParquetWriteSupport.init asserts on
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.session.timeZone", "UTC")
    new DataWriter[InternalRow] {
      private var rows = 0L
      private val writer = new IRBuilder(file, new ParquetWriteSupport)
        .withConf(conf)
        .withCompressionCodec(
          org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
        .build()
      override def write(row: InternalRow): Unit = { writer.write(row); rows += 1 }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        writer.close()
        GraftStreamFileMessage(fileName, rows)
      }
      override def abort(): Unit = {
        try writer.close() catch { case _: Throwable => () }
        val fs = file.getFileSystem(conf)
        try { if (fs.exists(file)) fs.delete(file, false): Unit }
        catch { case _: java.io.IOException => () }
      }
      override def close(): Unit = ()
    }
  }
}
