package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, File, FileInputStream}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference engine's input format
  * (`/root/reference/src/main.cc:178-197`): a manifest file whose first
  * line is N followed by N corpus-file paths (relative to the
  * manifest's directory), line position = 1-based file id.
  *
  * `spark.read.format("manifest-corpus").load(manifest)` yields
  * `(file_id INT, path STRING, value STRING)` — one row per corpus
  * line — with:
  *  - **partition packing**: corpus files are binned into input
  *    partitions by cumulative size (`maxPartitionBytes` option,
  *    default 4 MiB) so thousands of small chapter files don't become
  *    thousands of tasks — the same small-files discipline a 100 TB
  *    ingest needs;
  *  - **column pruning** (SupportsPushDownRequiredColumns): a query
  *    projecting only `value` never materializes the other columns.
  *
  * This replaces the driver-side manifest read + scan-path decode +
  * broadcast join of the original formulation: file ids are stamped by
  * the reader itself, so no path string ever needs round-tripping
  * through scan metadata.
  */
class ManifestCorpusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "manifest-corpus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestCorpusSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("manifest-corpus: .load(<manifestPath>) is required"))
    val maxBytes = Option(properties.get("maxPartitionBytes")).map(_.toLong)
      .getOrElse(4L << 20)
    new ManifestCorpusTable(path, maxBytes)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object ManifestCorpusSource {
  val Schema: StructType = StructType(Seq(
    StructField("file_id", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class ManifestCorpusTable(manifestPath: String, maxBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"manifest_corpus(`$manifestPath`)"
  override def schema(): StructType = ManifestCorpusSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestCorpusScanBuilder(manifestPath, maxBytes)
}

class ManifestCorpusScanBuilder(manifestPath: String, maxBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ManifestCorpusSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ManifestCorpusScan(manifestPath, maxBytes, required)
}

case class CorpusFilesPartition(files: Seq[(String, Int)]) extends InputPartition

class ManifestCorpusScan(manifestPath: String, maxBytes: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"manifest-corpus $manifestPath, cols=${required.fieldNames.mkString(",")}"

  /** Size-binned file groups: greedy packing in manifest order keeps
    * partition count ≈ totalBytes / maxBytes instead of one task per
    * (typically tiny) corpus file. */
  override def planInputPartitions(): Array[InputPartition] = {
    val files = graft.operators.InvertedIndex.readManifest(manifestPath)
    val partitions = scala.collection.mutable.ArrayBuffer.empty[CorpusFilesPartition]
    var current = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var bytes = 0L
    files.foreach { case (path, id) =>
      val sz = math.max(1L, new File(path).length())
      if (bytes > 0 && bytes + sz > maxBytes) {
        partitions += CorpusFilesPartition(current.toSeq)
        current = scala.collection.mutable.ArrayBuffer.empty
        bytes = 0L
      }
      current += ((path, id))
      bytes += sz
    }
    if (current.nonEmpty) partitions += CorpusFilesPartition(current.toSeq)
    partitions.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestCorpusReaderFactory(required)
}

class ManifestCorpusReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[CorpusFilesPartition].files
    new PartitionReader[InternalRow] {
      // which of (file_id, path, value) the projection kept, in order
      private val fields: Array[Int] =
        required.fieldNames.map(ManifestCorpusSource.Schema.fieldIndex)
      private val fileIter = files.iterator
      private var in: BufferedInputStream = _
      private var curPath: UTF8String = _
      private var curId: Int = _
      private var line: Array[Byte] = _

      /** Raw byte line (terminator \n, \r\n or lone \r, like Hadoop's
        * LineRecordReader), or null at EOF. Bytes pass through to the
        * UTF8String untouched — a String round-trip would replace
        * invalid UTF-8 with U+FFFD, breaking byte parity with
        * spark.read.textFile (and charset-independence: the JVM default
        * here is US-ASCII under a POSIX locale). */
      private def readLineBytes(): Array[Byte] = {
        var b = in.read()
        if (b == -1) return null
        val buf = new ByteArrayOutputStream(128)
        while (b != -1 && b != '\n' && b != '\r') { buf.write(b); b = in.read() }
        if (b == '\r') { in.mark(1); if (in.read() != '\n') in.reset() }
        buf.toByteArray
      }

      override def next(): Boolean = {
        while (true) {
          if (in != null) {
            line = readLineBytes()
            if (line != null) return true
            in.close(); in = null
          }
          if (!fileIter.hasNext) return false
          val (p, id) = fileIter.next()
          in = new BufferedInputStream(new FileInputStream(p))
          curPath = UTF8String.fromString(p)
          curId = id
        }
        false
      }

      // reused across get() calls — Spark copies rows it retains, so a
      // fresh allocation per corpus line would be pure garbage
      private val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields.length)

      override def get(): InternalRow = {
        var i = 0
        while (i < fields.length) {
          fields(i) match {
            case 0 => row.update(i, curId)
            case 1 => row.update(i, curPath)
            case 2 => row.update(i, UTF8String.fromBytes(line))
          }
          i += 1
        }
        row
      }

      override def close(): Unit = if (in != null) { in.close(); in = null }
    }
  }
}
