package graft.format

import GpxFormat._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.SparkContext
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 for the gpx columnar format:
  * `spark.read.format("gpx").load(dir)` / `df.write.format("gpx").save(dir)`.
  *
  * Read path: one input partition per (file, row group) — the split
  * granularity that lets a 1000-executor cluster balance a 100 TB table
  * (reference: splits from metadata Layout, CostBasedSplitsIndex) — with
  * column pruning (SupportsPushDownRequiredColumns), filter pushdown
  * (SupportsPushDownFilters) and footer-stats zone-map skipping at both
  * planning time (per row group) and nothing left at runtime.
  * Filters are also RE-APPLIED by Spark above the scan (we never claim
  * them as fully handled), so pushdown is purely an I/O reduction —
  * exactly the reference's scan/filter split (Scanner.java:36-93).
  */
class GpxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gpx"

  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val p = Option(options.get("path")).toSeq ++
      Option(options.get("paths")).toSeq.flatMap(_.split(","))
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = new Configuration()
    val files = GpxTable.listFiles(paths(options), conf)
    require(files.nonEmpty, s"no gpx files under ${paths(options)}")
    GpxFileReader.readFooter(files.head, conf).schema
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GpxTable(schema,
      paths(new CaseInsensitiveStringMap(properties)))
}

object GpxTable {
  def listFiles(roots: Seq[String], conf: Configuration): Seq[String] =
    roots.flatMap { r =>
      val p = new Path(r)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else if (fs.getFileStatus(p).isFile) Seq(p.toString)
      else fs.listStatus(p).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".gpx"))
        .map(_.getPath.toString).toSeq
    }
}

class GpxTable(schema: StructType, roots: Seq[String])
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"gpx:${roots.mkString(",")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GpxScanBuilder(schema, roots)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val rgRows = Option(info.options.get("rowGroupRows"))
      .map(_.toInt).getOrElse(GpxFormat.DefaultRowGroupRows)
    new GpxWriteBuilder(info.schema(), roots.head, rgRows)
  }
}

class GpxScanBuilder(fileSchema: StructType, roots: Seq[String])
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = fileSchema
  private var filters: Array[Filter] = Array.empty

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    // keep every filter for zone-map skipping, but report none as fully
    // handled: Spark re-evaluates them above the scan (correctness first;
    // the skip is an I/O optimization).
    filters = fs
    fs
  }
  override def pushedFilters(): Array[Filter] = filters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GpxScan(fileSchema, required, filters, roots)
}

/** One split per (file, row group) that survives zone-map pruning. */
final case class GpxInputPartition(
    path: String, rgIndex: Int) extends InputPartition

class GpxScan(
    fileSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    roots: Seq[String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GpxScan[${required.fieldNames.mkString(",")}] filters=${filters.mkString(";")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    GpxTable.listFiles(roots, conf).flatMap { f =>
      val footer = GpxFileReader.readFooter(f, conf)
      footer.rowGroups.indices.flatMap { i =>
        val rg = footer.rowGroups(i)
        val keep = filters.forall(GpxFileReader.mayMatch(_, fileSchema, rg))
        if (keep) Some(GpxInputPartition(f, i)) else None
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GpxReaderFactory(fileSchema, required)
}

class GpxReaderFactory(fileSchema: StructType, required: StructType)
  extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException("columnar only")

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[GpxInputPartition]
    new PartitionReader[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      private var consumed = false
      override def next(): Boolean = {
        if (consumed) return false
        val conf = new Configuration()
        val footer = GpxFileReader.readFooter(part.path, conf)
        val rg = footer.rowGroups(part.rgIndex)
        val cols = required.fieldNames.map(fileSchema.fieldIndex)
        batch = GpxFileReader.readRowGroup(part.path, conf, fileSchema, rg, cols)
        consumed = true
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }
}

// ---------------- write path ----------------

class GpxWriteBuilder(schema: StructType, path: String, rgRows: Int)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GpxBatchWrite(schema, path, doTruncate, rgRows)
  }
}

class GpxBatchWrite(schema: StructType, path: String, truncate: Boolean, rgRows: Int)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (truncate) {
      val conf = new Configuration()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
      fs.mkdirs(p)
    }
    GpxWriterFactory(schema, path, rgRows)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class GpxCommit(file: String) extends WriterCommitMessage

final case class GpxWriterFactory(schema: StructType, path: String, rgRows: Int)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val file = s"$path/part-$partitionId-$taskId.gpx"
    val w = new GpxFileWriter(file, schema, new Configuration(), rgRows)
    new DataWriter[InternalRow] {
      override def write(record: InternalRow): Unit = w.addRow(record)
      override def commit(): WriterCommitMessage = { w.close(); GpxCommit(file) }
      override def abort(): Unit = w.abort()
      override def close(): Unit = ()
    }
  }
}
