package graft.format

import GpxFormat._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
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
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var required: StructType = fileSchema
  private var filters: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None

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

  /** Partial aggregate pushdown (reference S12 — partial aggregation in
    * the scan worker, ScanInput.partialAggregationPresent): ungrouped,
    * unfiltered MIN/MAX/COUNT are answered straight from footer stats —
    * one row per row group, ZERO data pages read. Spark runs the final
    * aggregation over the per-row-group partials. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (filters.nonEmpty || agg.groupByExpressions().nonEmpty) return false
    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          Some(f.fieldNames.head)
        case _ => None
      }
    def statsUsable(name: String): Boolean = {
      val i = fileSchema.fieldIndex(name)
      val dt = fileSchema(i).dataType
      // integer family only: always NaN-free and exact. Strings are
      // truncated; float/double chunks may carry NaN (stats then marked
      // unreliable, which planning time can't see) — not pushed.
      GpxFormat.isLongBacked(dt)
    }
    val ok = agg.aggregateExpressions().forall {
      case _: CountStar => true
      case c: Count if !c.isDistinct => colName(c.column).isDefined
      case m: Min => colName(m.column).exists(statsUsable)
      case m: Max => colName(m.column).exists(statsUsable)
      case _ => false
    }
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new GpxStatsScan(fileSchema, agg, roots)
    case None => new GpxScan(fileSchema, required, filters, roots)
  }
}

/** Stats-only scan for pushed-down aggregates: emits one row of partial
  * aggregates per row group, computed from the footer alone. */
class GpxStatsScan(fileSchema: StructType, agg: Aggregation, roots: Seq[String])
  extends Scan with Batch {

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): StructField =
    fileSchema(fileSchema.fieldIndex(
      e.asInstanceOf[NamedReference].fieldNames.head))

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions().zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"count_star_$i", LongType, nullable = false)
      case (c: Count, i) => StructField(s"count_$i", LongType, nullable = false)
      case (m: Min, i) => StructField(s"min_$i", fieldOf(m.column).dataType)
      case (m: Max, i) => StructField(s"max_$i", fieldOf(m.column).dataType)
      case (other, _) => throw new IllegalStateException(other.toString)
    })

  override def toBatch: Batch = this
  override def description(): String =
    s"GpxStatsScan[${agg.aggregateExpressions().mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    GpxTable.listFiles(roots, conf).flatMap { f =>
      GpxFileReader.readFooter(f, conf).rowGroups.indices
        .map(GpxInputPartition(f, _))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GpxStatsReaderFactory(fileSchema, agg)
}

class GpxStatsReaderFactory(fileSchema: StructType, agg: Aggregation)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GpxInputPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (done) return false
        val conf = new Configuration()
        val footer = GpxFileReader.readFooter(part.path, conf)
        val rg = footer.rowGroups(part.rgIndex)
        def statOf(e: org.apache.spark.sql.connector.expressions.Expression) = {
          val name = e.asInstanceOf[NamedReference].fieldNames.head
          val i = fileSchema.fieldIndex(name)
          (rg.chunks(i).stats, fileSchema(i).dataType)
        }
        def minMax(e: org.apache.spark.sql.connector.expressions.Expression, isMin: Boolean): Any = {
          val (s, dt) = statOf(e)
          if (!s.hasValues) null
          else dt match {
            case DoubleType => if (isMin) s.minDouble else s.maxDouble
            case FloatType => (if (isMin) s.minDouble else s.maxDouble).toFloat
            case BooleanType => (if (isMin) s.minLong else s.maxLong) != 0L
            case ByteType => (if (isMin) s.minLong else s.maxLong).toByte
            case ShortType => (if (isMin) s.minLong else s.maxLong).toShort
            case IntegerType | DateType => (if (isMin) s.minLong else s.maxLong).toInt
            case LongType | TimestampType | TimestampNTZType =>
              if (isMin) s.minLong else s.maxLong
            case dec: DecimalType =>
              org.apache.spark.sql.types.Decimal.createUnsafe(
                if (isMin) s.minLong else s.maxLong, dec.precision, dec.scale)
            case other => throw new IllegalStateException(other.toString)
          }
        }
        val values: Array[Any] = agg.aggregateExpressions().map {
          case _: CountStar => rg.numRows.toLong
          case c: Count => rg.numRows.toLong - statOf(c.column)._1.nullCount
          case m: Min => minMax(m.column, isMin = true)
          case m: Max => minMax(m.column, isMin = false)
          case other => throw new IllegalStateException(other.toString)
        }
        row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
        done = true
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** One split per (file, row group) that survives zone-map pruning. */
final case class GpxInputPartition(
    path: String, rgIndex: Int) extends InputPartition

class GpxScan(
    fileSchema: StructType,
    required: StructType,
    planningFilters: Array[Filter],
    roots: Seq[String]) extends Scan with Batch
  with SupportsReportStatistics with SupportsRuntimeFiltering {

  /** planning-time filters plus any runtime (DPP-style) filters Spark
    * injects after build sides materialize — the v2 analog of dynamic
    * partition pruning; zone maps re-prune with the runtime IN-sets. */
  @volatile private var filters: Array[Filter] = planningFilters

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GpxScan[${required.fieldNames.mkString(",")}] filters=${filters.mkString(";")}"

  override def filterAttributes(): Array[NamedReference] =
    // must reference only the scan's OUTPUT columns (Spark resolves these
    // against readSchema, not the file schema)
    required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(runtime: Array[Filter]): Unit = {
    filters = filters ++ runtime
    GpxScan.runtimeFilterCalls.incrementAndGet()
  }

  private def computeKept(): Array[(String, Int, GpxFormat.RowGroupMeta)] = {
    val conf = new Configuration()
    GpxTable.listFiles(roots, conf).flatMap { f =>
      val footer = GpxFileReader.readFooter(f, conf)
      footer.rowGroups.indices.flatMap { i =>
        val rg = footer.rowGroups(i)
        val keep = filters.forall(GpxFileReader.mayMatch(_, fileSchema, rg))
        if (keep) Some((f, i, rg)) else None
      }
    }.toArray
  }

  // stats snapshot uses planning-time filters; partitions are planned
  // AFTER runtime filters arrive, so they see the narrowed set
  private lazy val keptRowGroups = computeKept()

  override def planInputPartitions(): Array[InputPartition] =
    computeKept().map { case (f, i, _) => GpxInputPartition(f, i) }

  /** Footer-derived stats AFTER zone-map pruning, sized to the pruned
    * column set — feeds CBO/AQE broadcast decisions with real numbers
    * (the reference's PlanOptimizer does the same from its metadata stats,
    * PlanOptimizer.java:94-204). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val requiredIdx = required.fieldNames.map(fileSchema.fieldIndex)
    private val rows = keptRowGroups.map(_._3.numRows.toLong).sum
    private val bytes = keptRowGroups.map { case (_, _, rg) =>
      requiredIdx.map(i => rg.chunks(i).length).sum
    }.sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(bytes, 1L))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GpxReaderFactory(fileSchema, required)
}

object GpxScan {
  /** observability hook for tests: counts runtime-filter injections */
  val runtimeFilterCalls = new java.util.concurrent.atomic.AtomicInteger(0)
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
