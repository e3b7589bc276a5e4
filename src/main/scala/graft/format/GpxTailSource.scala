package graft.format

import GpxFileReader.PixelSlice
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.jdk.CollectionConverters._

/** Structured Streaming SOURCE tailing a gpx STREAMING-SINK table: emits
  * each committed epoch's files as a micro-batch — the generic subscribe
  * side of the reference's continuous-ingestion path (retina's update
  * stream, proto/retina.proto:34-50), composing gpx pipelines end to end:
  *
  *   stage 1:  events.writeStream.format("gpx").start(dir)
  *   stage 2:  spark.readStream.format("gpx-tail").load(dir)
  *               .transform(...).writeStream...
  *
  * Offsets ARE the sink's epoch numbers (`part-e<epoch>-<p>.gpx` names,
  * published atomically per epoch by GpxStreamingWrite): batch (a, b]
  * reads exactly epochs a+1..b, so checkpoint recovery replays precisely
  * the unseen epochs — exactly-once with an idempotent sink, no seen-file
  * log to compact. Only epoch-published files are tailed (batch-append
  * part files have no replay-safe total order — read those with the
  * batch source); that restriction is what keeps the offset a single
  * monotone long at any table size.
  *
  * Splits are the same self-contained (file, row group, pixel-slice)
  * units as the batch scan: executors never read a footer. Delete
  * bitmaps do NOT rewrite history here — like the CDC source, the tail
  * emits each appended row version once (snapshot reads are the
  * delete-aware surface).
  */
class GpxTailSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gpx-tail"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("gpx-tail needs a table path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new GpxDataSource().inferSchema(new CaseInsensitiveStringMap(
      Map("path" -> path(options)).asJava))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GpxTailTable(schema,
      path(new CaseInsensitiveStringMap(properties)))
}

class GpxTailTable(schema: StructType, root: String)
  extends Table with SupportsRead {

  override def name(): String = s"gpx-tail:$root"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema
      override def description(): String = s"GpxTailScan[$root]"
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GpxTailStream(root, schema)
    }
}

/** highest fully-committed epoch as a streaming offset (-1 = nothing) */
case class GpxTailOffset(epoch: Long) extends Offset {
  override def json(): String = epoch.toString
}

object GpxTailStream {
  private val EpochRe = """^part-e(\d+)-.*\.gpx$""".r

  /** epoch of a sink-published file name, if it is one */
  def epochOf(path: String): Option[Long] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    EpochRe.findFirstMatchIn(name).map(_.group(1).toLong)
  }
}

class GpxTailStream(root: String, schema: StructType) extends MicroBatchStream {

  private def epochFiles(conf: Configuration): Seq[(Long, String)] =
    GpxTable.listFiles(Seq(root), conf)
      .flatMap(f => GpxTailStream.epochOf(f).map(_ -> f))

  override def initialOffset(): Offset = GpxTailOffset(-1L)

  override def latestOffset(): Offset = {
    val conf = new Configuration()
    GpxTailOffset(epochFiles(conf).map(_._1).maxOption.getOrElse(-1L))
  }

  override def deserializeOffset(json: String): Offset =
    GpxTailOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GpxTailOffset].epoch
    val to = end.asInstanceOf[GpxTailOffset].epoch
    val conf = new Configuration()
    epochFiles(conf)
      .filter { case (e, _) => e > from && e <= to }
      .sortBy(_._1)
      .flatMap { case (_, file) =>
        val footer = GpxFileReader.FooterCache.get(file, conf)
        val phys = footer.schema
        // tolerant evolution like the batch scan: absent columns null-fill
        val synth: Array[Byte] = schema.fields.map { fd =>
          if (phys.fieldNames.contains(fd.name)) GpxFileReader.SynthData
          else GpxFileReader.SynthAbsent
        }
        val physIdx: Array[Int] =
          schema.fields.map(fd => phys.fieldNames.indexOf(fd.name))
        footer.rowGroups.map { rg =>
          val cols: Array[Array[PixelSlice]] = physIdx.zipWithIndex.map {
            case (ci, ri) =>
              if (synth(ri) != GpxFileReader.SynthData) null
              else {
                val ch = rg.chunks(ci)
                ch.pixels.indices.toArray.map(p => PixelSlice(
                  ch.offset + ch.pixels(p).relOffset, ch.pixelLength(p),
                  ch.pixels(p).rows))
              }
          }
          GpxInputPartition(file, rg.numRows, rg.commitTs, cols,
            synth = synth): InputPartition
        }
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GpxReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
