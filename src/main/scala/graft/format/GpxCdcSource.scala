package graft.format

import GpxFileReader.PixelSlice
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Structured Streaming SOURCE over a gpx-backed SnapshotStore: tails the
  * store's manifest log and emits each new delta directory as a micro-batch
  * — the subscribe side of the reference's Retina CDC path
  * (proto/retina.proto:34-50: update stream -> queryable visibility).
  *
  *   spark.readStream.format("gpx-cdc").load(storePath)
  *
  * Offsets ARE store versions: batch (start, end] reads exactly the delta
  * dirs d_{start+1}..d_end, so restart/recovery replays precisely the
  * unseen commits (exactly-once with an idempotent sink). Compaction
  * versions (b_*) re-fold already-emitted rows and are correctly skipped —
  * the tail emits each row version once. Splits are the same self-contained
  * (file, row group, pixel slices) units as the batch scan: executors never
  * read a footer.
  */
class GpxCdcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gpx-cdc"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("gpx-cdc needs a store path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // by-name union over the store's gpx files (deltas evolve like any
    // gpx table); delegate to the batch source's tolerant inference
    val opts = new CaseInsensitiveStringMap(
      Map("path" -> path(options)).asJava)
    new GpxDataSource().inferSchema(opts)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val maxV = Option(opts.get("maxVersionsPerTrigger")).map { v =>
      val m = v.toLong
      require(m > 0, s"maxVersionsPerTrigger must be positive, got $m")
      m
    }
    new GpxCdcTable(schema, path(opts), maxV)
  }
}

class GpxCdcTable(schema: StructType, root: String,
    maxVersions: Option[Long] = None)
  extends Table with SupportsRead {

  override def name(): String = s"gpx-cdc:$root"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema
      override def description(): String = s"GpxCdcScan[$root]"
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GpxCdcStream(root, schema, maxVersions)
    }
}

/** store version as a streaming offset */
case class GpxCdcOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

class GpxCdcStream(root: String, schema: StructType,
    maxVersions: Option[Long] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow: drain exactly the versions that existed at
    * query start (admission-bounded), then terminate. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentVersion)

  private def currentVersion: Long = {
    val f = Paths.get(root).resolve("_CURRENT")
    if (!Files.exists(f)) -1L
    else Try(new String(Files.readAllBytes(f)).trim.toLong).getOrElse {
      // _CURRENT is ATOMIC_MOVE-swapped, so a present pointer is never
      // partial: a failed read is a transient store error. Returning -1
      // would REGRESS the offset below the checkpoint and replay the
      // whole history when the store recovers — fail the trigger instead.
      throw new java.io.IOException(
        s"gpx-cdc: cannot read $f — failing this trigger rather than " +
          "regressing the offset")
    }
  }

  override def initialOffset(): Offset = GpxCdcOffset(-1L)
  override def latestOffset(): Offset = GpxCdcOffset(currentVersion)

  /** Admission control (`option("maxVersionsPerTrigger", n)`): a tail
    * subscribing to (or restarting behind) a long-lived store drains the
    * version backlog as bounded n-version micro-batches instead of one
    * giant catch-up batch. Store versions are contiguous, so the cap is
    * a plain min. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = availableNowTarget.getOrElse(currentVersion)
    maxVersions match {
      case None => GpxCdcOffset(cur)
      case Some(m) =>
        val s = Option(start).map(_.asInstanceOf[GpxCdcOffset].v).getOrElse(-1L)
        GpxCdcOffset(math.min(cur, s + m))
    }
  }
  override def deserializeOffset(json: String): Offset =
    GpxCdcOffset(json.toLong)

  /** member dir names of a committed version's manifest. A MISSING
    * manifest in the requested range fails LOUDLY (same stance as
    * currentVersion's never-regress throw): silently treating it as
    * empty would either re-emit the store's entire retained history as
    * "added" (m_{v-1} aged out: every member of m_v diffs as new —
    * duplicates at an exactly-once sink) or silently skip a version's
    * rows (m_v aged out). v < 0 is the legitimate before-first-version
    * empty set. */
  private def manifestMembers(v: Long): Set[String] = {
    if (v < 0) return Set.empty
    val mf = Paths.get(root).resolve(f"m_$v%06d.txt")
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"gpx-cdc: manifest $mf is missing but version $v is inside the " +
          "requested batch range — it was vacuumed/aged out past this " +
          "stream's checkpoint. Restart the stream from a fresh " +
          "checkpoint (full resync); continuing would emit duplicate or " +
          "missing change rows.")
    new String(Files.readAllBytes(mf)).split("\n")
      .iterator.map(_.trim).filter(_.nonEmpty).toSet
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GpxCdcOffset].v
    val to = end.asInstanceOf[GpxCdcOffset].v
    val conf = new Configuration()
    ((from + 1) to to).flatMap { v =>
      // version v's NEW deltas = manifest(v) minus manifest(v-1): delta
      // names carry attempt-unique suffixes and a lost version claim
      // leaves an orphaned same-version dir on disk, so resolving by NAME
      // would either miss the committed dir or emit the orphan's rows
      // (duplicates — the loser re-commits them under the next version).
      // A compaction version adds only a b_ member: no new rows.
      val added = (manifestMembers(v) -- manifestMembers(v - 1))
        .filter(_.startsWith("d_")).toSeq.sorted
      added.flatMap(name =>
        GpxTable.listFiles(
          Seq(Paths.get(root).resolve(name).toString), conf)).flatMap { file =>
        val footer = GpxFileReader.FooterCache.get(file, conf)
        val phys = footer.schema
        val physIdx: Array[Int] = schema.fields.map { fd =>
          phys.fieldNames.indexOf(fd.name) match {
            case -1 => -2 // absent from this delta -> nulls
            case i => i
          }
        }
        footer.rowGroups.map { rg =>
          val cols: Array[Array[PixelSlice]] = physIdx.map { ci =>
            if (ci == -2) Array.empty[PixelSlice]
            else {
              val ch = rg.chunks(ci)
              ch.pixels.indices.toArray.map(p => PixelSlice(
                ch.offset + ch.pixels(p).relOffset, ch.pixelLength(p),
                ch.pixels(p).rows))
            }
          }
          GpxInputPartition(file, rg.numRows, rg.commitTs, cols): InputPartition
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GpxReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
