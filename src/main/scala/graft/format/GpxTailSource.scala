package graft.format

import GpxFileReader.PixelSlice
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
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
  * batch source); that restriction is what keeps the offset small and
  * monotone at any table size.
  *
  * Splits are the same self-contained (file, row group, pixel-slice)
  * units as the batch scan: executors never read a footer.
  *
  * **Change feed** (`option("withDeletes", "true")`): the stream becomes
  * a CDC log — two extra columns, `_change_type` ('insert' | 'delete')
  * and `_change_ts` (the row-group commitTs for inserts, the delete's
  * commitTs for deletes) — and merge-on-read delete bitmaps are emitted
  * as DELETE events carrying the full deleted rows (the bitmap names
  * encode their commitTs, and the mutation lock serializes deletes, so
  * sidecar timestamps are a monotone second offset dimension; the offset
  * becomes `epoch:delTs`). Delete events replay exactly like epochs on
  * recovery. Contract: keep the table on `deleteMode=mor` — a COW
  * rewrite or compaction FOLDS bitmaps (and renames epoch files), which
  * compacts replay history at the fold, same caveat as the plain tail.
  * Without the option the tail emits appended row versions only
  * (snapshot reads are the delete-aware surface).
  *
  * **Freshness model** (vs the reference's ~10 ms MemTable serve path,
  * pixels-retina MemTable.java:31-75): an epoch is readable the moment
  * its files publish — the sink flushes AT commit, there is no unflushed
  * buffer to serve — so end-to-end visibility is sink trigger latency +
  * tail poll cadence. With default triggers both are tens of ms
  * (micro-batches run back-to-back; the no-data poll is ~10 ms), giving
  * measured sub-second commit->visibility end to end (StreamingSpec
  * "tail freshness"). The reference's remaining edge is serving rows
  * BEFORE durable commit from daemon memory — a trade (reads from
  * uncommitted state) a storage-token design deliberately doesn't make.
  */
class GpxTailSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gpx-tail"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("gpx-tail needs a table path"))

  private def withDeletes(options: CaseInsensitiveStringMap): Boolean =
    "true".equalsIgnoreCase(options.getOrDefault("withDeletes", "false"))

  private def maxEpochs(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("maxEpochsPerTrigger")).map { v =>
      val m = v.toLong
      require(m > 0, s"maxEpochsPerTrigger must be positive, got $m")
      m
    }

  private def claimLag(options: CaseInsensitiveStringMap): Long =
    Option(options.get("deleteClaimLagMs")).map { v =>
      val m = v.toLong
      require(m >= 0, s"deleteClaimLagMs must be >= 0, got $m")
      m
    }.getOrElse(GpxTailStream.DeleteClaimLagMs)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = new GpxDataSource().inferSchema(new CaseInsensitiveStringMap(
      Map("path" -> path(options)).asJava))
    if (withDeletes(options))
      base.add(GpxTailSource.ChangeTypeCol, StringType, nullable = false)
        .add(GpxTailSource.ChangeTsCol, LongType, nullable = false)
    else base
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GpxTailTable(schema, path(opts), withDeletes(opts), maxEpochs(opts),
      claimLag(opts))
  }
}

object GpxTailSource {
  val ChangeTypeCol = "_change_type"
  val ChangeTsCol = "_change_ts"
}

class GpxTailTable(schema: StructType, root: String, withDeletes: Boolean,
    maxEpochs: Option[Long] = None,
    claimLagMs: Long = GpxTailStream.DeleteClaimLagMs)
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
        new GpxTailStream(root, schema, withDeletes, maxEpochs, claimLagMs)
    }
}

/** (highest fully-committed epoch, highest seen delete commitTs) as a
  * streaming offset; -1 = nothing. Serializes as the plain epoch when
  * the delete dimension is unused, so pre-change-feed checkpoints stay
  * readable. */
case class GpxTailOffset(epoch: Long, delTs: Long = -1L) extends Offset {
  override def json(): String =
    if (delTs < 0) epoch.toString else s"$epoch:$delTs"
}

object GpxTailStream {
  private val EpochRe = """^part-e(\d+)-.*\.gpx$""".r
  private[format] val MarkerRe = """^_e(\d+)\.committed$""".r

  /** Sidecar creation timestamps are claimed only once they are at least
    * this old: stamps are millisecond-resolution and assigned BEFORE the
    * sidecar publishes, so a strict `> offset.delTs` filter would
    * permanently drop a sidecar stamped in the same millisecond as the
    * offset's max but published just after the listing.
    *
    * THE BOUND THIS DEFAULT ASSUMES: stamp-to-visible publish latency
    * PLUS any clock skew between the stamping process and the driver
    * stays under the lag. That holds in-JVM and on a single host (the
    * local-mode deployment); a multi-node deployment on an object store
    * — slow renames, executor clocks disciplined only by NTP — should
    * raise it via `option("deleteClaimLagMs", ...)`: a sidecar that
    * becomes visible AFTER the offset passed its stamp is permanently
    * dropped from the change feed. The price of raising it is delete-
    * event latency, never correctness. */
  private[format] val DeleteClaimLagMs = 100L

  /** epoch of a sink-published file name, if it is one */
  def epochOf(path: String): Option[Long] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    EpochRe.findFirstMatchIn(name).map(_.group(1).toLong)
  }

  def parseOffset(json: String): GpxTailOffset = json.split(':') match {
    case Array(e) => GpxTailOffset(e.toLong)
    case Array(e, t) => GpxTailOffset(e.toLong, t.toLong)
  }
}

class GpxTailStream(root: String, schema: StructType, withDeletes: Boolean,
    maxEpochs: Option[Long] = None,
    claimLagMs: Long = GpxTailStream.DeleteClaimLagMs)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow: the offset frontier is FROZEN here, so the
    * query drains exactly the work that existed at start (in
    * admission-bounded batches) and terminates — late-arriving epochs
    * wait for the next run. */
  @volatile private var availableNowTarget: Option[GpxTailOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestOffset().asInstanceOf[GpxTailOffset])

  private def epochFiles(conf: Configuration): Seq[(Long, String)] =
    GpxTable.listFiles(Seq(root), conf)
      .flatMap(f => GpxTailStream.epochOf(f).map(_ -> f))

  /** Highest epoch whose publish is PROVEN complete. The sink publishes
    * an epoch's part files one rename at a time and writes the
    * `_e<N>.committed` marker last (log-mode tables additionally commit
    * the manifest first), so a bare part-file listing can catch an epoch
    * mid-publish — advancing the offset there would emit a partial epoch
    * and permanently skip its remaining files. Epochs commit strictly in
    * order, so everything at or below the newest marker is complete; so
    * is everything below the newest part file's epoch (its publisher had
    * finished the previous epoch). */
  private def committedFrontier(conf: Configuration,
      files: Seq[(Long, String)]): Long = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    val markerMax =
      try {
        if (!fs.exists(p)) -1L
        else fs.listStatus(p).toSeq.flatMap { st =>
          GpxTailStream.MarkerRe.findFirstMatchIn(st.getPath.getName)
            .map(_.group(1).toLong)
        }.maxOption.getOrElse(-1L)
      } catch { case _: java.io.FileNotFoundException => -1L }
    val partMax = files.map(_._1).maxOption.getOrElse(-1L)
    math.max(markerMax, partMax - 1)
  }

  /** delete sidecars of epoch files, keyed by data file path */
  private def epochSidecars(conf: Configuration,
      files: Seq[(Long, String)]): Seq[(Long, String, GpxDeleteBitmap.Sidecar)] = {
    val byParent = files.groupBy { case (_, f) => new Path(f).getParent }
    byParent.toSeq.flatMap { case (parent, fs) =>
      val names = fs.map { case (e, f) => new Path(f).getName -> (e, f) }.toMap
      GpxDeleteBitmap.sidecarsIn(parent, conf).toSeq.flatMap {
        case (dataName, scs) =>
          names.get(dataName).toSeq.flatMap { case (e, df) =>
            scs.map(sc => (e, df, sc)) }
      }
    }
  }

  override def initialOffset(): Offset = GpxTailOffset(-1L, -1L)

  override def latestOffset(): Offset = {
    val conf = new Configuration()
    val files = epochFiles(conf)
    val e = committedFrontier(conf, files)
    val t =
      if (!withDeletes) -1L
      else {
        // claim only sidecars whose base rows' epoch is claimable too (a
        // DELETE must never stream before its INSERTs); never advance
        // past a NOT-yet-claimable sidecar's stamp (when its epoch
        // commits, its createTs must still be above the offset); and
        // hold back the claim-lag window so a same-millisecond straggler
        // published after this listing is still claimed next batch
        val sidecars = epochSidecars(conf, files)
        val claimable = sidecars.filter { case (fe, _, _) => fe <= e }
          .map(_._3.createTs).maxOption.getOrElse(-1L)
        val heldBack = sidecars.filter { case (fe, _, _) => fe > e }
          .map(_._3.createTs - 1).minOption.getOrElse(Long.MaxValue)
        math.min(math.min(claimable, heldBack),
          System.currentTimeMillis() - claimLagMs)
      }
    GpxTailOffset(e, t)
  }

  /** Admission control (`option("maxEpochsPerTrigger", n)`): bound each
    * micro-batch to n sink epochs so a restarted or freshly-subscribed
    * stream DRAINS a large table as n-epoch batches instead of planning
    * one giant catch-up batch — the knob every production tail needs at
    * scale (the analog of file-source maxFilesPerTrigger). The epoch cap
    * is computed from the epochs that actually exist (sparse epoch ids
    * can't stall progress). While the epoch backlog drains, the
    * delete-ts dimension holds at the start offset — a DELETE event must
    * never stream before its base rows' epoch has been emitted. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // AvailableNow clamps to the frozen frontier; otherwise live latest
    val full = availableNowTarget.getOrElse(
      latestOffset().asInstanceOf[GpxTailOffset])
    val s = Option(start).map(_.asInstanceOf[GpxTailOffset])
      .getOrElse(GpxTailOffset(-1L, -1L))
    maxEpochs match {
      case None =>
        // the claim-lag clamp must never regress the checkpointed offset
        GpxTailOffset(full.epoch, math.max(full.delTs, s.delTs))
      case Some(m) =>
        val pending = epochFiles(new Configuration())
          .map(_._1).filter(e => e > s.epoch && e <= full.epoch)
          .distinct.sorted
        if (pending.length <= m)
          GpxTailOffset(full.epoch, math.max(full.delTs, s.delTs))
        else GpxTailOffset(pending(m.toInt - 1), s.delTs)
    }
  }

  override def deserializeOffset(json: String): Offset =
    GpxTailStream.parseOffset(json)

  /** synthetic-kind per output column: data columns read pixels, the
    * change-feed columns fill from the split, absent columns null-fill.
    * Stream-schema names resolve against each file's PHYSICAL names
    * through the table's _renames sidecar (GpxTable.physNameOf), exactly
    * like the batch scan — without it, epoch files written before an
    * ALTER TABLE RENAME COLUMN would silently stream nulls for the
    * renamed column. */
  private def synthFor(phys: StructType,
      renames: Map[String, Seq[String]]): Array[Byte] =
    schema.fields.map { fd =>
      if (withDeletes && fd.name == GpxTailSource.ChangeTypeCol)
        GpxFileReader.SynthConst
      else if (withDeletes && fd.name == GpxTailSource.ChangeTsCol)
        GpxFileReader.SynthCommitTs
      else if (phys.fieldNames.contains(
        GpxTable.physNameOf(phys, fd.name, renames))) GpxFileReader.SynthData
      else GpxFileReader.SynthAbsent
    }

  private def dataCols(footer: GpxFormat.Footer, rgIdx: Int,
      synth: Array[Byte],
      renames: Map[String, Seq[String]]): Array[Array[PixelSlice]] = {
    val phys = footer.schema
    val rg = footer.rowGroups(rgIdx)
    schema.fields.zipWithIndex.map { case (fd, ri) =>
      if (synth(ri) != GpxFileReader.SynthData) null
      else {
        val ch = rg.chunks(phys.fieldNames.indexOf(
          GpxTable.physNameOf(phys, fd.name, renames)))
        ch.pixels.indices.toArray.map(p => PixelSlice(
          ch.offset + ch.pixels(p).relOffset, ch.pixelLength(p),
          ch.pixels(p).rows))
      }
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = GpxTailStream.parseOffset(start.json())
    val to = GpxTailStream.parseOffset(end.json())
    val conf = new Configuration()
    // ONE table listing (and one renames read) serves both event kinds:
    // the recursive walk dominates streaming-plan latency on object
    // stores, so listing again for the delete side doubled per-trigger
    // planning I/O for no behavioral difference
    val files = epochFiles(conf)
    val renames = GpxTable.readRenames(root, conf)
    // INSERT events: the new epochs' rows, in epoch order
    val inserts = files
      .filter { case (e, _) => e > from.epoch && e <= to.epoch }
      .sortBy(_._1)
      .flatMap { case (_, file) =>
        val footer = GpxFileReader.FooterCache.get(file, conf)
        val synth = synthFor(footer.schema, renames)
        footer.rowGroups.indices.map { rgIdx =>
          val rg = footer.rowGroups(rgIdx)
          GpxInputPartition(file, rg.numRows, rg.commitTs,
            dataCols(footer, rgIdx, synth, renames), synth = synth,
            constStr = if (withDeletes) "insert" else null): InputPartition
        }
      }
    // DELETE events: rows masked by sidecars whose CREATION ts lies in
    // (from.delTs, to.delTs] (creation ts, not commitTs: path tables'
    // mask-unconditionally sidecars carry commitTs=-1) — the delWords
    // mask is INVERTED (drop all rows EXCEPT the deleted ones), so the
    // batch carries the full deleted rows; one partition per
    // (file, row group, creation ts). `_change_ts` reports the MVCC
    // commitTs when the delete has one, else the creation ts.
    val deletes =
      if (!withDeletes) Seq.empty[InputPartition]
      else epochSidecars(conf, files)
        .filter { case (fe, _, sc) =>
          // epoch gate: a DELETE event must never stream before its base
          // rows' epoch has been emitted, whatever the sidecar's stamp
          fe <= to.epoch &&
            sc.createTs > from.delTs && sc.createTs <= to.delTs }
        .groupBy { case (_, df, sc) => (df, sc.createTs) }
        .toSeq.sortBy { case ((df, ts), _) => (ts, df) }
        .flatMap { case ((file, cts), scs) =>
          val ts = scs.map(_._3.commitTs).find(_ >= 0).getOrElse(cts)
          val bits = new java.util.BitSet()
          scs.foreach { case (_, _, sc) =>
            bits.or(GpxDeleteBitmap.loadBitmap(sc.path, conf)) }
          val footer = GpxFileReader.FooterCache.get(file, conf)
          val synth = synthFor(footer.schema, renames)
          var rgStart = 0L
          footer.rowGroups.indices.flatMap { rgIdx =>
            val rg = footer.rowGroups(rgIdx)
            val s = rgStart
            rgStart += rg.numRows
            val first = bits.nextSetBit(s.toInt)
            if (first < 0 || first >= s + rg.numRows) None
            else {
              // keep ONLY masked rows: drop-bit set where NOT deleted
              val words = new Array[Long]((rg.numRows + 63) >> 6)
              var i = 0
              while (i < rg.numRows) {
                if (!bits.get(s.toInt + i)) words(i >> 6) |= 1L << (i & 63)
                i += 1
              }
              Some(GpxInputPartition(file, rg.numRows, ts,
                dataCols(footer, rgIdx, synth, renames), synth = synth,
                delWords = words, constStr = "delete"): InputPartition)
            }
          }
        }
    (inserts ++ deletes).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the change feed mixes masked (row-based) and plain splits, and a
    // scan must be uniformly row-based or columnar — CDC reads are
    // row-shaped anyway
    new GpxReaderFactory(schema, rowBased = withDeletes)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
