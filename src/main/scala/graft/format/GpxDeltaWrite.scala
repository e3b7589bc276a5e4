package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA (merge-on-read) row-level operations — the full analog of the
  * reference's retina freshness model (RGVisibility.java:34-60,
  * proto/retina.proto:84-108: UPDATE = visibility-bitmap delete + append,
  * never a file rewrite). Enabled with
  * `spark.graft.gpx.rowLevelMode=mor`; the default group-based
  * copy-on-write path ([[GpxRowLevelOperation]]) stays for tables where
  * read-side masking is the wrong trade.
  *
  * Shape: Spark scans the table NORMALLY (row-group/pixel pruning stays
  * on — unmatched rows are never read, unlike the COW path's file-granular
  * scan) and routes each matched row's change to [[GpxDeltaWriter]] with
  * its (_file, _pos) row id. Deletes accumulate per-file position bitmaps;
  * inserts (and the insert half of updates — representUpdateAsDeleteAndInsert)
  * write ordinary staged gpx files stamped with the operation's commitTs.
  * commit() publishes the staged files, then writes ONE merged bitmap
  * sidecar per touched file.
  *
  * MVCC: on a catalog table the op stamps a fresh ts on both halves, so
  * FOR TIMESTAMP AS OF a pre-op time sees the ORIGINAL rows with their
  * ORIGINAL values — the delta path retains modified-row history that
  * copy-on-write physically destroys (the round-5 documented
  * approximation, now closed when mor is on).
  *
  * Scale: an UPDATE touching 0.001% of a 100 TB table writes O(changed
  * rows) bytes + a few-KB sidecar per touched file; write amplification
  * is gone, the read-side cost is the bitmap mask until compaction folds
  * it. Crash order: inserts publish before sidecars — a crash in between
  * shows transient duplicates (old + new), never missing rows, matching
  * every other gpx publish path. */
class GpxDeltaOperation(schema: StructType, roots: Seq[String],
    catalogManaged: Boolean, cmd: RowLevelOperation.Command)
  extends RowLevelOperation with SupportsDelta {

  // delete-sidecar fingerprint taken at OPERATION CONSTRUCTION — before
  // Spark builds the scan, so it can never postdate the scan's cached
  // mask walk. A sidecar committed between here and the scan walk makes
  // the commit-time comparison fail SPURIOUSLY (safe: retry succeeds);
  // capturing later (at write exec) had the unsafe direction — a mask
  // the scan never applied could pass the check and resurrect
  // concurrently-deleted rows.
  private val sidecarsAtPlan =
    GpxMutationLock.sidecarState(roots.head, new Configuration())

  override def command(): RowLevelOperation.Command = cmd

  /** plain pruned scan — matched rows only, masks applied */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GpxScanBuilder(schema, roots, None)

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GpxTable.FileCol),
    Expressions.column(GpxTable.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        val ts = if (catalogManaged)
          GpxTxn.stamp(roots.head, new Configuration()) else -1L
        val rowIdSchema = info.rowIdSchema().orElse(new StructType())
        new GpxDeltaWrite(info.schema(), rowIdSchema, roots.head, ts,
          sidecarsAtPlan)
      }
    }

  override def description(): String = s"GpxDeltaOperation($cmd)"
}

class GpxDeltaWrite(dataSchema: StructType, rowIdSchema: StructType,
    root: String, commitTs: Long,
    sidecarsAtPlan: Set[String]) extends DeltaWrite
  with RequiresDistributionAndOrdering {

  /** the insert half must keep the table's ordered layout: declare the
    * persisted _sortspec ordering so Spark sorts within partitions
    * before rows reach the writer (same contract as INSERT) */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.unspecified()

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    GpxTable.readSortSpec(root, new Configuration()).map { c =>
      org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.column(c),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)
    }.toArray

  override def toBatch: DeltaBatchWrite =
    new GpxDeltaBatchWrite(dataSchema, rowIdSchema, root, commitTs,
      sidecarsAtPlan)
}

class GpxDeltaBatchWrite(dataSchema: StructType, rowIdSchema: StructType,
    root: String, commitTs: Long,
    // delete-sidecar state fingerprinted at OPERATION construction (see
    // GpxDeltaOperation): two concurrent delta UPDATEs of the same rows
    // would each mask the original once and insert its own new copy —
    // verifyStillPresent alone cannot catch that (merge-on-read never
    // removes the file), the sidecar-state change does
    sidecarsAtPlan: Set[String]) extends DeltaBatchWrite {

  private val opId = java.util.UUID.randomUUID().toString.take(8)
  private val staging = s"$root/_delta_$opId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val conf = new Configuration()
    val fileIdx = rowIdSchema.fieldNames.indexOf(GpxTable.FileCol)
    val posIdx = rowIdSchema.fieldNames.indexOf(GpxTable.PosCol)
    // fail fast on the driver: a planning path that delivers no (or a
    // partial) row-id projection would otherwise surface as a getLong(-1)
    // ArrayIndexOutOfBounds deep in an executor task after the scan ran
    require(fileIdx >= 0 && posIdx >= 0,
      s"gpx delta write needs (${GpxTable.FileCol}, ${GpxTable.PosCol}) in " +
        s"the row-id schema, got: ${rowIdSchema.fieldNames.mkString(", ")}")
    GpxDeltaWriterFactory(dataSchema, staging, opId, fileIdx, posIdx,
      commitTs, GpxTable.readBucketSpec(root, conf),
      GpxTable.readRangeSpec(root, conf),
      sortBy = GpxTable.readSortSpec(root, conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(conf)
    val commits = messages.collect { case c: GpxDeltaCommit => c }
    GpxMutationLock.withLock(root, conf, "delta (merge-on-read) commit") {
    // the files this delta masks must still exist under the lock —
    // a vanished one was rewritten concurrently; its positions no longer
    // address the rows this op deleted
    GpxMutationLock.verifyStillPresent(fs,
      commits.flatMap(_.deletes.keys).distinct)
    // ... and no concurrent op may have masked rows since this op's scan
    GpxMutationLock.verifySidecarsUnchanged(root, conf, sidecarsAtPlan,
      "delta commit")
    // Rollback-protected two-step publish: a failure ANYWHERE below
    // un-publishes the already-renamed insert files and deletes the
    // already-written sidecars before rethrowing — Spark's abort() then
    // clears staging, and the table is exactly its pre-op self. Without
    // this, a mid-commit failure would leave updated rows visible twice
    // (published insert, no mask) forever.
    val published = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    val sidecars = scala.collection.mutable.ArrayBuffer.empty[Path]
    try {
      // 1) publish the staged insert files of WINNING attempts (m<opId>-
      // prefix keeps names collision-free; -bN/-rN routing suffix stays
      // last). Inserts before masks: a crash in between shows transient
      // duplicates, never missing rows.
      commits.flatMap(_.files).foreach { f =>
        val p = new Path(f)
        val dest = new Path(rootP, s"m$opId-${p.getName}")
        if (!fs.rename(p, dest))
          throw new java.io.IOException(s"delta publish failed: $p -> $dest")
        published += ((dest, p))
      }
      // 2) merge per-task delete bitmaps per file, one sidecar per file
      val merged = scala.collection.mutable.Map.empty[String, java.util.BitSet]
      commits.foreach(_.deletes.foreach { case (file, words) =>
        val bs = java.util.BitSet.valueOf(words)
        merged.get(file) match {
          case Some(acc) => acc.or(bs)
          case None => merged(file) = bs
        }
      })
      // delete marker BEFORE the first sidecar publishes (under the lock)
      if (merged.nonEmpty) GpxVersion.markDeletes(root, conf)
      merged.foreach { case (file, bits) =>
        sidecars += new Path(GpxDeleteBitmap.write(new Path(file), commitTs,
          bits, bits.length.toLong, conf))
      }
    } catch {
      case e: Throwable =>
        // rollback ORDER matters: un-publishing an insert file is only
        // safe once every sidecar that masks its predecessor rows is
        // verifiably gone. If any sidecar delete fails, the inserts MUST
        // stay published — masked originals plus live replacements are
        // transient duplicates; masked originals with destroyed
        // replacements are missing rows, the one state this path
        // promises never to produce.
        var sidecarStuck = false
        sidecars.foreach { s =>
          try { if (!fs.delete(s, false) && fs.exists(s)) sidecarStuck = true }
          catch { case _: Throwable => sidecarStuck = true }
        }
        if (!sidecarStuck)
          published.reverseIterator.foreach { case (dest, src) =>
            try fs.rename(dest, src) catch { case _: Throwable => () }
          }
        throw e
    }
    fs.delete(new Path(staging), true)
    // fresh DATA-layout token only when insert files were published — a
    // mask-only commit (e.g. a MERGE whose matched branches only delete)
    // leaves data files untouched: markDeletes above already bumped the
    // delete-sensitive token, and moving the data token too would
    // needlessly invalidate every point index and projection (lookups
    // replay bitmaps themselves, same stance as GpxDelete's MOR path)
    if (published.nonEmpty) GpxVersion.bump(root, conf)
    } // mutation lock
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val stP = new Path(staging)
    stP.getFileSystem(conf).delete(stP, true)
  }
}

/** (staged insert files, per-source-file delete bitmap words) */
final case class GpxDeltaCommit(files: Seq[String],
    deletes: Map[String, Array[Long]]) extends WriterCommitMessage

final case class GpxDeltaWriterFactory(dataSchema: StructType,
    staging: String, opId: String, fileIdx: Int, posIdx: Int,
    commitTs: Long, bucket: Option[GpxTable.BucketSpec],
    range: Option[GpxTable.RangeSpec] = None,
    sortBy: Seq[String] = Nil)
  extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] = {
    // inserts ride the ordinary routed writer (bucket/range suffixes, ts
    // tag, per-attempt staged names, sortedBy footer claim — Spark
    // already sorted the rows per requiredOrdering; without the claim
    // the whole table's reported ordering collapses to the per-file
    // minimum prefix, Nil) — same physical layout as an INSERT
    val inner = GpxWriterFactory(dataSchema, staging, opId,
      GpxFormat.DefaultRowGroupRows, GpxFormat.DefaultPixelRows,
      commitTs, bucket, range = range, sortBy = sortBy)
      .createWriter(partitionId, taskId)
    val deletes = scala.collection.mutable.Map.empty[String, java.util.BitSet]

    new DeltaWriter[InternalRow] {
      override def delete(meta: InternalRow, id: InternalRow): Unit = {
        val file = id.getUTF8String(fileIdx).toString
        val pos = id.getLong(posIdx)
        // delete bitmaps address int row positions — a single gpx file
        // holding 2^31+ rows cannot be bitmap-masked (fail fast rather
        // than wrap; the writer's row-group sizing never produces one)
        require(pos <= Int.MaxValue, s"row position $pos in $file exceeds " +
          "the 2^31-1 delete-bitmap addressing limit; compact into smaller files")
        deletes.getOrElseUpdate(file, new java.util.BitSet()).set(pos.toInt)
      }
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        delete(meta, id); insert(row)
      }
      override def insert(row: InternalRow): Unit = inner.write(row)
      override def commit(): WriterCommitMessage = {
        val files = inner.commit() match {
          case GpxCommit(fs) => fs
          case _ => Seq.empty
        }
        GpxDeltaCommit(files,
          deletes.view.mapValues(_.toLongArray).toMap)
      }
      override def abort(): Unit = inner.abort()
      override def close(): Unit = ()
    }
  }
}
