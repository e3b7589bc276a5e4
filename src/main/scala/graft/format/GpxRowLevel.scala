package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based (copy-on-write) row-level operations: SQL UPDATE and
  * MERGE INTO (and DELETE with predicates SupportsDelete can't translate,
  * e.g. subqueries — Spark's optimizer still routes translatable deletes
  * to the metadata-only path). Reference analog: retina's row-level
  * update/delete surface, proto/retina.proto:34-50 — retina masks
  * visibility, gpx compacts: affected files are rewritten wholesale.
  *
  * Mechanics (the Iceberg-style COW contract):
  *  1. Spark asks [[GpxRowLevelOperation.newScanBuilder]] for the rows to
  *     rewrite. That scan runs FILE-granular (see GpxScanBuilder): any
  *     file that may contain a matching row is read completely, and its
  *     path is recorded in [[GpxRowLevelOperation.replacedFiles]].
  *  2. Spark computes the replacement rows (updates applied; unmatched
  *     rows passed through) and writes them via the replace write below
  *     into an underscore-hidden scratch dir (invisible to readers).
  *  3. commit() swaps: recorded files are deleted, scratch files move into
  *     the table dir under collision-free names that keep their bucket
  *     suffix, so bucketed layouts stay storage-partitioned. Single-writer
  *     semantics, same as every other gpx write path.
  */
class GpxRowLevelOperationBuilder(
    schema: StructType, roots: Seq[String], catalogManaged: Boolean,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GpxRowLevelOperation(schema, roots, catalogManaged, info.command())
}

class GpxRowLevelOperation(
    schema: StructType, roots: Seq[String], catalogManaged: Boolean,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** files whose rows the operation's scan produced — exactly the set the
    * written replacement data supersedes */
  val replacedFiles: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // delete-sidecar fingerprint taken at OPERATION CONSTRUCTION — strictly
  // before Spark builds any scan, so it can never postdate the scan's
  // cached mask walk (same discipline as GpxDeltaOperation). Capturing at
  // toBatch had the unsafe direction: a merge-on-read delete committing
  // between the scan's mask walk and toBatch would pass the commit-time
  // comparison, and this rewrite's dropSidecars would fold its mask away,
  // resurrecting the concurrently-deleted rows. Captured here, that race
  // flips to a safe spurious abort (retry sees the mask).
  private[format] val sidecarsAtPlan =
    GpxMutationLock.sidecarState(roots.head, new Configuration())

  /** live data-file NAMES at operation construction — the baseline for
    * commit()'s cross-snapshot conflict check (names are uuid-unique
    * within a table dir, so the comparison is path-form-proof). See
    * [[GpxReplaceBatchWrite.commit]] for the race this closes. */
  private[format] val filesAtPlan: Set[String] =
    GpxTable.listFiles(roots, new Configuration())
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet

  /** per-file manifest stats at operation construction (commit-log
    * tables only) — lets commit() SCOPE the cross-snapshot conflict
    * check to files the operation's static filters could have matched:
    * a concurrent rewrite of provably-unrelated files (background
    * compaction of a cold range, an unrelated DELETE) must not abort
    * this op. Captured at the same instant as [[filesAtPlan]] so the
    * stats describe exactly the files the baseline names. Non-log
    * tables have no retained stats for retired files → None → the
    * check stays table-wide (conservative, never unsound). */
  private[format] val statsAtPlan: Option[Map[String, GpxCommitLog.FileEntry]] = {
    val conf = new Configuration()
    val r = roots.head
    if (roots.size == 1 && !r.endsWith(".gpx") && GpxCommitLog.isLogTable(r, conf))
      GpxCommitLog.head(r, conf).map(_.live.iterator.map { e =>
        (e.relPath.substring(e.relPath.lastIndexOf('/') + 1), e)
      }.toMap)
    else None
  }

  /** static (plan-time) data filters Spark pushed to the row scan — the
    * scope key for the conflict check above. None until pushdown runs;
    * an operation whose scan gets no pushed filters (MERGE with no
    * static target predicate) keeps the table-wide scope, which is
    * correct: any file could hold matching rows. */
  @volatile private[format] var staticFilters
      : Option[Array[org.apache.spark.sql.sources.Filter]] = None

  override def command(): RowLevelOperation.Command = cmd

  private val mainScanBuilt = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** The FIRST scan built is the operation's row scan (built by
    * GroupBasedRowLevelOperationScanPlanning): file-granular, recording.
    * LATER builds come from the runtime group-filtering rule's
    * matching-rows subquery — those are plain existence reads that must
    * use normal row-group/pixel pruning and must NOT record into
    * [[replacedFiles]] (the subquery covers statically-candidate files, a
    * superset of what the write actually replaces — recording them would
    * over-delete at commit). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (mainScanBuilt.compareAndSet(false, true))
      new GpxScanBuilder(schema, roots, None,
          fileGranular = Some(replacedFiles)) {
        // capture the STATIC filters Spark pushes to the row scan (runtime
        // group filters arrive later via GpxScan.filter, never here) —
        // they scope commit()'s cross-snapshot conflict check
        override def pushFilters(fs: Array[org.apache.spark.sql.sources.Filter])
            : Array[org.apache.spark.sql.sources.Filter] = {
          staticFilters = Some(fs)
          super.pushFilters(fs)
        }
      }
    else new GpxScanBuilder(schema, roots, None)

  /** `_file` does triple duty: (1) declaring a metadata attribute routes
    * Spark onto the PROJECTED write path (DataAndMetadataWritingSparkTask)
    * — with no metadata attrs, group-based writes receive the RAW query
    * rows still carrying the __row_operation column, a silent row-layout
    * mismatch; (2) it is the GROUP column Spark's runtime group filtering
    * uses to narrow the copy-on-write scan to `_file IN (files with
    * matches)` — for MERGE, where the target side has no static filters,
    * this is the difference between rewriting the whole table and
    * rewriting only the touched files; (3) delivered per row to the
    * replace writer, it lets commit() VERIFY the recorded replaced set
    * against the files the written rows actually came from.
    * `_commit_ts` rides along so the rewrite can re-stamp each row with
    * its ORIGINAL commit timestamp — pass-through rows stay visible at
    * pre-operation snapshots. Both served split-constant, zero I/O. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(
      org.apache.spark.sql.connector.expressions.Expressions
        .column(GpxTable.FileCol),
      org.apache.spark.sql.connector.expressions.Expressions
        .column(GpxTable.CommitTsCol))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val commitTs = if (catalogManaged)
      GpxTxn.stamp(roots.head, new Configuration()) else -1L
    // metadata row layout, resolved by NAME (never by assumed position)
    val metaSchema = if (info.metadataSchema().isPresent)
      info.metadataSchema().get() else new StructType()
    val fileIdx = metaSchema.fieldNames.indexOf(GpxTable.FileCol)
    val tsIdx = metaSchema.fieldNames.indexOf(GpxTable.CommitTsCol)
    new WriteBuilder {
      override def build(): Write = new Write
        with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        // the rewrite must keep the table's ordered layout, exactly like
        // INSERT and the delta insert half: declare the persisted
        // _sortspec ordering so Spark sorts the replacement rows before
        // they reach the writer (elided when already ordered)
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions
            .unspecified()
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          GpxTable.readSortSpec(roots.head, new Configuration()).map { c =>
            org.apache.spark.sql.connector.expressions.Expressions.sort(
              org.apache.spark.sql.connector.expressions.Expressions.column(c),
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING)
          }.toArray
        override def toBatch: BatchWrite = new GpxReplaceBatchWrite(
          info.schema(), roots.head, commitTs, replacedFiles, cmd,
          fileIdx, tsIdx, sidecarsAtPlan, filesAtPlan, statsAtPlan,
          // thunk: filter pushdown on the row scan may run after this
          // write is built — commit() reads the final value
          () => staticFilters)
      }
    }
  }

  override def description(): String = s"GpxRowLevelOperation($cmd)"
}

/** Replace-data write: stage into `<root>/_replace_<uuid>/`, then on commit
  * delete the superseded files and move the staged files in.
  *
  * MVCC through the rewrite: each incoming row arrives with its source
  * `_commit_ts` / `_file` metadata (write(meta, row), the projected write
  * path). Rows are routed to one staged file per (original commitTs,
  * bucket), stamped with that ORIGINAL ts — so rows the operation merely
  * passed through remain visible at pre-operation snapshots. Rows a MERGE
  * inserts carry null metadata and get the operation's fresh ts. The
  * documented approximation: pre-op VALUES of rows the op modified are
  * not retained (copy-on-write destroys them) — those rows time-travel
  * with their original ts but current values.
  *
  * Safety: commit() cross-checks the recorded replaced set against the
  * `_file` values the written rows actually carried. If the written data
  * references a file the row scan did not record (a scan-role mix-up —
  * e.g. a Spark version reordering GroupBasedRowLevelOperationScanPlanning
  * vs the runtime group-filter subquery), the commit REFUSES instead of
  * silently duplicating or dropping rows. For UPDATE (which never removes
  * rows) the deletion set is exactly the files whose rows were written
  * back — a replaced-but-unconsumed file is left in place rather than
  * deleted, so a pruning scan can never translate into row loss. */
class GpxReplaceBatchWrite(
    schema: StructType, root: String, commitTs: Long,
    replacedFiles: java.util.Set[String],
    cmd: RowLevelOperation.Command,
    fileIdx: Int, tsIdx: Int,
    // delete-sidecar state captured at OPERATION construction (see
    // GpxRowLevelOperation) — re-checked at commit under the lock: a
    // sidecar added by a concurrent merge-on-read delete would be FOLDED
    // AWAY by this rewrite's dropSidecars, resurrecting the deleted rows
    sidecarsAtPlan: Set[String],
    // live data-file names at operation construction — re-diffed at
    // commit under the lock for the cross-snapshot conflict check below
    filesAtPlan: Set[String],
    // per-file manifest stats at plan (log tables) + the row scan's
    // pushed static filters: together they SCOPE the conflict check to
    // files the operation could have matched (see commit below)
    statsAtPlan: Option[Map[String, GpxCommitLog.FileEntry]],
    staticFilters: () => Option[Array[org.apache.spark.sql.sources.Filter]])
  extends BatchWrite {

  private val opId = java.util.UUID.randomUUID().toString.take(8)
  private val tmp = s"$root/_replace_$opId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new Configuration()
    // the rewrite preserves the FULL physical layout: bucket AND range
    // routing (rewritten files keep their -bN/-rN pruning tags) and the
    // sortedBy footer claim (Spark sorted per requiredOrdering) — a COW
    // update must not erode what INSERT and compaction maintain
    GpxReplaceWriterFactory(schema, tmp, GpxFormat.DefaultRowGroupRows,
      GpxFormat.DefaultPixelRows, commitTs,
      GpxTable.readBucketSpec(root, conf), fileIdx, tsIdx,
      range = GpxTable.readRangeSpec(root, conf),
      sortBy = GpxTable.readSortSpec(root, conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // test-only interleave barrier: by now every scan this operation will
    // ever run has executed, and nothing has been published — the widest
    // deterministic window for racing a concurrent rewrite against the
    // conflict checks below (DmlFuzzSpec drives it; no-op in production)
    GpxReplaceBatchWrite.beforeCommitHook()
    val conf = new Configuration()
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(conf)
    val tmpP = new Path(tmp)
    val consumed = messages.flatMap {
      case GpxReplaceCommit(_, sourceFiles) => sourceFiles
      case _ => Seq.empty
    }.toSet
    val recorded = new java.util.HashSet[String](replacedFiles)
    GpxMutationLock.withLock(root, conf, s"${cmd} rewrite-commit") {
    // under the lock, the files this rewrite consumed must still exist —
    // a vanished one means a concurrent mutation (e.g. after a stale-lock
    // steal) already rewrote it and publishing would duplicate its rows
    GpxMutationLock.verifyStillPresent(fs, recorded.asScalaSet)
    // ... and the sidecar state must match what this op's scan saw
    GpxMutationLock.verifySidecarsUnchanged(root, conf, sidecarsAtPlan,
      s"$cmd rewrite-commit")
    // CROSS-SNAPSHOT CONFLICT CHECK (round 14, found by the hostile COW
    // fuzz under load, reproduced 2/8 with a 24-thread CPU hog): the
    // operation's ROW SCAN and the runtime group-filter subquery are
    // SEPARATE plans that can pin DIFFERENT manifest versions. When a
    // concurrent writer replaces files between the two resolutions, the
    // `_file IN (files with matches)` intersection silently drops groups
    // — observed as an UPDATE committing an EMPTY Replace (evidence
    // manifest v5: no rm, no add) and reporting success while its
    // increment vanished; remove-set liveness cannot catch it because
    // the remove set is empty. Any file that was live at plan time, is
    // gone now, and is NOT being removed by THIS commit means a
    // concurrent rewrite of data this operation may have scanned (or
    // should have): refuse so the caller retries from a fresh snapshot.
    // Appends alone retire nothing and trip nothing. Causality makes the
    // check sufficient: a conflicting rewrite can only have influenced
    // our scans if it committed BEFORE they executed, hence strictly
    // before this listing.
    val liveNames = GpxTable.listFiles(Seq(root), conf)
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val ownRemoveNames = recorded.asScalaSet
      .map(f => f.substring(f.lastIndexOf('/') + 1))
    val retiredAll = filesAtPlan -- liveNames -- ownRemoveNames
    // SCOPE (round 15, ADVICE): a retired file whose PLAN-TIME zone maps
    // prove it could never match the operation's static filters cannot
    // have held a matching group under ANY snapshot either scan pinned —
    // its concurrent rewrite (background compaction, an unrelated DELETE)
    // is no conflict. Everything about the test is plan-time state
    // (manifest stats captured with filesAtPlan, filters as pushed), so
    // the scoping is race-free; any gap — non-log table, no pushed
    // filters (MERGE join conditions never push), a file the captured
    // manifest does not list — keeps the file IN scope. Synthetic-column
    // filters (_file) find no stats and stay conservative-true.
    val retiredSincePlan = (statsAtPlan, staticFilters()) match {
      case (Some(entries), Some(fs)) if fs.nonEmpty =>
        val fileSchema = org.apache.spark.sql.types.StructType(
          schema.filterNot(f => GpxTable.isSynthetic(f.name)))
        val renames = GpxTable.readRenames(root, conf)
        retiredAll.filter { name =>
          entries.get(name).forall { e =>
            fs.forall { fl =>
              GpxFileReader.mayMatchNamed(fl, fileSchema, e.numRows, c =>
                (c +: renames.getOrElse(c, Seq.empty)).iterator
                  .flatMap(e.stats.get).nextOption())
            }
          }
        }
      case _ => retiredAll
    }
    if (retiredSincePlan.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"gpx $cmd rewrite refused: ${retiredSincePlan.size} file(s) live " +
          s"when this operation planned were rewritten concurrently " +
          s"(${retiredSincePlan.take(3).mkString(", ")}…) — the row scan " +
          "and its runtime group filter may have pinned different " +
          "snapshots and silently dropped matching groups. Retry the " +
          "operation.")
    val unrecorded = consumed.filterNot(recorded.contains)
    if (unrecorded.nonEmpty)
      throw new IllegalStateException(
        s"gpx replace commit: written rows came from files the row scan " +
        s"never recorded (${unrecorded.take(3).mkString(", ")}…) — " +
        "scan-role mismatch, refusing to commit")
    // order matters for crash safety: stage the replacements IN first,
    // delete the superseded files after. A crash in between leaves
    // duplicates (recoverable, visible), never missing rows. Single-writer
    // semantics, like every gpx write path. Only files named by WINNING
    // attempts' commit messages move in — a zombie attempt's staged
    // leftovers are swept with the staging dir, never published.
    // rollback-protected publish: a mid-loop rename failure un-publishes
    // the already-landed replacements before rethrowing — without it,
    // Spark's abort() only sweeps staging, and the orphaned r<opId>- files
    // (listing-visible, originals still in place) would double every one
    // of their rows forever (same failure class GpxDeltaBatchWrite guards)
    val publishedDests = scala.collection.mutable.ArrayBuffer.empty[String]
    val publishedPairs = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    try {
      messages.foreach {
        case GpxReplaceCommit(files, _) => files.foreach { f =>
          val p = new Path(f)
          // r<opId>- prefix avoids name collisions with any earlier write;
          // the trailing -bN bucket suffix (if any) stays at the end, so
          // bucket routing/pruning keep working on the rewritten files
          val dest = new Path(rootP, s"r$opId-${p.getName}")
          if (!fs.rename(p, dest))
            throw new java.io.IOException(s"replace rename failed: $p -> $dest")
          publishedDests += dest.toString
          publishedPairs += ((dest, p))
        }
        case _ => ()
      }
    } catch {
      case e: Throwable =>
        publishedPairs.reverseIterator.foreach { case (dest, src) =>
          try fs.rename(dest, src) catch { case _: Throwable => () }
        }
        throw e
    }
    fs.delete(tmpP, true)
    // UPDATE writes every row of every replaced file back: deleting only
    // the files the written rows were CONSUMED from makes a (hypothetical)
    // under-recording scan harmless. DELETE/MERGE can legitimately consume
    // zero rows of a fully-deleted file, so the recorded set is the
    // contract there. (fileIdx < 0 = no metadata projection arrived; fall
    // back to the recorded contract rather than deleting nothing.)
    val toDelete =
      if (cmd == RowLevelOperation.Command.UPDATE && fileIdx >= 0) consumed
      else recorded.asScalaSet
    // nothing rewritten, nothing retired, and the conflict check above
    // proved the live set did not move under the operation: a GENUINE
    // no-match (e.g. MERGE with no matching rows) — commit nothing
    // rather than recording a no-op manifest version
    if (publishedDests.isEmpty && toDelete.isEmpty) ()
    else if (GpxCommitLog.isLogTable(root, conf)) {
      // commit-log table: additions + retirements land as ONE conditional-
      // put manifest commit (readers never see the intermediate duplicate
      // state); superseded bytes stay for pinned readers until vacuum. A
      // concurrent rewrite of any consumed file makes the commit REFUSE
      // (ConcurrentModificationException) instead of duplicating rows —
      // the optimistic-concurrency analog of the lock + verifyStillPresent
      // defense above, and the one that holds on stores where exclusive
      // create is last-writer-wins.
      val entries = publishedDests.toSeq.map(GpxCommitLog.entryFor(root, _, conf))
      GpxCommitLog.commit(root, conf, GpxCommitLog.Replace(entries,
        toDelete.map(GpxCommitLog.relOf(root, _, conf)), Some(schema)))
      GpxVersion.bump(root, conf)
    } else {
      toDelete.foreach { f =>
        val p = new Path(f)
        fs.delete(p, false)
        // the rewrite's scan applied any merge-on-read masks, so the copy
        // FOLDED them — their sidecars go with the superseded file
        GpxDeleteBitmap.dropSidecars(p, conf)
      }
      // exact delete marker + fresh layout token, still under the lock
      GpxVersion.recomputeDeletes(root, conf)
    }
    } // mutation lock
  }

  private implicit class JSet(s: java.util.Set[String]) {
    def asScalaSet: Set[String] = {
      val b = Set.newBuilder[String]
      s.forEach(e => b += e)
      b.result()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val tmpP = new Path(tmp)
    tmpP.getFileSystem(conf).delete(tmpP, true)
  }
}

object GpxReplaceBatchWrite {
  /** test-only hook run at the top of every replace commit() — between
    * the operation's last scan and its first published byte. Lets specs
    * interleave a concurrent rewrite at exactly the point the COW
    * cross-snapshot race lives, deterministically. Production never sets
    * it. */
  @volatile private[graft] var beforeCommitHook: () => Unit = () => ()
}

final case class GpxReplaceCommit(files: Seq[String], sourceFiles: Seq[String])
  extends WriterCommitMessage

/** Writer for replace-data output: routes each row to a staged file keyed
  * by (original commitTs from row metadata, bucket), so every staged file
  * is stamped with a single coherent ts. Collects the distinct source
  * `_file` values for the commit-time verification. */
final case class GpxReplaceWriterFactory(
    schema: StructType, staging: String, rgRows: Int, pxRows: Int,
    newCommitTs: Long, bucket: Option[GpxTable.BucketSpec],
    fileIdx: Int, tsIdx: Int,
    range: Option[GpxTable.RangeSpec] = None,
    sortBy: Seq[String] = Nil) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val conf = new Configuration()
    val routeCol = bucket.map(_.column).orElse(range.map(_.column))
    val keyIdx = routeCol.map(schema.fieldIndex)
    val keyDt = keyIdx.map(schema(_).dataType)
    val writers =
      scala.collection.mutable.LinkedHashMap.empty[(Long, Int), (String, GpxFileWriter)]
    val sources = scala.collection.mutable.Set.empty[String]

    // THE shared row→route function (GpxTable.routeOfRow) — this factory
    // used to carry a drifted copy that silently dropped range routing
    def bucketOf(record: InternalRow): Int =
      GpxTable.routeOfRow(record, keyIdx, keyDt, bucket, range)

    def writerFor(ts: Long, bk: Int): GpxFileWriter =
      writers.getOrElseUpdate((ts, bk), {
        val tsTag = if (ts >= 0) s"-t$ts" else ""
        val tag = if (bk < 0) "" else if (range.isDefined) s"-r$bk" else s"-b$bk"
        val file = s"$staging/part-$partitionId-$taskId$tsTag$tag.gpx"
        (file, new GpxFileWriter(file, schema, conf, rgRows, pxRows, ts,
          sortedBy = sortBy))
      })._2

    new DataWriter[InternalRow] {
      // projected write path: metadata row first, data row second
      override def write(meta: InternalRow, record: InternalRow): Unit = {
        val ts =
          if (meta == null || tsIdx < 0 || meta.isNullAt(tsIdx)) newCommitTs
          else meta.getLong(tsIdx)
        if (meta != null && fileIdx >= 0 && !meta.isNullAt(fileIdx))
          sources += meta.getUTF8String(fileIdx).toString
        writerFor(ts, bucketOf(record)).addRow(record)
      }
      // rows with no metadata (e.g. a MERGE insert branch delivered as a
      // plain write): fresh rows, stamped with the operation's ts
      override def write(record: InternalRow): Unit =
        writerFor(newCommitTs, bucketOf(record)).addRow(record)
      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._2.close())
        GpxReplaceCommit(writers.values.map(_._1).toSeq, sources.toSeq)
      }
      override def abort(): Unit = writers.values.foreach(_._2.abort())
      override def close(): Unit = ()
    }
  }
}
