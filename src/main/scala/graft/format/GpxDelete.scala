package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** SQL `DELETE FROM <gpx table> WHERE ...` — merge-on-read OR copy-on-write
  * per affected file (reference analog: retina's delete path masks
  * visibility bitmaps, pixels-retina RGVisibility.java:34-60,
  * proto/retina.proto:84-108; COW compacts instead).
  *
  * Mode (`spark.graft.gpx.deleteMode`, default `auto`):
  *  - `mor`: every affected file gets a [[GpxDeleteBitmap]] sidecar — the
  *    delete is METADATA (a few KB per file), no data bytes move. Catalog
  *    tables stamp the sidecar with a fresh commitTs, so pre-delete
  *    snapshots still see the rows (true MVCC replay, beyond what COW can
  *    offer); path-based sidecars carry ts = -1 and always apply.
  *  - `cow`: affected files are rewritten without the matching rows in ONE
  *    Spark job for the whole delete — survivors carry their ORIGINAL
  *    row-group commitTs via the per-row `commitTsColumn` write routing,
  *    so a compacted file folding 32 load batches still rewrites in the
  *    same single job (the round-5 fan-out fix).
  *  - `auto`: one counting job, then files whose matched fraction is at
  *    most `spark.graft.gpx.morThreshold` (default 0.2) take the bitmap
  *    path and the rest rewrite — point-deletes stay metadata-only while
  *    mostly-deleted files get physically compacted.
  *
  * Scale shape: footer zone maps select ONLY the files that may hold a
  * matching row; the delete runs a bounded number of Spark jobs (<= 3)
  * regardless of file count or distinct commitTs values. SQL semantics:
  * rows where the predicate is NULL are kept (DELETE removes TRUE rows).
  */
object GpxDelete {

  /** refuse filters on synthetic metadata columns (_file/_commit_ts/_pos):
    * the rewrite below reads files with the DATA schema, so they would
    * not resolve — Spark then routes the delete through the row-level
    * operation, whose scan serves metadata columns natively */
  def translatable(f: Filter): Boolean =
    f.references.forall(c => !GpxTable.isSynthetic(c)) && toColumn(f).isDefined

  /** sources.Filter -> Column for the delete-supported subset; None marks
    * the filter untranslatable (canDeleteWhere then refuses, and Spark
    * reports the delete as unsupported instead of half-applying it). */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case StringStartsWith(c, v) => Some(col(c).startsWith(v))
    case StringEndsWith(c, v) => Some(col(c).endsWith(v))
    case StringContains(c, v) => Some(col(c).contains(v))
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(c) => toColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  def run(schema: StructType, roots: Seq[String],
      filters: Array[Filter], catalogManaged: Boolean = false): Unit = {
    val conf0 = new Configuration()
    // destructive op: serialize against other mutations on this table
    // for the WHOLE span (plan -> mask/rewrite -> retire), on EVERY
    // distinct root of a multi-root load — see GpxMutationLock for the
    // single-writer contract
    GpxMutationLock.withLocks(roots, conf0,
      s"DELETE ${filters.mkString(" AND ")}") {
      runLocked(schema, roots, filters, catalogManaged)
    }
  }

  private def runLocked(schema: StructType, roots: Seq[String],
      filters: Array[Filter], catalogManaged: Boolean): Unit = {
    val spark = SparkSession.active
    val conf = new Configuration()
    val pred = filters.flatMap(toColumn).reduceOption(_ && _).getOrElse(lit(true))
    // a row is DELETED when the predicate is TRUE; null-predicate rows stay
    val keepCond = !(pred <=> lit(true))
    val dataSchema =
      StructType(schema.filterNot(f => GpxTable.isSynthetic(f.name)))
    // zone-map prune: untouched files keep their bytes (and their commitTs)
    val affected = GpxTable.listFiles(roots, conf).filter { f =>
      val footer = GpxFileReader.FooterCache.get(f, conf)
      footer.rowGroups.exists(rg =>
        filters.forall(GpxFileReader.mayMatch(_, footer.schema, rg)))
    }
    if (affected.isEmpty) return

    // commit-log tables route every delete through copy-on-write: the
    // merge-on-read sidecar publish (tmp + rename per file, listing-
    // visible) is exactly the primitive the log protocol exists to avoid —
    // a half-copied sidecar on a non-atomic store would silently mask the
    // wrong rows. COW lands as ONE conditional-put manifest commit below.
    // checked across EVERY root: with a log table at a non-head position
    // a head-only probe would route its files through the rename-based
    // mor/cow paths — sidecars the protocol excludes, plus raw
    // fs.delete of files a manifest still lists as live
    val logTable = roots.exists(GpxCommitLog.isLogTable(_, conf))
    if (logTable) require(roots.size == 1,
      "gpx: DELETE over a multi-root load is not supported on commit-log tables")
    val mode =
      if (logTable) "cow"
      else spark.conf.getOption("spark.graft.gpx.deleteMode").getOrElse("auto")
    val threshold = spark.conf.getOption("spark.graft.gpx.morThreshold")
      .map(_.toDouble).getOrElse(GpxDeleteBitmap.DefaultMorThreshold)
    // the delete's own commit ts: catalog tables keep MVCC history (the
    // sidecar only applies at snapshots >= the delete); path-based tables
    // mask unconditionally, matching the COW history-compaction stance
    val deleteTs = if (catalogManaged) GpxTxn.stamp(roots.head, conf) else -1L

    def readFiles(files: Seq[String]) = spark.read.format("gpx")
      .schema(dataSchema).load(files: _*)

    val (morFiles, cowFiles): (Seq[String], Seq[String]) = mode match {
      case "mor" => (affected, Seq.empty)
      case "cow" => (Seq.empty, affected)
      case _ =>
        // auto: one counting job decides per file (existing masks apply
        // in the read, so re-deleting already-masked rows counts nothing)
        val counts = readFiles(affected)
          .filter(pred <=> lit(true))
          .groupBy(col(GpxTable.FileCol)).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val (mor, cow) = affected.partition { f =>
          counts.get(f) match {
            case None => true // nothing matched: neither job touches it
            case Some(n) =>
              val rows = GpxFileReader.FooterCache.get(f, conf)
                .rowGroups.map(_.numRows.toLong).sum
              n.toDouble / math.max(rows, 1L) <= threshold
          }
        }
        (mor, cow)
    }

    // ---- merge-on-read: one job writes the bitmap sidecars ----
    if (morFiles.nonEmpty) {
      // delete marker BEFORE any sidecar exists (under this op's lock):
      // a scan may over-report deletes transiently (skips a pushdown),
      // never under-report
      roots.foreach(GpxVersion.markDeletes(_, conf))
      val matched = readFiles(morFiles)
        .filter(pred <=> lit(true))
        .select(col(GpxTable.FileCol).as("f"), col(GpxTable.PosCol).as("p"))
        .repartition(col("f")) // all positions of one file in one task
      // executor-side sidecar writes (publish = temp + rename; a retried
      // task publishes a same-content duplicate that unions idempotently);
      // collect() returns only the sidecar paths — bounded by file count
      matched.queryExecution.toRdd.mapPartitions { it =>
        val c = new Configuration()
        val perFile = scala.collection.mutable.Map.empty[String, java.util.BitSet]
        it.foreach { row =>
          val f = row.getUTF8String(0).toString
          val p = row.getLong(1)
          require(p <= Int.MaxValue, s"row position $p in $f exceeds the " +
            "2^31-1 delete-bitmap addressing limit; compact into smaller files")
          perFile.getOrElseUpdate(f, new java.util.BitSet()).set(p.toInt)
        }
        perFile.iterator.map { case (f, bits) =>
          GpxDeleteBitmap.write(new Path(f), deleteTs, bits, bits.length.toLong, c)
        }
      }.collect()
    }

    // ---- copy-on-write: one job PER ROOT rewrites its affected files ----
    // (survivors must stay under the root that owned their file, written
    // under THAT root's layout specs — a single write into roots.head
    // would silently migrate every kept row of the other roots into the
    // first, leaving a later single-root load of those roots missing them)
    if (cowFiles.nonEmpty) {
      // normalize explicit-file roots (load("t/a.gpx")) to their table dir
      val rootDirs = roots.map { r =>
        if (r.endsWith(".gpx")) new Path(r).getParent.toString else r
      }
      val qroots = rootDirs.map(GpxTable.qualifiedRoot(_, conf))
      def ownerOf(f: String): String = {
        val q = new Path(f).getFileSystem(conf)
          .makeQualified(new Path(f)).toString
        rootDirs.zip(qroots).collectFirst {
          case (r, qr) if q == qr || q.startsWith(qr + "/") => r
        }.getOrElse(rootDirs.head)
      }
      cowFiles.groupBy(ownerOf).foreach { case (owner, ownedFiles) =>
      // MVCC history for SURVIVORS: each kept row is re-stamped with its
      // ORIGINAL row-group commitTs through the per-row commitTsColumn
      // routing — one output file per (ts, bucket) per task, so FOR
      // TIMESTAMP AS OF a pre-delete time still sees every kept row even
      // across compacted multi-ts files. Rows the delete REMOVED are gone
      // from history — the documented copy-on-write stance. Existing
      // delete bitmaps are applied by the read and FOLDED into the copy.
      val withTs = spark.read.format("gpx")
        .schema(dataSchema.add(StructField(
          GpxTable.CommitTsCol, LongType, nullable = false)))
        .load(ownedFiles: _*)
      val bucket = GpxTable.readBucketSpec(owner, conf)
      val range = GpxTable.readRangeSpec(owner, conf)
      val writer = withTs.filter(keepCond)
        .write.format("gpx").mode("append")
        .option("commitTsColumn", GpxTable.CommitTsCol)
      bucket.foreach(b => writer
        .option("bucketBy", b.column).option("numBuckets", b.numBuckets.toString))
      range.foreach(r => writer
        .option("rangeBy", r.column).option("rangeBounds", r.bounds.mkString(",")))
      // commit-log table: the inner append DEFERS its manifest commit so
      // survivors + retirements land as ONE atomic swap (no reader ever
      // sees the duplicated intermediate state)
      val deferToken =
        if (logTable) Some(java.util.UUID.randomUUID().toString) else None
      deferToken.foreach(writer.option("logDefer", _))
      writer.save(owner)
      deferToken match {
        case Some(token) =>
          val added = GpxCommitLog.drainDeferred(token)
          val entries = added.map(GpxCommitLog.entryFor(owner, _, conf))
          GpxCommitLog.commit(owner, conf, GpxCommitLog.Replace(entries,
            ownedFiles.map(GpxCommitLog.relOf(owner, _, conf)).toSet,
            Some(dataSchema)))
        case None =>
          // crash-safe order: replacements published first (visible),
          // originals dropped after — a crash in between duplicates kept
          // rows instead of losing them. Sidecars go with their files
          // (folded by the rewrite).
          ownedFiles.foreach { f =>
            val p = new Path(f)
            p.getFileSystem(conf).delete(p, false)
            GpxDeleteBitmap.dropSidecars(p, conf)
          }
      }
      }
    }
    // COW changed data files (and dropped their sidecars): exact marker +
    // fresh layout tokens, still under this op's lock. A MOR-only delete
    // leaves data files untouched — markDeletes above already set the
    // marker and bumped the delete-sensitive token; the data token must
    // NOT move, so bitmap deletes don't invalidate the point index
    // (lookups replay the bitmaps themselves).
    if (cowFiles.nonEmpty) {
      if (logTable) GpxVersion.bump(roots.head, conf)
      else roots.foreach(GpxVersion.recomputeDeletes(_, conf))
    }
  }
}
