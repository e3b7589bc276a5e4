package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
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
      new GpxScanBuilder(schema, roots, None, fileGranular = Some(replacedFiles))
    else new GpxScanBuilder(schema, roots, None)

  /** `_file` does double duty: (1) declaring a metadata attribute routes
    * Spark onto the PROJECTED write path (DataAndMetadataWritingSparkTask)
    * — with no metadata attrs, group-based writes receive the RAW query
    * rows still carrying the __row_operation column, a silent row-layout
    * mismatch; (2) it is the GROUP column Spark's runtime group filtering
    * uses to narrow the copy-on-write scan to `_file IN (files with
    * matches)` — for MERGE, where the target side has no static filters,
    * this is the difference between rewriting the whole table and
    * rewriting only the touched files. Served split-constant, zero I/O. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GpxTable.FileCol))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val commitTs =
      if (catalogManaged) System.currentTimeMillis() * 1000L else -1L
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GpxReplaceBatchWrite(
          info.schema(), roots.head, commitTs, replacedFiles)
      }
    }
  }

  override def description(): String = s"GpxRowLevelOperation($cmd)"
}

/** Replace-data write: stage into `<root>/_replace_<uuid>/`, then on commit
  * delete the superseded files and move the staged files in. */
class GpxReplaceBatchWrite(
    schema: StructType, root: String, commitTs: Long,
    replacedFiles: java.util.Set[String]) extends BatchWrite {

  private val opId = java.util.UUID.randomUUID().toString.take(8)
  private val tmp = s"$root/_replace_$opId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new Configuration()
    val bucket = GpxTable.readBucketSpec(root, conf)
    GpxWriterFactory(schema, tmp, GpxFormat.DefaultRowGroupRows,
      GpxFormat.DefaultPixelRows, commitTs, bucket)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(conf)
    val tmpP = new Path(tmp)
    // order matters for crash safety: stage the replacements IN first,
    // delete the superseded files after. A crash in between leaves
    // duplicates (recoverable, visible), never missing rows. Single-writer
    // semantics, like every gpx write path.
    if (fs.exists(tmpP)) {
      fs.listStatus(tmpP).map(_.getPath)
        .filter(_.getName.endsWith(".gpx"))
        .foreach { p =>
          // r<opId>- prefix avoids name collisions with any earlier write;
          // the trailing -bN bucket suffix (if any) stays at the end, so
          // bucket routing/pruning keep working on the rewritten files
          val dest = new Path(rootP, s"r$opId-${p.getName}")
          if (!fs.rename(p, dest))
            throw new java.io.IOException(s"replace rename failed: $p -> $dest")
        }
      fs.delete(tmpP, true)
    }
    replacedFiles.forEach(f => fs.delete(new Path(f), false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val tmpP = new Path(tmp)
    tmpP.getFileSystem(conf).delete(tmpP, true)
  }
}
