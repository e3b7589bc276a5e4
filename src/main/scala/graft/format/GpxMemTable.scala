package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable.ArrayBuffer

/** The CDC serve path: a JVM-local, bounded, write-through MemTable per
  * table — the analog of the reference's retina MemTable
  * (pixels-retina/.../MemTable.java:31-75), which serves freshly-ingested
  * rows from memory while a background flush persists them to columnar
  * files. Micro-batch streaming bounds read-after-write freshness at the
  * trigger interval (~0.5 s); this path bounds it at the ingest() call
  * itself: a row is queryable the moment ingest returns.
  *
  * Exactly-once across the flush boundary without watermark bookkeeping:
  * the table must be on the commit-log protocol, and BOTH of these run
  * under one lock —
  *   - flush: write the buffered rows to a gpx file (invisible until a
  *     manifest names it), commit the manifest Append at version W, then
  *     drop the buffered rows;
  *   - capture (scan planning): snapshot the buffered rows AND resolve
  *     the manifest head version V.
  * A flush completing before a capture has W <= V and its rows are
  * already out of the buffer; a flush after the capture commits at
  * W > V, and the scan reads files PINNED at V — so every row is served
  * exactly once from either the pinned files or the captured tail,
  * never both, never neither. Rename-protocol tables have no version to
  * pin and are refused.
  *
  * Bounded: ingest flushes synchronously once the buffer passes maxRows.
  * Served rows are always-visible (commitTs -1); snapshot-pinned reads
  * (snapshotTs/atVersion) deliberately serve committed state only. */
object GpxMemTable {

  final class Table(val dir: String, val schema: StructType) {
    private[GpxMemTable] val rows = new ArrayBuffer[InternalRow]()
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Table]()

  // buffered() runs on every scan build: memoize the qualified-root key
  // so the hot planning path pays a map hit, not a Configuration +
  // FileSystem resolution per query
  private val keyCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def key(dir: String): String =
    keyCache.computeIfAbsent(dir,
      d => GpxTable.qualifiedRoot(d, new Configuration()))

  /** rows buffered for a dir right now (0 = no active memtable) */
  def buffered(dir: String): Int = {
    val t = registry.get(key(dir))
    if (t == null) 0 else t.synchronized(t.rows.length)
  }

  /** the serve schema bound by the first ingest, if a memtable is active —
    * schema inference consults this when a freshly-enabled table has no
    * committed schema and no files yet but DOES have queryable tail rows */
  def boundSchema(dir: String): Option[StructType] =
    Option(registry.get(key(dir))).map(_.schema)

  /** Ingest rows: queryable the moment this returns. First ingest binds
    * the serve schema and requires (enables) the commit-log protocol.
    * Synchronously flushes when the buffer passes maxRows.
    *
    * Registration discipline: enable() runs OUTSIDE the registry map
    * update — its seeding Overwrite commit calls [[clear]] on this same
    * key, and a registry.remove inside a computeIfAbsent mapping function
    * is a recursive ConcurrentHashMap update (IllegalStateException on
    * first ingest of a fresh table). The append then re-checks
    * registration INSIDE the table lock: [[clear]] also takes the table
    * lock before removing, so a table observed registered under its own
    * lock cannot be orphaned mid-append — without the check, a concurrent
    * INSERT OVERWRITE's clear() could strand the batch in an unreachable
    * buffer (ingest returns success, rows neither queryable nor ever
    * flushed). */
  def ingest(dir: String, schema: StructType,
      batch: Seq[org.apache.spark.sql.Row], conf: Configuration,
      maxRows: Int = 100000): Unit = {
    require(batch.nonEmpty, "empty ingest batch")
    val k = key(dir)
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val converted = batch.map(r => conv(r).asInstanceOf[InternalRow])
    var attempts = 100
    while (attempts > 0) {
      attempts -= 1
      var t = registry.get(k)
      if (t == null) {
        GpxCommitLog.enable(dir, conf) // serve path requires the version pin
        val fresh = new Table(dir, schema)
        val raced = registry.putIfAbsent(k, fresh)
        t = if (raced == null) fresh else raced
      }
      require(t.schema == schema,
        s"memtable schema mismatch for $dir: bound ${t.schema.toDDL}, " +
          s"got ${schema.toDDL}")
      val appended = t.synchronized {
        if (registry.get(k) ne t) false // cleared underneath: retry
        else {
          t.rows ++= converted
          if (t.rows.length >= maxRows) flushLocked(t, conf)
          true
        }
      }
      if (appended) return
    }
    throw new IllegalStateException(
      s"gpx memtable ingest for $dir could not register a live buffer " +
        "after 100 attempts (continuous concurrent clears)")
  }

  /** Persist the buffer as one gpx file + manifest commit; returns rows
    * flushed. Readers pinned at pre-flush versions are unaffected. */
  def flush(dir: String, conf: Configuration): Int = {
    val k = key(dir)
    val t = registry.get(k)
    if (t == null) 0
    else t.synchronized {
      // an orphaned buffer (concurrent clear) must not flush: its rows
      // were part of replaced table contents — committing them would
      // resurrect overwritten data
      if (registry.get(k) ne t) 0 else flushLocked(t, conf)
    }
  }

  private def flushLocked(t: Table, conf: Configuration): Int = {
    if (t.rows.isEmpty) return 0
    val file =
      s"${t.dir}/part-mem-${java.util.UUID.randomUUID().toString.take(12)}.gpx"
    // flushed files carry a REAL commit timestamp: the buffer itself is
    // always-visible by contract (CURRENT reads only), but once persisted
    // the rows are committed state — stamping -1 would make them visible
    // at every historical snapshot, including ones taken before the ingest
    val ts = GpxTxn.stamp(t.dir, conf)
    val w = new GpxFileWriter(file, t.schema, conf,
      GpxFormat.DefaultRowGroupRows, GpxFormat.DefaultPixelRows, ts)
    try {
      t.rows.foreach(w.addRow)
      w.close()
    } catch { case e: Throwable => w.abort(); throw e }
    val entry = GpxCommitLog.entryFor(t.dir, file, conf)
    GpxCommitLog.commit(t.dir, conf,
      GpxCommitLog.Append(Seq(entry), schema = Some(t.schema)))
    val n = t.rows.length
    t.rows.clear()
    GpxVersion.bump(t.dir, conf)
    n
  }

  /** Planning-time capture for a CURRENT read: the buffered rows
    * projected+serialized to the scan's required schema, plus the
    * manifest head version the file side must pin. None = no active
    * tail (scan takes its normal path). Synthetic columns serve their
    * no-file defaults (_commit_ts -1, _file/_pos null). */
  def capture(dir: String, required: StructType,
      conf: Configuration): Option[(Array[Array[Byte]], Long)] = {
    val t = registry.get(key(dir))
    if (t == null) return None
    t.synchronized {
      if (t.rows.isEmpty) return None
      val v = GpxCommitLog.head(t.dir, conf).map(_.version).getOrElse {
        return None // log vanished underneath: serve committed state only
      }
      val srcIdx: Array[Int] = required.fields.map { f =>
        if (GpxTable.isSynthetic(f.name)) -1
        else t.schema.fieldNames.indexOf(f.name)
      }
      val srcType = srcIdx.map(i =>
        if (i >= 0) t.schema.fields(i).dataType else null)
      // the REQUIRED type can be wider than the memtable's bound type
      // (a concurrent batch append widened the manifest schema): project
      // through an explicit Cast per mismatched column, or the unsafe
      // projection would getLong an Integer and crash the scan
      val exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
        required.fields.zipWithIndex.map { case (f, i) =>
          import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast}
          if (srcIdx(i) >= 0) {
            val br = BoundReference(i, srcType(i), nullable = true)
            if (srcType(i) == f.dataType) br
            else Cast(br, f.dataType, Some("UTC"))
          } else BoundReference(i, f.dataType, nullable = true)
        }.toSeq
      val proj = UnsafeProjection.create(exprs)
      val out = t.rows.iterator.map { row =>
        val vals = new Array[Any](required.length)
        var i = 0
        while (i < srcIdx.length) {
          vals(i) =
            if (srcIdx(i) >= 0) row.get(srcIdx(i), srcType(i))
            else if (required.fields(i).name == GpxTable.CommitTsCol) -1L
            else null
          i += 1
        }
        proj(new GenericInternalRow(vals)).copy().getBytes
      }.toArray
      Some((out, v))
    }
  }

  /** Drop a table's buffer and registration (table drop/rename, INSERT
    * OVERWRITE). Takes the table lock before removing so ingest's
    * registered-check under the same lock is race-free: once a thread has
    * observed its table registered inside the lock, this clear blocks
    * until that append completes. */
  def clear(dir: String): Unit = {
    val k = key(dir)
    val t = registry.get(k)
    if (t != null) t.synchronized { registry.remove(k, t) }
  }
}
