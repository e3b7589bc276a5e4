package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}

/** Merge-on-read DELETE bitmaps — the reference's per-row-group visibility
  * mechanism (pixels-retina RGVisibility.java:34-60, proto/retina.proto:
  * 84-108: deletes are bitmap METADATA replayed at read, not file
  * rewrites) re-expressed as per-data-file sidecars:
  *
  *   <parent>/_del/<dataFileName>.t<commitTs>.<uuid>.del
  *
  * Content: GPXD | version | commitTs | fileRows | bitset over the data
  * file's ABSOLUTE row positions (0-based, counting every row of every
  * row group in footer order). A sidecar is immutable once published
  * (write = temp + rename), so bitmaps cache by path with no validation.
  *
  * Visibility mirrors row-group MVCC: a sidecar applies at `snapshotTs`
  * iff its commitTs < 0 (path-based writes — always applied, matching the
  * copy-on-write stance that deletes compact history) or commitTs <=
  * snapshotTs. A catalog DELETE stamps a fresh ts, so FOR TIMESTAMP AS OF
  * a pre-delete time still sees the deleted rows — the reference's replay
  * semantics, which copy-on-write cannot offer.
  *
  * Scale shape: a point-delete in a 1 GB file writes a few-KB sidecar
  * instead of rewriting the file; the scan unions the visible bitmaps
  * per file (driver-cached) and masks rows at read. Compaction and any
  * copy-on-write rewrite FOLD the bitmaps into the copy and drop the
  * sidecars. Multiple sidecars per file (repeated deletes) union; a
  * retried delete task publishing the same positions twice is idempotent
  * for the same reason.
  */
object GpxDeleteBitmap {

  val DelDir = "_del"
  private val DelMagic = "GPXD".getBytes("UTF-8")
  private val Version = 1

  /** deleted-fraction above which `deleteMode=auto` prefers copy-on-write
    * (a mostly-deleted file should be rewritten, not masked) */
  val DefaultMorThreshold = 0.2

  /** `createTs` is the sidecar's wall-clock creation time (ms), parsed
    * from the optional `.c<ms>` name segment: purely informational —
    * visibility is ALWAYS governed by commitTs — it exists so the
    * change feed (gpx-tail withDeletes) can window deletes on path
    * tables too, whose commitTs is -1 (mask-unconditionally). Old-format
    * names parse with createTs = -1 (predate the feed, never windowed). */
  final case class Sidecar(path: String, dataFileName: String,
      commitTs: Long, createTs: Long = -1L)

  /** leading [^.] excludes dot-prefixed temp/scratch names even if one
    * ever ends in `.del` (data file names never start with '.') */
  private val NameRe =
    """^([^.].*\.gpx)\.t(-?\d+)(?:\.c(\d+))?\.[0-9a-f]+\.del$""".r

  def sidecarName(dataFileName: String, ts: Long): String =
    s"$dataFileName.t$ts.c${System.currentTimeMillis()}." +
      s"${java.util.UUID.randomUUID().toString.take(8)}.del"

  /** sidecars under `parent`/_del grouped by data file name; ts parsed
    * from the NAME so planning never opens sidecar bytes for invisible
    * commits */
  def sidecarsIn(parent: Path, conf: Configuration): Map[String, Seq[Sidecar]] = {
    val delP = new Path(parent, DelDir)
    val fs = delP.getFileSystem(conf)
    if (!fs.exists(delP)) Map.empty
    else fs.listStatus(delP).toSeq.flatMap { st =>
      st.getPath.getName match {
        case NameRe(data, ts, c) =>
          Some(Sidecar(st.getPath.toString, data, ts.toLong,
            if (c == null) -1L else c.toLong))
        case _ => None // temp files of in-flight writes
      }
    }.groupBy(_.dataFileName)
  }

  /** does a sidecar apply at this snapshot? (mirrors GpxScan.visibleAt) */
  def applies(s: Sidecar, snapshotTs: Option[Long]): Boolean =
    s.commitTs < 0 || snapshotTs.forall(s.commitTs <= _)

  /** true when ANY data file under `roots` MAY have a delete sidecar —
    * pushed aggregates (footer-stats COUNT/MIN/MAX) and limit truncation
    * must then stay off: footer numbers include masked rows. Version-
    * tracked tables answer from the [[GpxVersion]] delete marker (two
    * tiny existence checks, O(1) at any file count); untracked tables
    * take one recursive walk per root. This runs at pushdown time on
    * every scan build, so the steady state must not pay O(files). */
  def anyDeletes(roots: Seq[String], conf: Configuration): Boolean =
    roots.exists { r =>
      GpxVersion.hasDeletes(r, conf) match {
        case Some(b) => b
        case None => walkForSidecars(r, conf)
      }
    }

  /** the exact (O(files) walk) form — seed/recompute paths and untracked
    * tables only */
  def walkForSidecars(r: String, conf: Configuration): Boolean =
    GpxFs.stat(r, conf) match {
      case Some(st) if st.isFile =>
        // a FILE root (explicit-file reads, e.g. the delete's own
        // jobs) keeps its sidecars in the SIBLING _del dir — a walk
        // of the file itself would miss them
        val p = new Path(r)
        sidecarsIn(p.getParent, conf).contains(p.getName)
      case _ =>
        GpxFs.listRecursive(r, conf).exists { case (full, isFile) =>
          isFile && full.endsWith(".del") && {
            val segs = full.split('/')
            segs.length >= 2 && segs(segs.length - 2) == DelDir &&
              !segs.last.startsWith(".")
          }
        }
    }

  // ---------------- bitmap IO ----------------

  /** immutable-by-name cache: a sidecar is never rewritten after its
    * publish rename, so entries need no (len, mtime) validation */
  private val bitmapCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, java.util.BitSet](256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.BitSet]): Boolean =
        size() > 4096
    })

  def loadBitmap(path: String, conf: Configuration): java.util.BitSet = {
    val cached = bitmapCache.get(path)
    if (cached != null) return cached
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    val buf = try {
      val b = new Array[Byte](len.toInt); in.readFully(b); b
    } finally in.close()
    val d = new DataInputStream(new ByteArrayInputStream(buf))
    val magic = new Array[Byte](4); d.readFully(magic)
    require(java.util.Arrays.equals(magic, DelMagic), s"not a gpx delete sidecar: $path")
    require(d.readInt() == Version, s"unknown delete sidecar version: $path")
    d.readLong() // commitTs (authoritative copy of the name's ts)
    d.readLong() // fileRows at write time (diagnostic)
    val n = d.readInt()
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = d.readLong(); i += 1 }
    val bs = java.util.BitSet.valueOf(words)
    bitmapCache.put(path, bs)
    bs
  }

  /** union of the bitmaps applying to `dataFile` at `snapshotTs`, or null
    * when none apply (the common case — zero-cost in the scan) */
  def maskFor(dataFile: String, sidecars: Seq[Sidecar],
      snapshotTs: Option[Long], conf: Configuration): java.util.BitSet = {
    val applying = sidecars.filter(applies(_, snapshotTs))
    if (applying.isEmpty) return null
    val acc = new java.util.BitSet()
    applying.foreach(s => acc.or(loadBitmap(s.path, conf)))
    if (acc.isEmpty) null else acc
  }

  /** Write a sidecar for `dataFile` atomically (temp under _del + rename).
    * Safe from executors: retried attempts publish distinct uuid names
    * whose bitmaps union idempotently. The temp name carries NO `.del`
    * suffix, so neither [[sidecarsIn]]'s NameRe nor any `*.del` listing
    * (e.g. projection coverage) can ever observe an in-flight write.
    * Returns the sidecar path.
    *
    * PROTOCOL: the OPERATION publishing sidecars must hold the table's
    * [[GpxMutationLock]] (and mark deletes first — GpxDelete's order).
    * Compaction's swap rechecks input masks under that same lock; a
    * lockless writer can slip a sidecar into the recheck-to-commit
    * window and have it orphaned when the swap retires its file. */
  def write(dataFile: Path, ts: Long, positions: java.util.BitSet,
      fileRows: Long, conf: Configuration): String = {
    val delP = new Path(dataFile.getParent, DelDir)
    val fs = delP.getFileSystem(conf)
    fs.mkdirs(delP)
    val name = sidecarName(dataFile.getName, ts)
    val tmp = new Path(delP,
      s".tmp.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
    val out = new DataOutputStream(fs.create(tmp, true))
    try {
      try {
        out.write(DelMagic)
        out.writeInt(Version)
        out.writeLong(ts)
        out.writeLong(fileRows)
        val words = positions.toLongArray
        out.writeInt(words.length)
        words.foreach(out.writeLong)
      } finally out.close()
      val dest = new Path(delP, name)
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"delete sidecar publish failed: $dest")
      dest.toString
    } catch {
      case e: Throwable =>
        // a failed write/publish must not leak its temp file: no vacuum
        // path ever matches .tmp.*.inprogress names
        try fs.delete(tmp, false) catch { case _: Throwable => () }
        throw e
    }
  }

  /** drop every sidecar of `dataFile` (after a rewrite folded them) */
  def dropSidecars(dataFile: Path, conf: Configuration): Unit = {
    val delP = new Path(dataFile.getParent, DelDir)
    val fs = delP.getFileSystem(conf)
    if (fs.exists(delP)) fs.listStatus(delP).foreach { st =>
      st.getPath.getName match {
        case NameRe(data, _, _) if data == dataFile.getName =>
          fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  /** Fold the file's CURRENT mask into a physical copy: rewrite without
    * the masked rows (each row group keeps its original commitTs and
    * boundaries), publish under a fresh d<uuid>- name that keeps the
    * original name as a suffix (bucket routing survives), then drop the
    * original and its sidecars. No-op (None) when the file has no mask.
    * Driver-side streaming, one row group in memory at a time — the
    * compactor's pre-pass and the vacuum path share this. Time travel to
    * pre-delete snapshots no longer sees the folded rows (the documented
    * copy-on-write approximation, same as compaction). */
  def foldFile(file: String, conf: Configuration): Option[String] = {
    val p = new Path(file)
    val sidecars = sidecarsIn(p.getParent, conf).getOrElse(p.getName, Seq.empty)
    val mask = maskFor(file, sidecars, None, conf)
    if (mask == null && sidecars.isEmpty) return None
    val footer = GpxFileReader.FooterCache.get(file, conf)
    val fs = p.getFileSystem(conf)
    val dest = new Path(p.getParent,
      s"d${java.util.UUID.randomUUID().toString.take(8)}-${p.getName}")
    if (mask == null) {
      // sidecars exist but mask nothing (all-empty bitmaps): just drop them
      dropSidecars(p, conf)
      return None
    }
    // stage the rewrite under a dot-prefixed name (invisible to listFiles)
    // and rename into place only when complete — a concurrent scan must
    // never see a footer-less partial, and a crash mid-fold must not
    // leave a corrupt visible .gpx
    val tmpDest = new Path(p.getParent, s".fold-${dest.getName}")
    // mask-fold copies rows in file order, so the source's per-row-group
    // sort claim survives the rewrite
    val w = new GpxFileWriter(tmpDest.toString, footer.schema, conf,
      GpxFormat.DefaultRowGroupRows, GpxFormat.DefaultPixelRows, -1L,
      sortedBy = footer.sortedBy)
    var base = 0L
    var kept = 0L
    footer.rowGroups.foreach { rg =>
      w.commitTs = rg.commitTs
      val slices: Array[Array[GpxFileReader.PixelSlice]] =
        footer.schema.fields.indices.toArray.map { ci =>
          val ch = rg.chunks(ci)
          ch.pixels.indices.toArray.map(px => GpxFileReader.PixelSlice(
            ch.offset + ch.pixels(px).relOffset, ch.pixelLength(px),
            ch.pixels(px).rows))
        }
      val batch = GpxFileReader.readSlices(
        file, conf, footer.schema, slices, rg.numRows, rg.commitTs)
      val it = batch.rowIterator()
      var k = 0
      // bitmap positions are int-addressed: fail fast (with the remedy)
      // instead of wrapping negative past 2^31 rows
      require(base + rg.numRows - 1 <= Int.MaxValue,
        s"$file holds more than 2^31-1 rows — beyond the delete-bitmap " +
          "addressing limit; compact into smaller files before folding")
      while (it.hasNext) {
        val row = it.next()
        if (!mask.get((base + k).toInt)) { w.addRow(row); kept += 1 }
        k += 1
      }
      batch.close()
      w.flushRowGroup()
      base += rg.numRows
    }
    // crash-safe order: complete replacement renamed visible FIRST,
    // originals dropped after (a crash in between duplicates kept rows,
    // never loses them) — except the all-rows-masked case, where there
    // is no replacement
    if (kept > 0) {
      w.close()
      if (!fs.rename(tmpDest, dest))
        throw new java.io.IOException(s"fold publish failed: $tmpDest -> $dest")
    } else w.abort()
    fs.delete(p, false)
    dropSidecars(p, conf)
    Some(if (kept > 0) dest.toString else "")
  }
}
