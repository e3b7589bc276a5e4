package graft.format

import GpxFormat._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.StructType
import java.io.{ByteArrayOutputStream, DataOutputStream}

/** Native gpx compaction: concatenates the row groups of many small gpx
  * files into few large ones by COPYING the encoded chunk bytes verbatim
  * and rebuilding the footer with shifted offsets — no decode, no
  * re-encode, no Spark job (the reference's PixelsCompactor,
  * pixels-core/.../compactor/PixelsCompactor.java:52, does exactly this
  * over its physical layout).
  *
  * All stats, pixel zone maps, encodings and per-row-group commit
  * timestamps are preserved, so pruning and MVCC time travel over the
  * SURVIVING rows behave identically on the compacted layout. The one
  * documented approximation (shared with every copy-on-write fold,
  * GpxDeleteBitmap.foldFile): merge-on-read delete masks — including
  * ts-stamped ones whose deletes are younger than some live snapshots —
  * are folded INTO the copy, so time travel to a pre-delete timestamp no
  * longer resurrects the masked rows. Compact when that history can go.
  * Inputs must share one schema.
  */
object GpxCompactor {
  final case class Result(inputFiles: Int, outputFiles: Int, rows: Long)

  def compact(
      inDir: String,
      outDir: String,
      conf: Configuration,
      targetFileBytes: Long = 128L * 1024 * 1024): Result =
    // mask folding rewrites files in place — a destructive mutation,
    // serialized against concurrent DELETE/UPDATE/OVERWRITE on the table
    GpxMutationLock.withLock(inDir, conf, "compaction") {
      compactLocked(inDir, outDir, conf, targetFileBytes)
    }

  private def compactLocked(
      inDir: String,
      outDir: String,
      conf: Configuration,
      targetFileBytes: Long): Result = {
    // EVERY refusal check runs before the mask-fold pre-pass: the fold is
    // destructive (it collapses MVCC pre-delete visibility into the
    // files), so a compaction that is going to be refused must be refused
    // side-effect-free — not after the source table's history is gone
    require(GpxTable.listFiles(Seq(inDir), conf).nonEmpty,
      s"no gpx files under $inDir")
    val outPath = new Path(outDir)
    val fs = outPath.getFileSystem(conf)
    fs.mkdirs(outPath)
    // outputs are named compact-NNNNN by index: leftovers from an earlier
    // (larger) compaction into the same dir would survive past this run's
    // highest index and be listed as table data — refuse, don't resurrect
    val leftovers = GpxTable.listFiles(Seq(outDir), conf)
    require(leftovers.isEmpty,
      s"compaction output dir $outDir already holds ${leftovers.size} gpx " +
        "file(s) — compact into an empty directory")
    // merge-on-read masks first: byte-copying a masked file would
    // resurrect its deleted rows, so fold each MASKED file's bitmaps into
    // a physical copy (row groups keep their commitTs), then byte-copy.
    // One _del listing per parent dir; mask-free files — the steady
    // state — take the zero-decode path untouched.
    GpxTable.listFiles(Seq(inDir), conf)
      .groupBy(f => new Path(f).getParent)
      .foreach { case (parent, files) =>
        val withSidecars = GpxDeleteBitmap.sidecarsIn(parent, conf).keySet
        files.filter(f => withSidecars.contains(new Path(f).getName))
          .foreach(f => GpxDeleteBitmap.foldFile(f, conf))
      }
    // folds rewrote masked files in place: exact marker + fresh token
    // for the source table, still under this op's lock
    GpxVersion.recomputeDeletes(inDir, conf)
    val files = GpxTable.listFiles(Seq(inDir), conf).sorted
    // carry the rename-alias and dropped-column sidecars: byte-copied
    // footers keep their OLD physical column names, so without _renames a
    // scan of the compacted copy silently nulls every renamed column (and
    // without _dropped, a dropped column's still-present bytes resurface)
    Seq("_renames", "_dropped").foreach { side =>
      val src = new Path(inDir, side)
      val sfs = src.getFileSystem(conf)
      if (sfs.exists(src)) {
        val in = sfs.open(src)
        val bytes = try {
          val b = new ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, b, 8192, false)
          b.toByteArray
        } finally in.close()
        val o = fs.create(new Path(outPath, side), true)
        try o.write(bytes) finally o.close()
      }
    }
    // carry the bucket-layout sidecar so bucket pruning keeps working
    GpxTable.readBucketSpec(inDir, conf).foreach { b =>
      val o = fs.create(new Path(outPath, "_bucketspec"), true)
      try o.write(s"${b.column}\n${b.numBuckets}".getBytes("UTF-8"))
      finally o.close()
    }
    // carry the range-layout sidecar: compacted files lose their -rN name
    // tags (they are conservatively un-pruned-by-name; zone maps still
    // prune), but future INSERTs must keep routing by range
    GpxTable.readRangeSpec(inDir, conf).foreach { r =>
      val o = fs.create(new Path(outPath, "_rangespec"), true)
      try o.write(s"${r.column}\n${r.bounds.mkString(",")}".getBytes("UTF-8"))
      finally o.close()
    }
    // carry the sort-clustering sidecar: byte-copy compaction preserves
    // row order, so the ordered layout (and future INSERTs' sorting) holds
    val sortSpec = GpxTable.readSortSpec(inDir, conf)
    if (sortSpec.nonEmpty) {
      val o = fs.create(new Path(outPath, "_sortspec"), true)
      try o.write(sortSpec.mkString("\n").getBytes("UTF-8"))
      finally o.close()
    }

    // schema-evolved tables hold files with DIFFERENT column sets (an
    // old file without a later-added column null-fills at scan time):
    // byte-copy cannot merge those into one footer without synthesizing
    // chunks, so compact each same-shape group separately — the output
    // table reads identically (per-file footers drive the scan)
    val r = shapeGroups(files, conf).foldLeft(Result(0, 0, 0L)) {
      (acc, group) =>
        val base = acc.outputFiles
        val g = byteCopy(group, outPath,
          i => new Path(outPath, f"compact-${base + i}%05d.gpx"),
          conf, targetFileBytes)
        Result(acc.inputFiles + g.inputFiles,
          acc.outputFiles + g.outputFiles, acc.rows + g.rows)
    }
    GpxVersion.bump(outDir, conf) // fresh table contents under outDir
    r
  }

  /** compaction inputs partitioned by column shape (names + erased
    * types, order-sensitive — what one merged footer can describe),
    * deterministic order. Nullability differences stay WITHIN a group
    * (byteCopy widens them). */
  private def shapeGroups(files: Seq[String],
      conf: Configuration): Seq[Seq[String]] = {
    def erased(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        org.apache.spark.sql.types.ArrayType(erased(et), containsNull = true)
      case other => other
    }
    files.groupBy { f =>
      GpxFileReader.FooterCache.get(f, conf).schema.fields.toSeq
        .map(fl => (fl.name, erased(fl.dataType))).toString
    }.toSeq.sortBy(_._1).map(_._2)
  }

  /** The zero-decode core: concatenate the inputs' row groups into files
    * named by `namer`, preserving stats/encodings/commitTs and the common
    * sortedBy claim prefix. */
  private def byteCopy(files: Seq[String], outPath: Path,
      namer: Int => Path, conf: Configuration,
      targetFileBytes: Long): Result = {
    val fs = outPath.getFileSystem(conf)
    // output footer schema: inputs may legitimately differ in NULLABILITY
    // alone — top-level AND nested (a Spark batch write claims NOT NULL
    // for literal columns and containsNull=false for literal arrays,
    // where the row-level writer defaults both nullable — natural on any
    // log table seeded one way and appended the other). Pixel segments
    // self-describe their nulls (encoding | nullCount | bitmap | data),
    // so byte-copied chunks read identically under the widened schema;
    // names, types and order must still match exactly up to nullability
    // — a byte copy cannot reorder or cast. `erased` drops every
    // nullability bit for the shape compare; unionType re-merges the
    // bits (gpx stores scalars and arrays, so ArrayType containsNull is
    // the only nested bit).
    def erased(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        org.apache.spark.sql.types.ArrayType(erased(et), containsNull = true)
      case other => other
    }
    def shape(s: StructType): Seq[(String, org.apache.spark.sql.types.DataType)] =
      s.fields.toSeq.map(f => (f.name, erased(f.dataType)))
    def unionType(a: org.apache.spark.sql.types.DataType,
        b: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
      (a, b) match {
        case (org.apache.spark.sql.types.ArrayType(ae, an),
              org.apache.spark.sql.types.ArrayType(be, bn)) =>
          org.apache.spark.sql.types.ArrayType(unionType(ae, be), an || bn)
        case _ => a // scalars: shape equality already proved a == b
      }
    val schema = files.map(f => GpxFileReader.FooterCache.get(f, conf).schema)
      .reduce { (a, b) =>
        require(shape(a) == shape(b),
          s"schema mismatch across compaction inputs: ${a.toDDL} vs ${b.toDDL}")
        StructType(a.fields.zip(b.fields).map { case (x, y) =>
          x.copy(nullable = x.nullable || y.nullable,
            dataType = unionType(x.dataType, y.dataType)) })
      }
    // per-file sortedBy claim for the compacted outputs: row groups are
    // byte-copied, so each keeps its internal order — the merged file's
    // claim is the longest prefix every INPUT file can vouch for
    val sortedBy: Seq[String] = files
      .map(f => GpxFileReader.FooterCache.get(f, conf).sortedBy)
      .reduceOption((a, b) => a.zip(b).takeWhile { case (x, y) => x == y }
        .map(_._1))
      .getOrElse(Nil)
    // element-null-free claims survive a byte copy iff EVERY input file
    // can vouch for the column (set intersection, order-independent)
    val noNullElemCols: Seq[String] = files
      .map(f => GpxFileReader.FooterCache.get(f, conf).noNullElemCols.toSet)
      .reduceOption(_ intersect _).getOrElse(Set.empty[String]).toSeq.sorted
    var outIndex = 0
    var out: java.io.DataOutputStream = null
    var pos = 0L
    var rgs = List.newBuilder[RowGroupMeta]
    var outFiles = 0
    var totalRows = 0L

    def openOut(): Unit = {
      out = new DataOutputStream(new java.io.BufferedOutputStream(
        fs.create(namer(outIndex), true), 1 << 20))
      out.write(Magic); pos = Magic.length.toLong
      rgs = List.newBuilder[RowGroupMeta]
      outFiles += 1
    }
    def closeOut(): Unit = {
      if (out == null) return
      val fBytes = new ByteArrayOutputStream(8192)
      val fd = new DataOutputStream(fBytes)
      GpxFormat.writeFooter(fd,
        Footer(schema, rgs.result().toArray, sortedBy, noNullElemCols))
      fd.flush()
      val arr = fBytes.toByteArray
      out.write(arr)
      out.write(GpxFormat.trailerBytes(arr))
      out.close()
      out = null
      outIndex += 1
    }

    openOut()
    val buf = new Array[Byte](8 << 20)
    files.foreach { f =>
      // shape equality across inputs was already established by the
      // schema reduce above (same FooterCache entries) — no re-check
      val footer = GpxFileReader.FooterCache.get(f, conf)
      val inPath = new Path(f)
      val in = inPath.getFileSystem(conf).open(inPath)
      try {
        footer.rowGroups.foreach { rg =>
          if (pos > Magic.length && pos >= targetFileBytes) { closeOut(); openOut() }
          // a row group's chunks are written contiguously; stream-copy the
          // span in bounded buffers (a wide-binary row group can exceed
          // 2 GiB — no single array may hold it)
          val start = rg.chunks.map(_.offset).min
          val end = rg.chunks.map(c => c.offset + c.length).max
          val span = end - start
          val shift = pos - start
          in.seek(start)
          var left = span
          while (left > 0) {
            val n2 = math.min(left, buf.length.toLong).toInt
            in.readFully(buf, 0, n2)
            out.write(buf, 0, n2)
            left -= n2
          }
          pos += span
          rgs += RowGroupMeta(rg.numRows,
            rg.chunks.map(c => c.copy(offset = c.offset + shift)),
            rg.commitTs)
          totalRows += rg.numRows
        }
      } finally in.close()
    }
    closeOut()
    Result(files.length, outFiles, totalRows)
  }

  /** IN-PLACE compaction of a commit-log table — the object-store
    * small-files answer: the head's live files byte-copy into few large
    * files written directly under the table dir (invisible: log tables
    * are manifest-gated), and ONE Replace commit swaps them in.
    * Superseded files retire for vacuum; a concurrent mutation that
    * rewrote any input makes the commit refuse loudly instead of
    * resurrecting its rows. No rename, no trash dir, no listing
    * dependency — the protocol the rename-based compact-to-a-new-dir
    * path cannot offer on an object store. */
  /** `beforeSwap` is a test seam: it runs after the byte copy staged its
    * outputs and before the locked swap — the window a concurrent
    * merge-on-read delete can land in (microseconds on toy tables,
    * minutes on real ones), which probabilistic fuzz cannot hit
    * deterministically. */
  def compactInPlace(
      dir: String,
      conf: Configuration,
      targetFileBytes: Long = 128L * 1024 * 1024,
      beforeSwap: () => Unit = () => ()): Result = {
    require(GpxCommitLog.isLogTable(dir, conf),
      s"compactInPlace requires a commit-log table (Cli LOG $dir); " +
        "rename-protocol tables compact into a new directory")
    val allLive = GpxCommitLog.liveFiles(dir, conf).sorted
    require(allLive.nonEmpty, s"no live gpx files in the manifest of $dir")
    // merge-on-read masks: a table enabled() onto the log protocol can
    // still carry pre-conversion _del sidecars, and byte-copying a masked
    // file would resurrect its deleted rows under a compact-<opId> name no
    // sidecar is keyed to. Unlike compact(), folding here would mutate
    // bytes a manifest entry already describes — so masked files are
    // SKIPPED: they stay live (and masked) in the manifest, only the
    // clean files compact. Fold or COW-delete them first to reclaim them.
    val maskedByParent = allLive.map(f => new Path(f).getParent).distinct
      .map(p => p -> GpxDeleteBitmap.sidecarsIn(p, conf).keySet).toMap
    val unmasked = allLive.filterNot { f =>
      val p = new Path(f)
      maskedByParent(p.getParent).contains(p.getName)
    }
    if (unmasked.isEmpty) return Result(0, 0, 0L)
    // schema evolution: files with different COLUMN SETS (a pre-ADD file
    // has no chunks for the later column) cannot share one merged footer
    // under byte-copy. Compact each same-shape group; with several
    // shapes, singleton groups stay live untouched — there is nothing to
    // merge them with, and the one Replace below swaps every compacted
    // group atomically. A single-shape table keeps the legacy behavior
    // (compacts even one file).
    val groups = shapeGroups(unmasked, conf)
    val files =
      if (groups.size <= 1) unmasked
      else groups.filter(_.size >= 2).flatten
    if (files.isEmpty) return Result(0, 0, 0L)
    val dirP = new Path(dir)
    val opId = java.util.UUID.randomUUID().toString.take(8)
    val outNames = scala.collection.mutable.ArrayBuffer.empty[Path]
    // EVERY failure from here on must remove the staged compact-* files:
    // they carry visible names but no manifest references them, so
    // nothing but a vacuum's minAge sweep would ever reclaim a leak —
    // and a mid-copy abort additionally leaves a footerless partial.
    def cleanupStaged(): Unit = outNames.foreach { p =>
      try { dirP.getFileSystem(conf).delete(p, false); () }
      catch { case _: Throwable => () }
    }
    val r =
      try {
        val copied = shapeGroups(files, conf)
          .foldLeft(Result(0, 0, 0L)) { (acc, group) =>
            val base = acc.outputFiles
            val g = byteCopy(group, dirP,
              i => { val p = new Path(dirP,
                f"compact-$opId-${base + i}%05d.gpx")
                outNames += p; p },
              conf, targetFileBytes)
            Result(acc.inputFiles + g.inputFiles,
              acc.outputFiles + g.outputFiles, acc.rows + g.rows)
          }
        beforeSwap()
        // SWAP under the mutation lock, with a mask recheck first. The
        // byte copy runs lock-free (it can take minutes and holds no
        // manifest state). Deletes that land while it runs are already
        // safe on the PRIMARY path: log tables route row-level deletes
        // to copy-on-write (sidecar publishes are listing-visible — what
        // the log exists to avoid), the rewrite RETIRES the inputs, and
        // the Replace below refuses consumed-no-longer-live sources
        // (MorDeleteSpec gates that interleave deterministically). The
        // recheck NARROWS the residual channel to its minimum: a sidecar
        // keyed to an input file's NAME appearing OUT-OF-BAND (a raw
        // GpxDeleteBitmap write that ignores the mutation lock) leaves
        // the input live, and swapping in the unmasked copies would
        // resurrect its masked rows silently. In-product sidecar writers
        // all hold the lock (or route to COW), so for them the recheck
        // is airtight; a lockless external writer can still land in the
        // recheck-to-commit window — the sidecar protocol requires the
        // lock for exactly this reason.
        GpxMutationLock.withLock(dir, conf, "compaction") {
          // one _del listing per distinct parent, not per file — this
          // runs while HOLDING the table's mutation lock
          val sidecarsByParent = files.map(f => new Path(f).getParent)
            .distinct.map(p => p -> GpxDeleteBitmap.sidecarsIn(p, conf))
            .toMap
          val regained = files.filter { f =>
            val p = new Path(f)
            sidecarsByParent(p.getParent).contains(p.getName)
          }
          if (regained.nonEmpty)
            throw new java.util.ConcurrentModificationException(
              s"gpx compactInPlace($dir): ${regained.size} input file(s) " +
                "gained delete sidecars while the byte copy ran — swapping " +
                "in the unmasked copies would resurrect their deleted rows. " +
                "Re-run the compaction (the fresh plan will skip them).")
          val entries = outNames.toSeq.map(p =>
            GpxCommitLog.entryFor(dir, p.toString, conf))
          GpxCommitLog.commit(dir, conf, GpxCommitLog.Replace(entries,
            files.map(GpxCommitLog.relOf(dir, _, conf)).toSet))
        }
        copied
      } catch {
        case t: Throwable => cleanupStaged(); throw t
      }
    GpxVersion.bump(dir, conf)
    r
  }

  /** RE-ENCODE compaction of a commit-log table — the convergence mode
    * byte-copy cannot offer on schema-EVOLVED tables: [[compactInPlace]]
    * merges only same-shape files, so a table with k historical column
    * shapes never compacts below k files. This mode reads the whole
    * table through the SCAN's union-schema semantics (null-fill for
    * pre-ADD files, rename aliases, dropped-column hiding, delete masks
    * applied) and writes ONE shape; the reference reaches that state
    * only by re-LOADing the table (its compactor assumes a single
    * schema, pixels-core/.../compactor/PixelsCompactor.java:52, and the
    * LOAD path re-encodes).
    *
    * Same atomicity as compactInPlace: outputs stage under an invisible
    * dot-dir (a crash's leftovers match the dot-temp vacuum sweep), get
    * published as unreferenced compact-* names, and ONE Replace commit
    * swaps them in under the mutation lock after a sidecar recheck — a
    * delete landing while the rewrite ran refuses loudly rather than
    * silently shipping files with stale folded masks. The scan pins the
    * starting head version, so the consumed set is exact, a buffered
    * memtable tail (served to CURRENT reads only) can never be baked
    * into files, and a concurrent APPEND simply survives the Replace
    * (its files are not consumed); a COW rewrite of a consumed input
    * makes the commit refuse (consumed-no-longer-live).
    *
    * Trades vs byte-copy — use [[compactInPlace]] when shapes allow:
    * decode+re-encode cost, and per-row-group commitTs history collapses
    * into always-visible rows (the same documented approximation as
    * mask folding; version-pinned time travel through RETAINED manifests
    * is unaffected). Layout sidecars (sort/bucket/range) are re-applied
    * as write options so routing and pruning survive the rewrite. */
  def compactRewrite(spark: org.apache.spark.sql.SparkSession,
      dir: String,
      conf: Configuration,
      targetFileBytes: Long = 128L * 1024 * 1024,
      beforeSwap: () => Unit = () => ()): Result = {
    require(GpxCommitLog.isLogTable(dir, conf),
      s"compactRewrite requires a commit-log table (Cli LOG $dir)")
    val h = GpxCommitLog.head(dir, conf).getOrElse(
      throw new IllegalStateException(s"no manifest head under $dir"))
    if (h.live.isEmpty) return Result(0, 0, 0L)
    val dirP = new Path(dir)
    val fs = dirP.getFileSystem(conf)
    val qd = fs.makeQualified(dirP).toString
    val consumedAbs = h.live.map(e => s"$qd/${e.relPath}").sorted
    // the masks the scan will fold into the rewrite, fingerprinted by
    // sidecar identity (names are uuid-unique): re-verified unchanged
    // under the lock before the swap
    def sidecarFp(): Map[String, Seq[String]] = {
      val byParent = consumedAbs.map(f => new Path(f).getParent).distinct
        .map(p => p -> GpxDeleteBitmap.sidecarsIn(p, conf)).toMap
      consumedAbs.map { f =>
        val p = new Path(f)
        f -> byParent(p.getParent).getOrElse(p.getName, Seq.empty)
          .map(_.path).sorted
      }.toMap
    }
    val sidecarsBefore = sidecarFp()
    val df = spark.read.format("gpx")
      .option("atVersion", h.version.toString).load(dir)
    val sortSpec = GpxTable.readSortSpec(dir, conf)
    val bucket = GpxTable.readBucketSpec(dir, conf)
    val range = GpxTable.readRangeSpec(dir, conf)
    // size the output by input bytes (an upper bound — re-encoding the
    // union shape can only null-fill, not grow). coalesce, NOT
    // repartition: a compaction must never shuffle the table; each
    // output task concatenates scan splits. Bucketed tables skip the
    // coalesce — the writer's own per-bucket routing names the files.
    val totalBytes = consumedAbs.map(f =>
      GpxFs.stat(f, conf).map(_.len).getOrElse(0L)).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val shaped = if (bucket.isEmpty) df.coalesce(nOut) else df
    val opId = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(dirP, s".rewrite-$opId")
    val outNames = scala.collection.mutable.ArrayBuffer.empty[Path]
    // once the Replace manifest is committed, the compact-* files are
    // manifest-referenced LIVE data: the catch-all cleanup must never
    // delete them (a post-commit exception would otherwise turn into
    // dangling manifest references = data loss). Today the post-commit
    // tail swallows its own errors, but this flag closes the window
    // structurally rather than incidentally.
    var committed = false
    def cleanup(): Unit = {
      try { fs.delete(stage, true); () } catch { case _: Throwable => () }
      if (!committed) outNames.foreach(p =>
        try { fs.delete(p, false); () } catch { case _: Throwable => () })
    }
    try {
      var w = shaped.write.format("gpx").mode("overwrite")
      if (sortSpec.nonEmpty) w = w.option("sortBy", sortSpec.mkString(","))
      bucket.foreach { b =>
        w = w.option("bucketBy", b.column)
          .option("numBuckets", b.numBuckets.toString)
      }
      range.foreach { r =>
        w = w.option("rangeBy", r.column)
          .option("rangeBounds", r.bounds.mkString(","))
      }
      w.save(stage.toString)
      // publish into the table dir under compact-* names — visible to a
      // listing but unreferenced by any manifest, so invisible to reads
      // until the commit (every failure path deletes them). The staged
      // file's bucket/range routing tag (-bN/-rN) is PRESERVED in the
      // published name: bucket pruning and storage-partitioned-join
      // planning key on the name suffix (GpxTable.bucketOfFile), so
      // dropping it would silently degrade every pruned scan to a full
      // scan — the exact layout the rewrite re-applied via write options.
      val tagRe = "(-[br]\\d+)\\.gpx$".r
      val staged = GpxTable.listFiles(Seq(stage.toString), conf).sorted
      var rows = 0L
      staged.zipWithIndex.foreach { case (f, i) =>
        rows += GpxFileReader.FooterCache.get(f, conf)
          .rowGroups.map(_.numRows.toLong).sum
        val tag = tagRe.findFirstMatchIn(
          f.substring(f.lastIndexOf('/') + 1)).map(_.group(1)).getOrElse("")
        val to = new Path(dirP, f"compact-$opId-$i%05d$tag.gpx")
        if (!fs.rename(new Path(f), to))
          throw new java.io.IOException(s"rewrite publish failed: $f -> $to")
        outNames += to
      }
      beforeSwap()
      GpxMutationLock.withLock(dir, conf, "compaction") {
        if (sidecarFp() != sidecarsBefore)
          throw new java.util.ConcurrentModificationException(
            s"gpx compactRewrite($dir): delete sidecars changed while the " +
              "rewrite ran — the folded masks are stale and swapping the " +
              "outputs in would resurrect deleted rows. Re-run the " +
              "compaction.")
        val entries = outNames.toSeq.map(p =>
          GpxCommitLog.entryFor(dir, p.toString, conf))
        GpxCommitLog.commit(dir, conf, GpxCommitLog.Replace(entries,
          h.live.map(_.relPath).toSet))
      }
      committed = true
      try { fs.delete(stage, true); () } catch { case _: Throwable => () }
      GpxVersion.bump(dir, conf)
      Result(consumedAbs.size, outNames.size, rows)
    } catch { case t: Throwable => cleanup(); throw t }
  }
}
