package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Table maintenance: sweep crash leftovers.
  *
  * Every gpx write path stages under an underscore-hidden scratch dir and
  * publishes by driver-side rename (batch `_batch_<opId>`, row-level
  * replace `_replace_<opId>`, delete `_delete_tmp_*`, streaming sink
  * `_streaming`). A driver crash between staging and commit leaves the
  * scratch dir behind — invisible to readers (listFiles skips underscore
  * segments) but occupying storage forever. vacuum() deletes scratch dirs
  * whose newest file is older than a TTL; the TTL guards against sweeping
  * a LIVE concurrent writer's staging (pick it well above the longest
  * expected write). Reference analog: metadata-service garbage collection
  * of orphaned physical files.
  *
  * Not swept: visible data files. The crash window of the delete/replace
  * SWAP phase (replacement renamed in, superseded file not yet deleted)
  * leaves duplicate-visible rows by design ("duplicates, never missing");
  * resolving those requires knowing which file superseded which — the
  * d<uuid>-/r<opId>- name prefixes make the candidates auditable, and the
  * operation can simply be re-run.
  */
object GpxMaintenance {

  private val ScratchPrefixes =
    Seq("_batch_", "_replace_", "_delta_", "_delete_tmp_", "_streaming")

  /** Delete orphaned scratch dirs under `table` older than `ttlMs`.
    * Returns the swept paths. Driver-side only — one listing of the table
    * root plus one per nested dir level, no data reads. */
  def vacuum(table: String, ttlMs: Long, conf: Configuration = new Configuration())
      : Seq[String] = {
    val now = System.currentTimeMillis()
    val root = new Path(table)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    // a live writer's commit can delete its staging dir between our
    // listStatus and this stat walk: a vanished path reads as "just
    // modified" (never swept this run) instead of crashing the vacuum
    def newestMtime(p: Path): Long =
      try {
        val st = fs.getFileStatus(p)
        if (!st.isDirectory) st.getModificationTime
        else (st.getModificationTime +:
          fs.listStatus(p).map(s => newestMtime(s.getPath)).toSeq).max
      } catch { case _: java.io.FileNotFoundException => now }
    // scan the root AND first-level subdirs (nested per-day layouts keep
    // their scratch next to the files being written), PLUS the two
    // artifact stores that are themselves gpx save targets — a crashed
    // projection/index build leaves its _batch_<opId> staging under
    // _proj/<name>/ or _index/<cols>/, which the underscore skip below
    // would otherwise shelter forever
    val artifactDirs = Seq("_proj", "_index").map(new Path(root, _))
      .filter(p => try fs.exists(p) catch { case _: Throwable => false })
      .flatMap(p => try fs.listStatus(p).toSeq.filter(_.isDirectory)
        catch { case _: Throwable => Seq.empty })
    val candidates = (fs.listStatus(root) ++ artifactDirs.flatMap(st =>
      try fs.listStatus(st.getPath).toSeq
      catch { case _: Throwable => Seq.empty })).flatMap { st =>
      if (st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        st +: fs.listStatus(st.getPath)
      else Array(st)
    }.filter(st => st.isDirectory &&
      ScratchPrefixes.exists(st.getPath.getName.startsWith))
    val sweptDirs =
      candidates.filter(st => now - newestMtime(st.getPath) > ttlMs).map { st =>
        fs.delete(st.getPath, true)
        st.getPath.toString
      }.toSeq
    // crashed delete-sidecar writers leave ".tmp.*" files inside _del
    // dirs (publish = rename, so a temp past the TTL is always dead)
    val delDirs = fs.listStatus(root).flatMap { st =>
      if (st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        Array(new Path(st.getPath, GpxDeleteBitmap.DelDir))
      else Array.empty[Path]
    } :+ new Path(root, GpxDeleteBitmap.DelDir)
    val sweptTmps = delDirs.filter(fs.exists(_)).flatMap { d =>
      fs.listStatus(d).filter { st =>
        st.getPath.getName.startsWith(".tmp.") &&
          now - st.getModificationTime > ttlMs
      }.map { st => fs.delete(st.getPath, false); st.getPath.toString }
    }.toSeq
    // crashed sidecar-token publishes leave root-level dot-temps
    // (._colstats.<uuid>, ._version.<uuid>, ._vdata.<uuid>, ._txn.<uuid>):
    // published names never carry a second dot-uuid suffix, so a dot-file
    // with one past the TTL is always dead
    val dotTempRe = """^\._[A-Za-z]+\.[0-9a-f]{8}.*$""".r
    val sweptDots = fs.listStatus(root).filter { st =>
      !st.isDirectory && dotTempRe.matches(st.getPath.getName) &&
        now - st.getModificationTime > ttlMs
    }.map { st => fs.delete(st.getPath, false); st.getPath.toString }.toSeq
    sweptDirs ++ sweptTmps ++ sweptDots
  }

  /** IMPORT-command analog (reference pixels-cli IMPORT,
    * pixels-cli/.../cli/Main.java:139,336: ETL-import pre-existing files
    * into a table with metadata registration): register already-written
    * gpx files — a vacuumed job's output, a cross-cluster copy — into a
    * table root WITHOUT re-reading their rows through Spark.
    *
    * Validation first, mutation second: every source footer must parse
    * (proves magic/footer integrity) and the by-name schema union across
    * the sources AND the table's current schema must succeed — the same
    * tolerant-evolution rule the read path applies, so an importable file
    * is by construction a readable one. Files are copied in under fresh
    * names via a dot-hidden temp + rename (readers see each file
    * all-or-nothing; a crashed temp matches vacuum()'s dot-temp sweep).
    * Publish: commit-log tables get ONE manifest Append (all-or-nothing
    * import, O(commit) like any write); plain tables become visible
    * per-file at the rename and get a version-token bump so token-stamped
    * sidecars (colstats, point indexes) drop out instead of serving stale.
    *
    * Returns (files imported, total rows). */
  def importFiles(table: String, sources: Seq[String],
      conf: Configuration = new Configuration()): (Int, Long) = {
    require(sources.nonEmpty, "IMPORT needs at least one source file")
    val rootP = new Path(table)
    val fs = rootP.getFileSystem(conf)
    // delete SIDECARS do not travel with the data files they mask:
    // adopting a masked file without its bitmap would resurrect its
    // deleted rows silently. Sidecars live in the sibling _del dir, so
    // one listing per DISTINCT parent covers every IMPORT entry point
    // (dir listing, comma list, API call) without re-listing the same
    // _del path once per file.
    val sidecarsByParent = sources.map(s => new Path(s).getParent)
      .distinct.map(p => p -> GpxDeleteBitmap.sidecarsIn(p, conf)).toMap
    val footers = sources.map { src =>
      require(GpxFs.stat(src, conf).isDefined, s"no such file: $src")
      val p = new Path(src)
      require(!sidecarsByParent(p.getParent).contains(p.getName),
        s"IMPORT refused: $src is masked by delete sidecars that do not " +
          "travel with the file — importing would resurrect deleted rows. " +
          "COMPACT the source first.")
      src -> GpxFileReader.readFooter(src, conf)
    }
    val importSchema = footers.map(_._2.schema).reduce(GpxTable.unionSchemas)
    val exists = fs.exists(rootP)
    val logTable = exists && GpxCommitLog.isLogTable(table, conf)
    val tableSchema: Option[org.apache.spark.sql.types.StructType] =
      if (logTable) GpxCommitLog.head(table, conf).flatMap(_.schema)
      else if (exists) {
        val files = GpxTable.listFiles(Seq(table), conf)
        if (files.isEmpty) None
        else Some(files.sorted.map(GpxFileReader.FooterCache.get(_, conf).schema)
          .reduce(GpxTable.unionSchemas))
      } else None
    // compatibility = the union the readers would compute must exist;
    // throws (before any copy) when a column's types cannot widen
    tableSchema.foreach(ts => GpxTable.unionSchemas(ts, importSchema))
    fs.mkdirs(rootP)
    val copied = Vector.newBuilder[(String, GpxFormat.Footer)]
    var renamed = 0
    try {
      footers.foreach { case (src, footer) =>
        val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
        val tmp = new Path(rootP, s"._imp.$id")
        val srcP = new Path(src)
        val srcFs = srcP.getFileSystem(conf)
        if (!org.apache.hadoop.fs.FileUtil.copy(srcFs, srcP, fs, tmp,
            false, true, conf))
          throw new java.io.IOException(s"IMPORT copy failed: $src")
        val dest = new Path(rootP, s"imp_$id.gpx")
        if (!fs.rename(tmp, dest)) {
          try fs.delete(tmp, false) catch { case _: Throwable => () }
          throw new java.io.IOException(s"IMPORT publish failed: $src")
        }
        renamed += 1
        copied += ((dest.toString, footer))
      }
      val out = copied.result()
      if (logTable) {
        try GpxCommitLog.commit(table, conf, GpxCommitLog.Append(
          out.map { case (p, _) => GpxCommitLog.entryFor(table, p, conf) },
          schema = Some(importSchema)))
        catch {
          case t: Throwable =>
            // unreferenced imp_*.gpx files are invisible to log-table
            // readers and reclaimed only by vacuum's staging-grace sweep
            // (possibly hours away) — a failed commit must take its
            // copies with it. The commit itself re-checks the copies
            // exist before publishing, so a sweep that DID race the
            // grace fails here loudly instead of landing dangling.
            out.foreach { case (p, _) =>
              try fs.delete(new Path(p), false)
              catch { case _: Throwable => () }
            }
            throw t
        }
      }
      if (!logTable) GpxVersion.bump(table, conf)
      (out.size, out.map(_._2.rowGroups.map(_.numRows.toLong).sum).sum)
    } catch {
      case t: Throwable =>
        // plain tables: renamed files are reader-visible IMMEDIATELY, so
        // the version token must move even when a later copy in the
        // batch failed — a stale token would keep validating point-index/
        // colstats sidecars that miss the adopted rows (scans would see
        // them, indexed lookups wouldn't: inconsistent answers, no
        // error). Best-effort here: a bump failure must not MASK the
        // import failure the operator actually needs to see.
        if (!logTable && renamed > 0)
          try GpxVersion.bump(table, conf)
          catch { case b: Throwable => t.addSuppressed(b) }
        throw t
    }
  }

  /** STAT-command analog (reference pixels-cli STAT in the
    * LOAD→COMPACT→STAT flow, docs/TPC-H.md:116-143: collected column
    * cardinalities land in the metadata service and feed PlanOptimizer
    * selectivity, PlanOptimizer.java:364). One distributed aggregation
    * pass computes per-column approximate NDV (HLL, 2% rsd) plus the
    * exact row count and publishes them as a `_colstats` sidecar stamped
    * with the table's current version token. The scan overlays
    * distinctCount onto its footer-derived CBO statistics only while the
    * stamp still matches — after ANY mutation the stats silently drop
    * out instead of feeding the optimizer stale cardinalities. At 100 TB
    * this is the same one-pass, partial-aggregated shape as any group-by;
    * re-run it like the reference re-runs STAT. */
  def analyze(spark: org.apache.spark.sql.SparkSession, table: String,
      conf: Configuration = new Configuration()): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    // Token-less tables (legacy / external writers) are NOT opted into
    // token-gated validity as a side effect of STAT — an external
    // mutation would never bump a seeded token and the sidecar would
    // serve stale forever. They get a `listing:` digest stamp instead;
    // readColStats revalidates it by recomputing the digest.
    val token = GpxVersion.current(table, conf).getOrElse(
      "listing:" + GpxVersion.listingDigest(table, conf))
    val df = spark.read.format("gpx").load(table)
    val cols = df.schema.fields.toSeq
    val aggs = count(lit(1)) +:
      cols.map(f => approx_count_distinct(col(f.name), 0.02))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(0)
    val ndv = cols.zipWithIndex.map { case (f, i) =>
      f.name -> row.getLong(i + 1)
    }.toMap
    val lines = Seq(token, rows.toString) ++ ndv.toSeq.sortBy(_._1).map {
      case (n, v) => s"${java.net.URLEncoder.encode(n, "UTF-8")}\t$v"
    }
    // tmp + rename publish (same protocol as version tokens): readers see
    // the old stats or the new ones, never a torn file
    val rootP = new Path(table)
    val fs = rootP.getFileSystem(conf)
    val tmp = new Path(rootP,
      s"._colstats.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    val dest = new Path(rootP, "_colstats")
    if (fs.exists(dest)) { try fs.delete(dest, false) catch { case _: Throwable => () } }
    if (!fs.rename(tmp, dest)) {
      try fs.delete(tmp, false) catch { case _: Throwable => () }
      throw new java.io.IOException(s"colstats publish failed for $table")
    }
    ndv
  }
}
