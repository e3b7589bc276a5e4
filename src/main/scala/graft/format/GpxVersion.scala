package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-table layout-version token — the O(1) validity primitive that
  * replaces per-scan O(files) listing walks.
  *
  * Problem shape: projection routing, point-index serving and the
  * delete-sidecar probe each need "has this table changed since X?" at
  * SCAN BUILD time. Comparing full (relpath|len|mtime) listings answers it
  * exactly but costs recursive walks per query plan — a planning-time
  * scale-killer on object storage with millions of files. (The reference
  * answers the same question through its metadata service's table
  * versions; gpx has no daemon, so the analog is a storage token.)
  *
  * Mechanism: every COMMITTING write path bumps `<table>/_version` to a
  * fresh unique token (never a counter — counters lose concurrent updates
  * and could revalidate a stale manifest; distinct random tokens can only
  * INVALIDATE). A derived artifact (projection manifest, index manifest)
  * records the token read BEFORE it captured its listing; validity is one
  * tiny file read + string compare. A commit racing the build changes the
  * token, so the artifact conservatively invalidates — never serves stale.
  * Tables without a token file (legacy, or external writers) fall back to
  * the exact listing comparison.
  *
  * Delete-sidecar presence rides the same mechanism as a MARKER file
  * (`_hasdels`): present = the table MAY have merge-on-read sidecars
  * (conservative — scans then skip footer-stats/limit pushdown and walk
  * for real masks); absent (with `_version` present) = provably none.
  * The marker is created BEFORE the first sidecar of a mutation is
  * written (under the table's mutation lock) and removed only by
  * recompute paths that verified zero sidecars remain — over-reporting
  * is safe, under-reporting never happens. Lock-free appends never touch
  * the marker, so they cannot race a masking mutation into a false
  * negative. The first bump of a legacy table seeds the marker with one
  * walk.
  */
object GpxVersion {

  val VersionFile = "_version"

  /** data-layout-only token: bumped when DATA FILES change (append,
    * overwrite, COW rewrite, compaction, fold) but NOT when a
    * merge-on-read delete publishes a bitmap sidecar. Artifacts that
    * replay delete bitmaps themselves at serve time (the point index)
    * validate against THIS token, so bitmap deletes — the whole point of
    * merge-on-read — don't throw away their index. Artifacts that FOLD
    * deletes at build time (projections) keep validating against the
    * delete-sensitive `_version`. */
  val DataVersionFile = "_vdata"

  val DelMark = "_hasdels"

  /** table dir for a root (explicit-file roots version their parent,
    * matching the mutation lock's contention scope) */
  private def dir(root: String): Path = {
    val p = new Path(root)
    if (root.endsWith(".gpx")) p.getParent else p
  }

  private def freshToken(): String =
    s"${System.currentTimeMillis()}-${java.util.UUID.randomUUID().toString.take(12)}"

  /** current token, or None when absent/unreadable (callers fall back to
    * exact listing comparison). Commit-log tables derive the token from
    * the manifest head version — EXACT (every state change is a new
    * version) and atomic on any store, where the token-file publish
    * (delete + rename) is merely best-effort; this is what keeps
    * token-gated artifacts (ANALYZE stats, projection manifests, point
    * indexes) correctly validated on object stores. */
  def current(root: String, conf: Configuration): Option[String] =
    logToken(root, conf).orElse(read(root, VersionFile, conf))

  /** current data-layout token (delete-sidecar changes excluded), or None
    * when absent/unreadable. Log tables never grow merge-on-read sidecars
    * (GpxDelete routes them to COW), so the manifest version covers the
    * data layout exactly. */
  def currentData(root: String, conf: Configuration): Option[String] =
    logToken(root, conf).orElse(read(root, DataVersionFile, conf))

  private def logToken(root: String, conf: Configuration): Option[String] =
    try {
      if (GpxCommitLog.isLogTable(root, conf))
        GpxCommitLog.head(root, conf).map(s => s"mf:${s.version}")
      else None
    } catch { case _: Throwable => None }

  private def read(root: String, file: String,
      conf: Configuration): Option[String] = {
    val p = new Path(dir(root), file)
    try {
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val t = txt.trim
        if (t.nonEmpty) Some(t) else None
      }
    } catch { case _: Throwable => None } // racing overwrite: unknown
  }

  private def writeToken(fs: FileSystem, d: Path, file: String = VersionFile): Unit = {
    val p = new Path(d, file)
    val tmp = new Path(d, s".${file}.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(freshToken().getBytes("UTF-8")) finally out.close()
    // readers observing the brief absent window treat it as "unknown" and
    // fall back to listing comparison — safe on every store. The rename is
    // RETRIED on stores where rename-to-existing fails (HDFS semantics):
    // dropping this bump after losing a race to a concurrent bump would
    // leave the winner's token standing for a table that changed TWICE —
    // a manifest recorded between the two could then serve stale.
    var attempts = 3
    var done = false
    while (!done && attempts > 0) {
      attempts -= 1
      if (fs.exists(p)) { try fs.delete(p, false) catch { case _: Throwable => () } }
      done = try fs.rename(tmp, p) catch { case _: Throwable => false }
    }
    if (!done) {
      try fs.delete(tmp, false) catch { case _: Throwable => () }
      // a failed bump must not leave the PREVIOUS token standing: a
      // present stale token VALIDATES pre-mutation artifacts (the point
      // index would then prune scans to deleted files), while an ABSENT
      // token makes every consumer fall back to the exact listing
      // comparison — delete it so failure degrades safe, not wrong
      try fs.delete(p, false) catch { case _: Throwable => () }
    }
  }

  /** invalidate every token-gated artifact of the table. On the FIRST bump
    * of a table that predates version tracking, seed the delete marker
    * with one sidecar walk so `hasDeletes` becomes authoritative. */
  def bump(root: String, conf: Configuration): Unit =
    try {
      val d = dir(root)
      val fs = d.getFileSystem(conf)
      if (!fs.exists(d)) fs.mkdirs(d)
      if (!fs.exists(new Path(d, VersionFile)) &&
          GpxDeleteBitmap.walkForSidecars(d.toString, conf))
        fs.create(new Path(d, DelMark), true).close()
      writeToken(fs, d)
      writeToken(fs, d, DataVersionFile)
    } catch { case _: Throwable => () } // best-effort: absent token = fallback

  /** mark "this table may have delete sidecars" — MUST be called before
    * the first sidecar of a mutation is published (idempotent). Bumps the
    * delete-sensitive `_version` only: data files are untouched, so
    * data-layout-keyed artifacts (point index) stay valid and replay the
    * new bitmap at serve time. */
  /** STRICT: both callers run under the mutation lock BEFORE the first
    * sidecar publishes, and the contract (scans may over-report deletes
    * transiently, never under-report) depends on the marker preceding
    * every sidecar — a failed marker write must abort the operation, not
    * leave live sidecars that anyDeletes() answers false for (pushed
    * footer counts would then count masked rows). */
  def markDeletes(root: String, conf: Configuration): Unit = {
    val d = dir(root)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    fs.create(new Path(d, DelMark), true).close()
    writeToken(fs, d)
  }

  /** exact re-derivation after a mutation that REMOVED sidecars (fold,
    * compaction, COW rewrite, overwrite): one walk, marker matches
    * reality, token bumps. Call only under the table's mutation lock —
    * the walk must not race a concurrent masking mutation. */
  def recomputeDeletes(root: String, conf: Configuration): Unit =
    try {
      val d = dir(root)
      val fs = d.getFileSystem(conf)
      fs.mkdirs(d)
      val any = GpxDeleteBitmap.walkForSidecars(d.toString, conf)
      val mark = new Path(d, DelMark)
      if (any) fs.create(mark, true).close()
      else if (fs.exists(mark)) fs.delete(mark, false)
      writeToken(fs, d)
      writeToken(fs, d, DataVersionFile)
    } catch { case _: Throwable => () }

  /** sha-256 digest of the table's exact listing (data files + delete
    * sidecars) — the validity stamp for tables WITHOUT a token discipline
    * (legacy / external writers). Recomputing it costs one O(files) walk,
    * the same price every other fallback path on untracked tables pays. */
  def listingDigest(root: String, conf: Configuration): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    GpxProjection.baseListing(root, conf)
      .foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(32)
  }

  /** Some(mayHaveDeletes) when the token file exists (marker is then
    * authoritative-or-conservative); None = untracked table, caller walks */
  def hasDeletes(root: String, conf: Configuration): Option[Boolean] =
    try {
      val d = dir(root)
      val fs = d.getFileSystem(conf)
      if (!fs.exists(new Path(d, VersionFile))) None
      else Some(fs.exists(new Path(d, DelMark)))
    } catch { case _: Throwable => None }
}
