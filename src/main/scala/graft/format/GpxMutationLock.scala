package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Storage-level advisory lock serializing MUTATING table operations
  * (row-level DELETE/UPDATE/MERGE, compaction, INSERT OVERWRITE).
  *
  * Why: every gpx mutation is publish-then-retire — survivors/masks are
  * made visible first, superseded bytes dropped after (crash-safe:
  * duplicates, never loss). Two ops doing that CONCURRENTLY over the
  * same files would each publish survivors of the same originals and
  * silently duplicate rows. The reference serializes mutations through
  * a central transaction service (pixels-common/.../transaction/,
  * TransService with begin/commit); gpx has no daemon, so the analog is
  * a storage-level mutex: atomic create-if-absent of `_mutlock` under
  * the table root. Appends stay lock-free (op-unique file names,
  * listing-visible, commutative); only destructive ops take the lock.
  *
  * Failure modes, by design:
  *  - concurrent mutation  -> fail FAST with the holder's description
  *    (java.util.ConcurrentModificationException), table untouched —
  *    the caller retries; no silent corruption.
  *  - crashed holder       -> the lock goes stale; acquirers steal it
  *    after `spark.graft.gpx.mutationLockTtlMs` (default 10 min).
  *    Mutations are minutes-scale jobs; a legitimately longer one must
  *    raise the TTL. The steal itself has a small race window (two
  *    stealers both deleting + recreating) — on HDFS-semantics stores
  *    create-if-absent is atomic so one wins; on eventual-consistency
  *    stores the lock is advisory, which is the documented contract.
  * Lock files start with `_`, so readers never see them (the data
  * listing skips `_`/`.` names).
  */
object GpxMutationLock {
  val LockName = "_mutlock"
  val DefaultTtlMs: Long = 10 * 60 * 1000L

  final case class Held(path: Path, token: String, fs: FileSystem,
      acquiredAtMs: Long, ttlAtAcquireMs: Long)

  /** the liveness boundary everything above builds on: a holder stalled
    * past this is treated as dead. Public so the commit-log graces (which
    * encode the SAME boundary) can cross-validate against it. */
  def ttlMs: Long =
    try org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.gpx.mutationLockTtlMs").map(_.toLong)
      .getOrElse(DefaultTtlMs)
    catch { case _: Throwable => DefaultTtlMs }

  /** table root for a lock: explicit-file loads lock the file's parent
    * dir, so file- and dir-rooted ops on one table contend correctly */
  private def lockDir(root: String): Path = {
    val p = new Path(root)
    if (root.endsWith(".gpx")) p.getParent else p
  }

  def acquire(root: String, conf: Configuration, op: String): Held = {
    val dir = lockDir(root)
    val fs = dir.getFileSystem(conf)
    val p = new Path(dir, LockName)
    val token = java.util.UUID.randomUUID().toString
    val ttl = ttlMs
    def tryCreate(): Boolean =
      if (fs.getScheme == "file") {
        // RawLocalFileSystem.create(overwrite=false) is check-then-act:
        // two same-JVM (or same-host) acquirers can both "win". Claim
        // with an atomic POSIX O_EXCL create instead, then write the
        // holder info (same discipline as GpxCommitLog.putIfAbsent).
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        try {
          val parent = local.getParent
          if (parent != null) java.nio.file.Files.createDirectories(parent)
          java.nio.file.Files.createFile(local) // atomic exclusive claim
          java.nio.file.Files.write(local,
            s"$token\n$op\n${System.currentTimeMillis()}".getBytes("UTF-8"))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      } else try {
        // overwrite=false: atomic create-if-absent on HDFS-semantics
        // stores — exactly one concurrent caller succeeds
        val out = fs.create(p, false)
        try out.write(s"$token\n$op\n${System.currentTimeMillis()}"
          .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val (holderOp, ageMs) =
        try {
          val st = fs.getFileStatus(p)
          val in = fs.open(p)
          val lines =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
            finally in.close()
          (lines.drop(1).headOption.getOrElse("?"),
            System.currentTimeMillis() - st.getModificationTime)
        } catch {
          case _: java.io.FileNotFoundException =>
            // the holder RELEASED between our failed create and this
            // read: the table is free — retry the create instead of
            // refusing a phantom in-progress mutation
            if (tryCreate())
              return Held(p, token, fs, System.currentTimeMillis(), ttl)
            ("?", 0L)
          case _: Throwable => ("?", 0L) // racing release: treat as fresh
        }
      val stale = ageMs > ttl
      // steal by RENAME, not delete-then-create: two stealers deleting
      // concurrently would each remove the OTHER's freshly created lock.
      // A rename is atomic, so exactly one stealer claims the stale file;
      // the loser falls through to the conflict error, and brand-new
      // acquirers keep arbitrating via create-if-absent
      val stole = stale && {
        val claimed = new Path(dir, s"$LockName.stale.$token")
        (try fs.rename(p, claimed) catch { case _: Throwable => false }) && {
          try fs.delete(claimed, false) catch { case _: Throwable => () }
          tryCreate()
        }
      }
      if (!stole)
        throw new java.util.ConcurrentModificationException(
          s"gpx table $dir has a concurrent mutation in progress " +
          s"($holderOp, held ${ageMs / 1000}s); this operation was refused " +
          "to prevent conflicting rewrites. Retry when it finishes, or if " +
          "its driver crashed the lock goes stale after " +
          s"${ttl / 1000}s (spark.graft.gpx.mutationLockTtlMs).")
    }
    Held(p, token, fs, System.currentTimeMillis(), ttl)
  }

  /** release only if still ours — a TTL steal must not have its fresh
    * lock deleted by the previous (slow, stolen-from) holder. The token
    * read-then-delete is not atomic, so a holder whose hold EXCEEDED the
    * TTL never deletes at all: its lock is either already stolen (a
    * delete could race the thief) or will be treated as stale by the
    * next acquirer — leaving the file is always safe, deleting is not. */
  def release(h: Held): Unit =
    try {
      if (System.currentTimeMillis() - h.acquiredAtMs >= h.ttlAtAcquireMs)
        ()
      else {
        val in = h.fs.open(h.path)
        val tok = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().nextOption().getOrElse("")
        finally in.close()
        if (tok == h.token) h.fs.delete(h.path, false)
      }
    } catch { case _: Throwable => () }

  def withLock[T](root: String, conf: Configuration, op: String)(body: => T): T = {
    val h = acquire(root, conf, op)
    try body finally release(h)
  }

  /** lock EVERY distinct root of a multi-root table (sorted, so two
    * multi-root ops contend on the same first lock instead of each
    * grabbing one and failing on the other's) */
  def withLocks[T](roots: Seq[String], conf: Configuration, op: String)(body: => T): T = {
    val dirs = roots.map(r => lockDir(r).toString).distinct.sorted
    def go(rem: List[String]): T = rem match {
      case Nil => body
      case h :: t => withLock(h, conf, op)(go(t))
    }
    go(dirs.toList)
  }

  /** Fingerprint of the table's delete-sidecar state: the set of sidecar
    * paths under every data-file parent. Row-level rewrites capture it at
    * write planning and re-check at commit (under the lock): ANY change —
    * a sidecar added by a concurrent merge-on-read delete, or one folded
    * away by a rewrite — means this op's scan may have read row versions
    * that no longer reflect the table, so publishing could resurrect
    * deleted rows. Conservative by design: a concurrent mask on rows this
    * op never touched also aborts (with a retry message), never corrupts. */
  def sidecarState(root: String, conf: Configuration): Set[String] = {
    // version-tracked tables with no delete marker provably have no
    // sidecars: the capture is the empty set with zero walking (any
    // concurrent mutation that adds one marks the table first, so the
    // commit-time re-check walks and sees the difference)
    if (GpxVersion.hasDeletes(root, conf).contains(false)) return Set.empty
    val parents = GpxTable.listFiles(Seq(root), conf)
      .map(f => new Path(f).getParent) :+ lockDir(root)
    parents.distinct.flatMap(par =>
      GpxDeleteBitmap.sidecarsIn(par, conf).values.flatten.map(_.path)).toSet
  }

  def verifySidecarsUnchanged(root: String, conf: Configuration,
      captured: Set[String], op: String): Unit = {
    val now = sidecarState(root, conf)
    if (now != captured) {
      val delta = (now -- captured) ++ (captured -- now)
      throw new java.util.ConcurrentModificationException(
        s"gpx $op refused: the table's delete-bitmap sidecars changed " +
        s"since this operation planned (${delta.take(3).mkString(", ")}…) " +
        "— a concurrent mutation masked or folded rows; publishing could " +
        "resurrect deleted rows. Retry the operation.")
    }
  }

  /** defense-in-depth for commit paths: the files a rewrite consumed
    * must still exist at publish time — a missing one means a
    * concurrent op (e.g. after a TTL steal) already rewrote it, and
    * publishing would duplicate its surviving rows */
  def verifyStillPresent(fs: FileSystem, files: Iterable[String]): Unit = {
    val gone = files.filterNot(f => try fs.exists(new Path(f))
      catch { case _: Throwable => false })
    if (gone.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"gpx commit refused: ${gone.size} source file(s) vanished since " +
        s"this operation planned (${gone.take(3).mkString(", ")}…) — a " +
        "concurrent mutation rewrote them; publishing would duplicate rows.")
  }
}
