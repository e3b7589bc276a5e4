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

  final case class Held(path: Path, token: String, fs: FileSystem)

  private def ttlMs: Long =
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
    def tryCreate(): Boolean =
      try {
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
        } catch { case _: Throwable => ("?", 0L) } // racing release: treat as fresh
      val stale = ageMs > ttlMs
      if (!(stale && { fs.delete(p, false); tryCreate() }))
        throw new java.util.ConcurrentModificationException(
          s"gpx table $dir has a concurrent mutation in progress " +
          s"($holderOp, held ${ageMs / 1000}s); this operation was refused " +
          "to prevent conflicting rewrites. Retry when it finishes, or if " +
          "its driver crashed the lock goes stale after " +
          s"${ttlMs / 1000}s (spark.graft.gpx.mutationLockTtlMs).")
    }
    Held(p, token, fs)
  }

  /** release only if still ours — a TTL steal must not have its fresh
    * lock deleted by the previous (slow, stolen-from) holder */
  def release(h: Held): Unit =
    try {
      val in = h.fs.open(h.path)
      val tok = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().nextOption().getOrElse("")
      finally in.close()
      if (tok == h.token) h.fs.delete(h.path, false)
    } catch { case _: Throwable => () }

  def withLock[T](root: String, conf: Configuration, op: String)(body: => T): T = {
    val h = acquire(root, conf, op)
    try body finally release(h)
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
