package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Log-structured versioned snapshot store with atomic metadata swap — the
  * Spark-native equivalent of the reference's Retina write path + MVCC
  * visibility (pixels-retina/.../MemTable.java:31-75, RGVisibility.java:34-60,
  * metadata AtomicSwapFiles proto/metadata.proto:74).
  *
  * Layout: each commit v writes ONLY its micro-batch as an immutable delta
  * directory `d_v` plus a manifest `m_v.txt` listing every directory that
  * constitutes the table at v (previous manifest + the new delta); `_CURRENT`
  * is swapped to v last. So write amplification is O(batch), not O(table) —
  * the log-structured property that gives Retina its MemTable-flush freshness.
  * Readers resolve `_CURRENT` -> manifest -> an immutable set of directories;
  * no shared mutable visibility state, no reader/writer races.
  *
  * Reads are merge-on-read: union of the manifest members, latest visible row
  * per key (one shuffle on the key columns). Deletes are logical: a
  * `_deleted` column filtered at read time (delete-bitmap analog). Time
  * travel = read any retained version, or any commit-ts bound within one.
  * [[compact]] folds the current manifest into a single base directory `b_v`
  * so read fan-in stays bounded (the Compactor's merge role,
  * pixels-core/.../compactor/PixelsCompactor.java:52).
  */
class SnapshotStore(
    spark: SparkSession,
    path: String,
    keyCols: Seq[String],
    versionCol: String,
    format: String = "parquet",
    deadClaimTtlMs: Long = 30000L,
    vacuumGraceMs: Long = 600000L) {

  // vacuum grace is a SEPARATE, much larger knob than the dead-claim
  // TTL: 30 s suits claim-steal recovery (a claim is one tiny file
  // written instants before the manifest), but a committer's delta DIR
  // and manifest tmp exist for the whole data-write window, and a
  // committer stalled >30 s between finishing its delta write and
  // publishing (GC pause, CPU starvation) must not have its in-flight
  // artifacts reclaimed by a concurrent compact's vacuum
  require(vacuumGraceMs >= deadClaimTtlMs,
    "vacuumGraceMs must be at least deadClaimTtlMs")

  private def root = Paths.get(path)
  private def currentFile = root.resolve("_CURRENT")

  /** Current committed version, -1 for an empty store. An UNREADABLE
    * pointer propagates instead of reading as -1: the pointer is only
    * ever ATOMIC_MOVE-swapped (never partial), so a read failure is a
    * transient store error — and conflating it with "empty table" would
    * make the next upsert restart at version 0, clobbering d_000000 and
    * silently truncating the table's history.
    *
    * The pointer is a CACHE of "highest published manifest", not the
    * source of truth: manifest publication is claim-arbitrated
    * put-if-absent, so a published m_{v+1} IS committed, and this walk
    * rolls the pointer forward over it. That heals both a committer that
    * crashed between publish and pointer swap AND the cross-process
    * pointer REGRESSION the in-JVM pointerLock cannot prevent (process A
    * passes its monotone check, process B advances, A's stale
    * ATOMIC_MOVE lands) — every subsequent currentVersion call from any
    * process reads through the regression. Steady-state cost: one
    * negative Files.exists probe. */
  def currentVersion: Long = {
    val raw = rawPointer()
    var v = raw
    while (Files.exists(manifestFile(v + 1))) v += 1
    // best-effort heal: the walked-forward version is already correct in
    // memory; persisting the pointer only saves future walks. A pure
    // reader (read-only mount, no write permission) must not throw on
    // what is otherwise a read path.
    if (v > raw) {
      try advancePointer(v)
      catch { case _: java.io.IOException | _: SecurityException => }
    }
    v
  }

  private def rawPointer(): Long = {
    if (!Files.exists(currentFile)) -1L
    else {
      val txt = new String(Files.readAllBytes(currentFile)).trim
      try txt.toLong catch {
        case e: NumberFormatException => throw new java.io.IOException(
          s"snapshot store $path: corrupt _CURRENT pointer '$txt'", e)
      }
    }
  }

  // delta/base dir names carry an attempt-unique suffix: two racing
  // committers claiming the same version must never overwrite each
  // other's directory bytes before the manifest claim arbitrates
  private def newDeltaDir(v: Long) =
    root.resolve(f"d_$v%06d-${java.util.UUID.randomUUID().toString.take(8)}")
  private def newBaseDir(v: Long) =
    root.resolve(f"b_$v%06d-${java.util.UUID.randomUUID().toString.take(8)}")
  private def manifestFile(v: Long) = root.resolve(f"m_$v%06d.txt")

  /** Directory names making up version v (immutable once written). */
  def manifest(v: Long): Seq[String] =
    new String(Files.readAllBytes(manifestFile(v)))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** All retained row versions visible at table version v: the union of the
    * manifest's member directories. At-least-once redelivery can land the
    * same (key, commit-ts) row in two deltas, so the union dedupes on
    * key+ts — idempotent by construction. The dedup is DETERMINISTIC
    * (dropDuplicates keeps a plan-dependent arbitrary row): when the same
    * (key, version) carries CONFLICTING payloads — e.g. an upsert and a
    * tombstone replayed with one coarse commit ts — the tombstone wins,
    * and remaining ties break on a content hash, so two reads of the same
    * version always agree and compact() bakes in the same resolution a
    * pre-compaction read served. */
  def readVersion(v: Long): DataFrame = {
    val dirs = manifest(v).map(n => root.resolve(n).toString)
    val df = spark.read.format(format).option("mergeSchema", "true")
      .load(dirs: _*)
    val w = Window.partitionBy((keyCols :+ versionCol).map(col): _*)
      .orderBy(col("_deleted").desc,
        xxhash64(df.columns.map(col): _*).desc)
    df.withColumn("_dup_rn", row_number().over(w))
      .filter(col("_dup_rn") === 1)
      .drop("_dup_rn")
  }

  /** Read the current snapshot: latest visible row per key, excluding
    * logically-deleted rows (merge-on-read over base + deltas). */
  def read(): Option[DataFrame] = {
    val v = currentVersion
    if (v < 0) None
    else Some(latestPerKey(readVersion(v)).filter(!col("_deleted")))
  }

  /** Read the snapshot as of a commit timestamp: only row versions with
    * commit ts <= the bound are visible — MVCC snapshot semantics
    * (reader option transTimestamp, PixelsReaderOption.java:39). */
  def readAsOf(ts: Long): Option[DataFrame] = {
    val v = currentVersion
    if (v < 0) None
    else Some(latestPerKey(readVersion(v).filter(col(versionCol) <= ts))
      .filter(!col("_deleted")))
  }

  private def latestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Apply one CDC micro-batch: rows with `_deleted=true` are tombstones.
    * Writes ONLY the batch as delta v+1 (O(batch) bytes — never a table
    * rewrite); visibility is resolved at read time (merge-on-read). All row
    * versions are retained, so any commit-ts snapshot stays readable. */
  def upsert(batch: DataFrame): Long = {
    val withDel =
      if (batch.columns.contains("_deleted")) batch
      else batch.withColumn("_deleted", lit(false))
    val deduped = withDel.dropDuplicates(keyCols :+ versionCol)
    var attempts = 50
    while (true) {
      attempts -= 1
      val cur = currentVersion
      val next = cur + 1
      val delta = newDeltaDir(next)
      deduped.write.mode(SaveMode.Overwrite).format(format)
        // gpx deltas also carry the table version as the format-level MVCC
        // commit ts (option is ignored by parquet)
        .option("commitTs", next.toString)
        .save(delta.toString)
      val members =
        (if (cur < 0) Seq.empty else manifest(cur)) :+ delta.getFileName.toString
      if (claimManifest(next, members)) { commit(next); return next }
      // lost the version slot (a concurrent upsert/compact claimed it):
      // rebase on the new head and retry; the orphaned delta dir is
      // unreferenced garbage (vacuum reclaims it), never wrong data.
      // Small jittered backoff: each retry re-runs a full delta write,
      // and a stuck claim would otherwise burn all 50 attempts in a
      // tight loop well inside the dead-claim TTL
      Thread.sleep(25L + scala.util.Random.nextInt(50))
      if (attempts <= 0) throw new java.io.IOException(
        s"snapshot store $path: could not claim a version after 50 attempts; " +
          "if an m_NNNNNN.claim exists without a matching m_NNNNNN.txt, its " +
          "committer died mid-publish — dead claims are auto-reclaimed after " +
          s"$deadClaimTtlMs ms, or delete the stale .claim to repair now")
    }
    -1L // unreachable
  }

  /** Fold every member of the current version into one base directory and
    * commit it as the next version. All row versions are retained (so
    * [[readAsOf]] time travel still works within the compacted base); older
    * table versions keep referencing their original directories. Bounded
    * read fan-in without blocking writers: the fold reads an immutable
    * version while new deltas keep committing on top — if one lands while
    * the fold runs, the manifest claim is lost and the fold RETRIES over
    * the new head (writers never wait; the compactor pays the re-fold). */
  def compact(): Long = {
    var attempts = 10
    while (true) {
      attempts -= 1
      val cur = currentVersion
      require(cur >= 0, "nothing to compact")
      val next = cur + 1
      val base = newBaseDir(next)
      readVersion(cur).write.mode(SaveMode.Overwrite).format(format)
        .option("commitTs", next.toString)
        .save(base.toString)
      if (claimManifest(next, Seq(base.getFileName.toString))) {
        commit(next)
        // the natural GC point: lost-race debris and dead tombstones
        // accumulate without bound otherwise (nothing else reclaims them)
        vacuum()
        return next
      }
      Thread.sleep(25L + scala.util.Random.nextInt(50))
      if (attempts <= 0) throw new java.io.IOException(
        s"snapshot store $path: compaction lost every version claim to " +
          "concurrent writers after 10 folds; if an m_NNNNNN.claim exists " +
          "without a matching m_NNNNNN.txt, its committer died mid-publish — " +
          s"dead claims are auto-reclaimed after $deadClaimTtlMs ms, or " +
          "delete the stale .claim to repair now")
    }
    -1L // unreachable
  }

  /** Total bytes under one member directory (test/ops instrumentation). */
  def dirBytes(member: String): Long = {
    val p = root.resolve(member)
    if (!Files.exists(p)) 0L
    else {
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .filter(Files.isRegularFile(_)).map(Files.size).sum
      finally walk.close() // the stream holds open directory handles
    }
  }

  /** Claim version v with an atomic O_EXCL create of a claim marker:
    * exactly one committer per version slot — a racing upsert and compact
    * can no longer both write m_v, which silently dropped the loser's
    * rows from the head. (ATOMIC_MOVE is NOT exclusive: POSIX rename
    * replaces an existing target.) The manifest itself is then published
    * via ATOMIC_MOVE, so readers — who only resolve manifests at or below
    * the committed pointer — never observe a partial one. */
  private def claimManifest(v: Long, members: Seq[String]): Boolean = {
    Files.createDirectories(root)
    val claim = root.resolve(f"m_$v%06d.claim")
    // the claim carries an owner nonce so a committer that stalls past the
    // dead-claim TTL (and gets its slot stolen by a recoverer) can detect
    // the theft and abort instead of clobbering the stealer's manifest
    val nonce = java.util.UUID.randomUUID().toString
    try Files.write(claim, nonce.getBytes,
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        recoverDeadClaim(v, claim); return false
    }
    val tmp = root.resolve(
      s"_m.tmp.$v.${java.util.UUID.randomUUID().toString.take(8)}")
    // any failure between claim create and publish must RELEASE the claim
    // (while still ours) before propagating: an orphaned claim with no
    // manifest blocks every committer on this slot for the full
    // dead-claim TTL (ENOSPC on the tmp write was enough to wedge the
    // store for 30 s per incident)
    try Files.write(tmp, members.mkString("\n").getBytes)
    catch { case e: Throwable => releaseOwnClaim(claim, nonce); throw e }
    // publish only while the claim is still ours: a recoverer may have
    // declared this claim dead (TTL) and re-claimed the slot while we
    // stalled between the claim and here
    val stillOurs =
      try new String(Files.readAllBytes(claim)) == nonce
      catch { case _: java.io.IOException => false }
    if (!stillOurs) { Files.deleteIfExists(tmp); return false }
    // PUT-IF-ABSENT publish, not rename: the ownership check above still
    // leaves a window (check -> TTL steal -> stealer publishes -> our
    // rename) in which ATOMIC_MOVE+REPLACE would clobber the stealer's
    // manifest and silently lose its acknowledged delta. link(2) fails
    // with EEXIST atomically, so exactly one publisher for v ever wins;
    // the loser rebases like any lost race. Filesystems without hard
    // links fall back to an existence-checked move (best effort — the
    // same window the link exists to close, kept only as a fallback).
    try {
      Files.createLink(manifestFile(v), tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
      case _: UnsupportedOperationException =>
        if (Files.exists(manifestFile(v))) { Files.deleteIfExists(tmp); false }
        else {
          try Files.move(tmp, manifestFile(v), StandardCopyOption.ATOMIC_MOVE)
          catch { case e: Throwable => releaseOwnClaim(claim, nonce); throw e }
          true
        }
      case e: Throwable => // link failed for a non-EEXIST reason
        releaseOwnClaim(claim, nonce)
        Files.deleteIfExists(tmp)
        throw e
    }
  }

  /** drop a claim if (and only if) it still carries our nonce — never
    * another committer's claim */
  private def releaseOwnClaim(claim: java.nio.file.Path, nonce: String): Unit =
    try {
      if (new String(Files.readAllBytes(claim)) == nonce)
        Files.deleteIfExists(claim)
      ()
    } catch { case _: java.io.IOException => () }

  /** Crash repair for an orphaned claim at v (a committer that died between
    * claiming the slot and swapping `_CURRENT`). Two cases:
    *  - its manifest WAS published: finish the dead committer's work by
    *    rolling `_CURRENT` forward to v (commit is monotone and race-free),
    *    so the caller's retry rebases on the recovered head;
    *  - no manifest and the claim is older than [[deadClaimTtlMs]]: steal
    *    the slot by ATOMIC_MOVE-ing the claim to a uniquely-named tombstone
    *    — exactly one recoverer wins the rename; the winner's retry loop
    *    re-runs the exclusive claim create and makes progress.
    * A claim younger than the TTL may belong to a live slow committer, so
    * it is left alone (the caller retries / eventually reports the repair). */
  private def recoverDeadClaim(v: Long, claim: java.nio.file.Path): Unit = {
    if (Files.exists(manifestFile(v))) { commit(v); return }
    val age =
      try System.currentTimeMillis() - Files.getLastModifiedTime(claim).toMillis
      catch { case _: java.io.IOException => return } // claim vanished: owner
        // finished or another recoverer already stole it — just retry
    if (age < deadClaimTtlMs) return // possibly a live slow committer
    val tomb = root.resolve(
      s"${claim.getFileName}.dead.${java.util.UUID.randomUUID().toString.take(8)}")
    try Files.move(claim, tomb, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.io.IOException => () } // lost the steal — fine
  }

  // pointer swaps serialized in-JVM and monotone; CROSS-process, a stale
  // swap can still land after another process advanced — currentVersion's
  // published-manifest walk reads through (and repairs) that regression,
  // so the raw pointer value is never trusted on its own
  private val pointerLock = new Object

  private def commit(v: Long): Unit = advancePointer(v)

  /** Atomic pointer advance: write tmp, then ATOMIC_MOVE over _CURRENT. */
  private def advancePointer(v: Long): Unit = pointerLock.synchronized {
    if (rawPointer() >= v) return // a later commit already advanced
    Files.createDirectories(root)
    val tmp = root.resolve(s"_CURRENT.tmp.$v")
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Garbage collection (run by [[compact]]; callable ad hoc): deletes
    * member directories referenced by NO on-disk manifest, claim
    * tombstones, and orphaned tmp files — the debris lost races and dead
    * committers leave behind, which nothing else ever reclaims. Only
    * items older than [[vacuumGraceMs]] go (an in-flight committer's
    * delta is always younger than the grace when it publishes — the
    * grace is sized in minutes precisely so a GC-stalled committer's
    * write window fits inside it), so a racing upsert can never lose
    * its directory. Retained manifests keep
    * their members, so time travel over retained versions is unaffected. */
  def vacuum(): Unit = {
    if (!Files.exists(root)) return
    val listing = Files.list(root)
    val names = try listing.iterator().asScala.map(_.getFileName.toString).toVector
    finally listing.close()
    val referenced: Set[String] = names
      .filter(n => n.startsWith("m_") && n.endsWith(".txt"))
      .flatMap { n =>
        try new String(Files.readAllBytes(root.resolve(n)))
          .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        catch { case _: java.io.IOException => Iterator.empty }
      }.toSet
    val cutoff = System.currentTimeMillis() - vacuumGraceMs
    def oldEnough(p: java.nio.file.Path): Boolean =
      try Files.getLastModifiedTime(p).toMillis < cutoff
      catch { case _: java.io.IOException => false }
    names.foreach { n =>
      val p = root.resolve(n)
      val orphanDir = (n.startsWith("d_") || n.startsWith("b_")) &&
        !referenced.contains(n)
      val debris = n.contains(".claim.dead.") ||
        n.startsWith("_m.tmp.") || n.startsWith("_CURRENT.tmp.")
      if ((orphanDir || debris) && oldEnough(p)) {
        try {
          if (Files.isDirectory(p)) {
            val walk = Files.walk(p)
            try walk.iterator().asScala.toVector.reverseIterator
              .foreach(Files.deleteIfExists(_))
            finally walk.close()
          } else Files.deleteIfExists(p)
          ()
        } catch { case _: java.io.IOException => () } // next vacuum retries
      }
    }
  }
}

/** Structured Streaming CDC ingestion: foreachBatch -> SnapshotStore.upsert.
  * The streaming analog of Retina's gRPC UpdateRecord replay
  * (proto/retina.proto:34-50). */
object CdcUpsert {
  def start(
      stream: DataFrame,
      store: SnapshotStore,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.upsert(batch)
        ()
      }
      .start()
}
