package graft.format

import GpxFormat.ChunkStats
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.util.concurrent.atomic.AtomicLong

/** Object-store-safe commit protocol: a conditional-put manifest log.
  *
  * The default ("rename") protocol publishes state through directory
  * listings — staged files rename into the table dir, superseded files are
  * deleted, and the listing IS the table. That is correct exactly where
  * rename is atomic and create-if-absent is exclusive (local FS, HDFS). On
  * an object store neither holds: rename is copy+delete, create is
  * last-writer-wins, and the reference solves it with daemon services
  * (pixels-daemon + etcd; proto/transaction.proto:33-48,
  * proto/metadata.proto:74 AtomicSwapFiles). gpx has no daemon, so the
  * analog is this LOG: table state lives in `_commits/v<N>.mf` manifest
  * files, and a commit claims version N+1 with ONE conditional put
  * (put-if-absent). Every modern object store exposes that primitive
  * (S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`, Azure
  * `If-None-Match: *`); on HDFS-semantics stores exclusive create is the
  * same thing. Nothing else in the protocol needs atomicity:
  *
  *  - data files are written under op+task-unique names and are INVISIBLE
  *    until a manifest names them — a half-copied rename, a zombie task, a
  *    crashed writer can never corrupt a read because readers never list;
  *  - the manifest itself is checksummed, so a reader that catches a
  *    non-atomic store mid-write rejects the bytes and retries;
  *  - concurrent commits race on the SAME version slot and exactly one
  *    conditional put wins; the loser re-reads the head and either rebases
  *    (appends and removals of still-live files commute) or refuses loudly
  *    (`ConcurrentModificationException`) when the head rewrote one of the
  *    files it consumed — never a silent lost or duplicated row;
  *  - superseded files are RETIRED (dropped from the manifest), not
  *    deleted: readers pinned to an older manifest keep working, and
  *    [[vacuum]] reclaims bytes once no retained manifest references them.
  *
  * The manifest doubles as the table's planning metadata (the reference's
  * metadata-service stats / CostBasedSplitsIndex role): each entry carries
  * the file's length, row count, commitTs span, and per-column zone maps,
  * so scan planning prunes files from ONE manifest read and only opens the
  * footers of files that survive — O(matching files), not O(table files),
  * metadata reads per query at any table size.
  */
object GpxCommitLog {

  val LogDir = "_commits"

  /** conditional-put capability: a FileSystem that can atomically create a
    * key only-if-absent with all-or-nothing content visibility (the S3
    * `If-None-Match` / GCS generation-match primitive). FileSystems that
    * do not implement it fall back to exclusive create, which is atomic on
    * HDFS-semantics stores. */
  trait ConditionalPut {
    def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean
  }

  final case class FileEntry(
      relPath: String, len: Long, numRows: Long,
      minTs: Long, maxTs: Long,
      stats: Map[String, ChunkStats])

  final case class Snapshot(
      version: Long,
      schema: Option[org.apache.spark.sql.types.StructType],
      bucket: Option[GpxTable.BucketSpec],
      sort: Seq[String],
      range: Option[GpxTable.RangeSpec],
      live: Vector[FileEntry],
      /** in-memory only (never serialized): number of delta manifests
        * between this version and its nearest full snapshot. Plain
        * commits checkpoint when this reaches CheckpointInterval even if
        * the version number is off-cadence — txn member commits must stay
        * conditional deltas, so a txn-heavy table would otherwise grow an
        * unbounded delta chain between vacuums. */
      chainDepth: Int = 0) {
    def relPaths: Set[String] = live.iterator.map(_.relPath).toSet
  }

  /** observability: manifest head resolutions / manifest file parses /
    * manifest bytes written — specs assert planning costs one log read
    * (not an O(files) walk) and commits cost O(commit size) bytes (not an
    * O(live set) snapshot rewrite per append) */
  val headReads = new AtomicLong(0)
  val manifestParses = new AtomicLong(0)
  val manifestBytesWritten = new AtomicLong(0)

  /** Every CheckpointInterval-th version is a self-contained full
    * snapshot; versions in between serialize only their CHANGE (adds,
    * removes, spec/schema updates) — O(commit size) bytes per append or
    * streaming epoch instead of an O(live files) full-table rewrite (at
    * 100k files x ~10 stat'd columns a full snapshot is multi-MB; an
    * append delta stays KBs at any table size). Head resolution reads at
    * most one checkpoint + (CheckpointInterval - 1) deltas cold, and one
    * cached snapshot + nothing warm. Overwrites are always written full
    * (their change IS the whole live set), which also makes v1 (the
    * enable() seed) self-contained. */
  val CheckpointInterval = 16

  /** how long a vacuumed manifest slot stays a 0-byte tombstone before
    * the inode is reclaimed — the bound on how stale an in-flight
    * committer's resolved base may be without risking a reopened-slot
    * win (see the tombstone comment in [[vacuum]]) */
  val DefaultTombstoneGraceMs: Long = 60L * 60 * 1000

  /** default for vacuum's staging grace (`minAgeMs`): how long an
    * unreferenced data file is presumed to belong to an in-flight,
    * not-yet-committed writer */
  val DefaultVacuumGraceMs: Long = 60L * 60 * 1000

  /** ONE config surface for the commit-log liveness graces — they and
    * the mutation-lock/claim TTL all encode the same boundary ("a writer
    * stalled past X is dead") and must move TOGETHER, so each read
    * cross-validates grace >= [[GpxMutationLock.ttlMs]]: a grace below
    * the lock TTL would let vacuum reclaim artifacts of a writer the
    * lock layer still considers alive. Hadoop conf key
    * `graft.gpx.<name>` wins, then Spark conf `spark.graft.gpx.<name>`,
    * then the default. Malformed or TTL-violating values fail LOUDLY —
    * a grace knob silently falling back to 1 h is how a misconfigured
    * deployment loses data on the day it matters. (Tests/fuzz that
    * deliberately race below the boundary pass vacuum's explicit
    * `minAgeMs` parameter, which bypasses this surface.) */
  def tombstoneGraceMs(conf: Configuration): Long =
    graceConf(conf, "tombstoneGraceMs", DefaultTombstoneGraceMs)

  def vacuumGraceMs(conf: Configuration): Long =
    graceConf(conf, "vacuumGraceMs", DefaultVacuumGraceMs)

  private def graceConf(conf: Configuration, name: String,
      dflt: Long): Long = {
    val raw = Option(conf.get(s"graft.gpx.$name"))
      .orElse(org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(_.conf.getOption(s"spark.graft.gpx.$name")))
    val v = raw match {
      case None => dflt
      case Some(s) =>
        try s.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft.gpx.$name must be a long (ms), got '$s'")
        }
    }
    val ttl = GpxMutationLock.ttlMs
    if (v < ttl) throw new IllegalArgumentException(
      s"graft.gpx.$name = $v ms is below the mutation-lock/claim TTL " +
        s"($ttl ms) — both encode the same liveness boundary and must " +
        "move together (raise the grace, or lower " +
        "spark.graft.gpx.mutationLockTtlMs with it)")
    v
  }

  // parsed manifests are immutable once committed: cache by (dir, version)
  private val parseCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long), Snapshot](256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), Snapshot]): Boolean =
        size() > 1024
    })

  private def dirOf(root: String): Path = {
    val p = new Path(root)
    if (root.endsWith(".gpx")) p.getParent else p
  }

  private def logPath(root: String): Path = new Path(dirOf(root), LogDir)

  /** isLogTable is probed on every planning path (listFiles, layout-spec
    * reads, row-level builders, version tokens) — several fs.exists RPCs
    * per query on exactly the high-latency object stores the log targets.
    * Cache per table dir: a positive answer is sticky (a log, once
    * enabled, never reverts in place — dropTable invalidates), a negative
    * answer expires quickly so a cross-JVM enable() is observed within
    * the TTL. */
  private val NegativeTtlNanos = 3_000_000_000L // 3 s
  private val logTableCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def isLogTable(root: String, conf: Configuration): Boolean = {
    val key = dirOf(root).toString
    val v = logTableCache.get(key)
    if (v != null) {
      if (v.longValue() == Long.MaxValue) return true
      if (System.nanoTime() < v.longValue()) return false
    }
    // a table is on the log protocol iff `_commits` holds at least one
    // manifest — a bare empty dir (a writer that crashed between creating
    // the dir and winning its first version slot) must NOT flip the
    // protocol: it has no head, so counting it as a log table would make
    // every pre-existing file invisible and vacuum-eligible. An empty dir
    // reads as "not a log table"; the next log-routed write seeds it
    // through enable() and the listing-visible files carry over.
    val exists = try {
      val p = logPath(root)
      listVersions(p.getFileSystem(conf), p).nonEmpty
    } catch {
      case _: java.io.FileNotFoundException => false
      // a TRANSIENT probe failure must not be cached as "not a log
      // table": that would route this write to the rename protocol and
      // publish files no log reader ever sees (vacuum fodder). Refuse
      // loudly; the caller retries when the store recovers.
      case scala.util.control.NonFatal(e) =>
        throw new java.io.IOException(
          s"gpx: cannot determine the commit protocol for $root (the " +
            "_commits probe failed) — refusing to guess, a wrong guess " +
            "publishes invisible files", e)
    }
    logTableCache.put(key,
      if (exists) Long.MaxValue else System.nanoTime() + NegativeTtlNanos)
    exists
  }

  /** Filesystem schemes where the rename protocol's two load-bearing
    * primitives do NOT hold (rename is copy+delete and/or exclusive create
    * is last-writer-wins). On these, the conditional-put log is the
    * DEFAULT: a user pointing a plain write at s3a:// must get the safe
    * protocol without knowing it exists — the reference is safe-by-default
    * because every table commits through its daemon (reference
    * proto/transaction.proto:33-48). `hostile` is the test shim with the
    * same semantics. Local paths (null scheme), file:// and HDFS keep the
    * rename protocol; an explicit commitProtocol option always wins. */
  private val NonRenameAtomicSchemes = Set(
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
    "oss", "cos", "cosn", "obs", "swift", "hostile")

  def schemeUnsafeForRename(root: String): Boolean =
    (try Option(new Path(root).toUri.getScheme) catch { case _: Throwable => None })
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .exists(NonRenameAtomicSchemes.contains)

  // one loud line per table dir per JVM when routing decides the protocol
  private val routeLogged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Protocol routing for a write: explicit option > existing log > scheme
    * capability. Returns true when this write must commit through the
    * manifest log. Logs the decision once per table so an operator can see
    * which protocol a table landed on without reading the code. */
  def routeWantLog(root: String, conf: Configuration,
      explicit: Option[String]): Boolean = {
    explicit.foreach(p => require(p == "manifest" || p == "rename",
      s"commitProtocol must be 'manifest' or 'rename', got '$p'"))
    val unsafeScheme = schemeUnsafeForRename(root)
    // an EXISTING log table cannot be demoted by option: its readers
    // resolve the manifest, so a rename-protocol write would publish
    // files no reader ever sees (silent data loss, not a preference).
    // Refuse loudly rather than silently overriding the explicit option —
    // the commit path enforces the same floor, and a log line that says
    // "rename" while the commit goes through the manifest would make
    // protocol debugging actively misleading.
    if (explicit.contains("rename") && isLogTable(root, conf))
      throw new IllegalArgumentException(
        s"commitProtocol=rename requested for ${dirOf(root)}, which is an " +
          "existing commit-log table — log-table readers resolve the " +
          "manifest, so rename-published files would be invisible " +
          "(and vacuum-eligible). Remove the option; there is no demotion " +
          "path from the manifest protocol.")
    val want = explicit match {
      case Some("manifest") => true
      case Some("rename") => false
      case _ => unsafeScheme || isLogTable(root, conf)
    }
    val dirKey = dirOf(root).toString
    if (routeLogged.add(dirKey)) {
      val why = explicit match {
        case Some(p) => s"explicit commitProtocol=$p"
        case None if unsafeScheme =>
          "scheme without atomic rename -> conditional-put manifest log"
        case None if want => "existing _commits log"
        case None => "rename-atomic filesystem"
      }
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"gpx commit protocol for $dirKey: " +
          s"${if (want) "manifest" else "rename"} ($why)")
      if (!want && unsafeScheme)
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"gpx: commitProtocol=rename forced on $dirKey, whose " +
            "scheme lacks atomic rename — concurrent writers can lose " +
            "updates or tear a publish; this is unsafe unless writes are " +
            "externally serialized")
    }
    want
  }

  /** Drop every cached fact about a table dir (the log-presence answer,
    * parsed manifests, dead-slot marks). Called when the table itself is
    * deleted/recreated — a recreated table at the same path must re-probe. */
  def invalidateCaches(root: String): Unit = {
    val key = dirOf(root).toString
    logTableCache.remove(key)
    routeLogged.remove(key)
    parseCache.synchronized {
      val it = parseCache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == key) it.remove()
    }
    knownBad.removeIf(_._1 == key)
    // fate/seal cache entries are keyed by file URI under this dir; decided
    // fates are immutable so dropping them only forces a re-read (txn ids
    // are UUIDs, so a recreated table can never collide on a stale entry).
    // Match on "<dir>/" so /data/t does not also evict /data/t2's entries.
    fateCache.keySet.removeIf(_.contains(key + "/"))
  }

  // ---------------- serialization ----------------

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** an incremental manifest entry: the CHANGE one commit applied on top
    * of its predecessor version (never persisted for overwrites — those
    * serialize as self-contained full snapshots). `txn` marks a
    * multi-table transaction member: (txnId, fate-file URI) — the delta
    * applies only if that fate resolves "committed" (see resolveFate). */
  private final case class Delta(
      version: Long, isReplace: Boolean,
      add: Vector[FileEntry], removeRel: Set[String],
      bucket: Option[GpxTable.BucketSpec], sort: Seq[String],
      range: Option[GpxTable.RangeSpec],
      schema: Option[org.apache.spark.sql.types.StructType],
      txn: Option[(String, String)] = None)

  /** deterministic replay of a committed delta. The committer validated
    * the change against exactly this predecessor before winning the slot
    * (conditional put serializes versions), so apply never conflicts —
    * it mirrors commit()'s Append/Replace builders. */
  private def applyDelta(prev: Snapshot, d: Delta): Snapshot =
    if (d.isReplace)
      prev.copy(version = d.version,
        live = prev.live.filterNot(e => d.removeRel.contains(e.relPath)) ++ d.add,
        schema = mergeSchemas(prev.schema, d.schema))
    else
      prev.copy(version = d.version, live = prev.live ++ d.add,
        bucket = prev.bucket.orElse(d.bucket),
        sort = if (prev.sort.nonEmpty) prev.sort else d.sort,
        range = prev.range.orElse(d.range),
        schema = mergeSchemas(prev.schema, d.schema))

  private def appendFileLines(sb: StringBuilder, e: FileEntry): Unit = {
    sb.append(s"f ${enc(e.relPath)} ${e.len} ${e.numRows} ${e.minTs} ${e.maxTs}\n")
    e.stats.foreach { case (c, st) =>
      sb.append(s"c ${enc(c)} ${st.hasValues} ${st.minLong} ${st.maxLong} " +
        s"${java.lang.Double.doubleToRawLongBits(st.minDouble)} " +
        s"${java.lang.Double.doubleToRawLongBits(st.maxDouble)} " +
        s"${enc(st.minString)} ${enc(st.maxString)} ${st.nullCount} ${st.reliable}\n")
    }
  }

  private def seal(sb: StringBuilder): Array[Byte] = {
    val body = sb.toString
    (body + s"end ${digest(body)}\n").getBytes("UTF-8")
  }

  private def serialize(s: Snapshot): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("gpxlog1\n")
    sb.append(s"v ${s.version}\n")
    s.schema.foreach(sc => sb.append(s"schema ${enc(sc.json)}\n"))
    s.bucket.foreach(b => sb.append(s"bucket ${enc(b.column)} ${b.numBuckets}\n"))
    if (s.sort.nonEmpty) sb.append(s"sort ${s.sort.map(enc).mkString(",")}\n")
    s.range.foreach(r =>
      sb.append(s"range ${enc(r.column)} ${r.bounds.mkString(",")}\n"))
    s.live.foreach(appendFileLines(sb, _))
    seal(sb)
  }

  private def serializeDelta(d: Delta): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("gpxdelta1\n")
    sb.append(s"v ${d.version}\n")
    sb.append(s"kind ${if (d.isReplace) "replace" else "append"}\n")
    d.txn.foreach { case (id, uri) => sb.append(s"txn ${enc(id)} ${enc(uri)}\n") }
    d.schema.foreach(sc => sb.append(s"schema ${enc(sc.json)}\n"))
    d.bucket.foreach(b => sb.append(s"bucket ${enc(b.column)} ${b.numBuckets}\n"))
    if (d.sort.nonEmpty) sb.append(s"sort ${d.sort.map(enc).mkString(",")}\n")
    d.range.foreach(r =>
      sb.append(s"range ${enc(r.column)} ${r.bounds.mkString(",")}\n"))
    d.removeRel.toSeq.sorted.foreach(r => sb.append(s"rm ${enc(r)}\n"))
    d.add.foreach(appendFileLines(sb, _))
    seal(sb)
  }

  private def digest(body: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(32)
  }

  /** None = corrupt/partial bytes (non-atomic store caught mid-write);
    * Left = self-contained snapshot, Right = incremental delta */
  private def parse(bytes: Array[Byte]): Option[Either[Snapshot, Delta]] =
    try {
      manifestParses.incrementAndGet()
      val txt = new String(bytes, "UTF-8")
      val endIdx = txt.lastIndexOf("end ")
      if (endIdx < 0 || !txt.endsWith("\n")) return None
      val body = txt.substring(0, endIdx)
      val sha = txt.substring(endIdx + 4).trim
      if (digest(body) != sha) return None
      var isDelta = false
      var isReplace = false
      var txn: Option[(String, String)] = None
      var version = -1L
      var schema: Option[org.apache.spark.sql.types.StructType] = None
      var bucket: Option[GpxTable.BucketSpec] = None
      var sort: Seq[String] = Nil
      var range: Option[GpxTable.RangeSpec] = None
      val removes = Set.newBuilder[String]
      val live = Vector.newBuilder[FileEntry]
      var cur: FileEntry = null
      def flush(): Unit = if (cur != null) { live += cur; cur = null }
      body.split("\n").foreach { line =>
        val t = line.split(" ")
        t(0) match {
          case "gpxlog1" => ()
          case "gpxdelta1" => isDelta = true
          case "kind" => isReplace = t(1) == "replace"
          case "txn" => txn = Some((dec(t(1)), dec(t(2))))
          case "v" => version = t(1).toLong
          case "schema" => schema = Some(
            org.apache.spark.sql.types.DataType.fromJson(dec(t(1)))
              .asInstanceOf[org.apache.spark.sql.types.StructType])
          case "bucket" => bucket = Some(GpxTable.BucketSpec(dec(t(1)), t(2).toInt))
          case "sort" => sort = t(1).split(",").toSeq.map(dec)
          case "range" => range = Some(
            GpxTable.RangeSpec(dec(t(1)), t(2).split(",").toSeq.map(_.toLong)))
          case "rm" => removes += dec(t(1))
          case "f" =>
            flush()
            cur = FileEntry(dec(t(1)), t(2).toLong, t(3).toLong,
              t(4).toLong, t(5).toLong, Map.empty)
          case "c" =>
            val st = ChunkStats(t(2).toBoolean, t(3).toLong, t(4).toLong,
              java.lang.Double.longBitsToDouble(t(5).toLong),
              java.lang.Double.longBitsToDouble(t(6).toLong),
              dec(t(7)), dec(t(8)), t(9).toLong, t(10).toBoolean)
            cur = cur.copy(stats = cur.stats + (dec(t(1)) -> st))
          case _ => ()
        }
      }
      flush()
      if (version < 0) None
      else if (isDelta)
        Some(Right(Delta(version, isReplace, live.result(), removes.result(),
          bucket, sort, range, schema, txn)))
      else Some(Left(Snapshot(version, schema, bucket, sort, range, live.result())))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".mf"))
      name.stripPrefix("v").stripSuffix(".mf").toLongOption.filter(_ > 0)
    else None

  private def manifestName(v: Long): String = f"v$v%019d.mf"

  // ---------------- read side ----------------

  private def readBytes(fs: FileSystem, p: Path): Option[Array[Byte]] =
    try {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream(1 << 16)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def listVersions(fs: FileSystem, lp: Path): Seq[Long] =
    try {
      if (!fs.exists(lp)) Seq.empty
      else fs.listStatus(lp).toSeq.flatMap(st => versionOf(st.getPath.getName))
    } catch { case _: java.io.FileNotFoundException => Seq.empty }

  // slots whose bytes already failed a full retry round: later reads make
  // ONE attempt instead of re-paying the patience window (a dead claim
  // would otherwise tax every head() resolution ~200 ms forever)
  private val knownBad =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()

  /** Patience before a reader declares an in-flight multi-table
    * transaction dead and claims its abort. Must comfortably exceed the
    * committer's window between its first table commit and the fate put
    * (a handful of RPCs); tests shrink it. */
  @volatile var TxnResolveWaitMs: Long = 10000L

  // decided fates are immutable (written once via conditional put)
  private val fateCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Resolve a multi-table transaction's fate; true = committed. Forces a
    * decision: a missing fate file is in-doubt — wait out the patience
    * window, then claim the abort with the same conditional put the
    * committer uses for "committed". Exactly one claim wins, so every
    * reader and every later writer converges on one answer, and a crash
    * between two table commits is never observable (the fate only flips
    * to committed AFTER every member manifest landed). */
  private def resolveFate(fateUri: String, conf: Configuration): Boolean = {
    val cached = fateCache.get(fateUri)
    if (cached != null) return cached.booleanValue()
    val p = new Path(fateUri)
    val ffs = p.getFileSystem(conf)
    // prefix match: decided fates carry the member log dirs after the
    // verdict line (so table lifecycle ops can re-home them — see
    // sealHostedFates); abort claims and old-format fates are bare
    def readFate(): Option[Boolean] =
      readBytes(ffs, p).map(b => new String(b, "UTF-8")) match {
        case Some(s) if s.startsWith("committed") => Some(true)
        case Some(s) if s.startsWith("aborted") => Some(false)
        case _ => None // missing, or partial bytes mid-create — retry
      }
    val deadline = System.nanoTime() + TxnResolveWaitMs * 1000000L
    var decided: Option[Boolean] = readFate()
    while (decided.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(20)
      decided = readFate()
    }
    // in-doubt past the window: the committer is presumed dead — claim
    // the abort. Losing the claim means SOMEONE decided; read them. A
    // claim whose bytes never become readable (a claimant died between
    // create and write on the exclusive-create fallback) must not spin
    // forever: after a second patience window, refuse loudly with the
    // repair (same stance as the dead manifest-slot claim).
    var tornSpins = 0L
    val tornCap = math.max(50L, TxnResolveWaitMs / 20L)
    while (decided.isEmpty) {
      if (putIfAbsent(ffs, p, "aborted".getBytes("UTF-8"))) decided = Some(false)
      else {
        decided = readFate()
        if (decided.isEmpty) {
          tornSpins += 1
          if (tornSpins > tornCap)
            throw new java.io.IOException(
              s"gpx txn fate $fateUri is claimed but unreadable (a " +
                "claimant died mid-write). No state was changed. Repair: " +
                s"verify no committer is alive, then delete $fateUri and " +
                "retry the read.")
          Thread.sleep(20) // claimed, bytes in flight
        }
      }
    }
    fateCache.put(fateUri, java.lang.Boolean.valueOf(decided.get))
    decided.get
  }

  /** A member-LOCAL copy of a txn's decided fate (`_txn_<id>.seal` in the
    * member's own log dir): the fate file proper lives in ONE member's
    * dir, and without a local copy a DROP/RENAME of that table would
    * dangle every other member's fate URI — a later cold reader would
    * wait out the patience window and abort-claim a transaction that
    * committed, flipping history. Seals are written by the committer
    * right after the fate is decided and by any reader that resolves a
    * fate (self-healing); a decision is unique per txn, so losing the
    * putIfAbsent race is benign. */
  private def sealLocal(fs: FileSystem, lp: Path, id: String,
      committed: Boolean): Unit = {
    val bytes = (if (committed) "committed" else "aborted").getBytes("UTF-8")
    try { putIfAbsent(fs, new Path(lp, s"_txn_$id.seal"), bytes); () }
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Resolve a member delta's txn marker: the member's own seal first
    * (survives the fate-hosting table's lifecycle), then the shared fate
    * file — and persist the answer as a local seal on the way out. */
  private def resolveFateFor(fs: FileSystem, lp: Path, id: String,
      fateUri: String): Boolean = {
    val sealP = new Path(lp, s"_txn_$id.seal")
    val sealKey = sealP.toString
    val cached = fateCache.get(sealKey)
    if (cached != null) return cached.booleanValue()
    val decided =
      readBytes(fs, sealP).map(b => new String(b, "UTF-8")) match {
        case Some(s) if s.startsWith("committed") => true
        case Some(s) if s.startsWith("aborted") => false
        case _ =>
          val viaFate = resolveFate(fateUri, fs.getConf)
          sealLocal(fs, lp, id, viaFate)
          viaFate
      }
    fateCache.put(sealKey, java.lang.Boolean.valueOf(decided))
    decided
  }

  /** Before a table dir is dropped or renamed, copy every DECIDED fate it
    * hosts to each member's own log dir as a local seal, so transactions
    * whose fate file lived here stay resolvable afterwards. Best-effort
    * per member (a member already dropped has no readers to protect). */
  def sealHostedFates(root: String, conf: Configuration): Unit = {
    val lp = logPath(root)
    val fs = lp.getFileSystem(conf)
    val hosted =
      try {
        if (!fs.exists(lp)) Array.empty[org.apache.hadoop.fs.FileStatus]
        else fs.listStatus(lp).filter { s =>
          val n = s.getPath.getName
          n.startsWith("_txn_") && n.endsWith(".fate")
        }
      } catch { case scala.util.control.NonFatal(_) => return }
    hosted.foreach { st =>
      val id = st.getPath.getName
        .stripPrefix("_txn_").stripSuffix(".fate")
      readBytes(fs, st.getPath).map(b => new String(b, "UTF-8")).foreach {
        txt =>
          val lines = txt.split("\n", -1)
          val committed = lines.head.startsWith("committed")
          lines.tail.filter(_.nonEmpty).foreach { memberLogDir =>
            val mp = new Path(memberLogDir)
            try sealLocal(mp.getFileSystem(conf), mp, id, committed)
            catch { case scala.util.control.NonFatal(_) => () }
          }
      }
    }
  }

  /** Materialize the snapshot at version v: read v's manifest; a full
    * snapshot returns directly, a delta recurses to its predecessor and
    * replays (recursion depth bounded by CheckpointInterval — every K-th
    * version and every overwrite is self-contained). A delta carrying a
    * txn marker applies only if its fate resolves committed; an aborted
    * member becomes a no-op version. Cold cost: one checkpoint + <= K-1
    * delta parses; warm cost: one cache hit. */
  private def readVersion(fs: FileSystem, lp: Path, v: Long,
      dirKey: String): Option[Snapshot] = {
    val key = (dirKey, v)
    val cached = parseCache.get(key)
    if (cached != null) return Some(cached)
    // a freshly-claimed slot on a non-atomic store can be momentarily
    // partial: retry briefly (the winner's write is a few KB), then give
    // up and let the caller fall back to the previous version.
    // EXCEPTION: a 0-byte slot past the fresh-claim window is a vacuum
    // TOMBSTONE — permanent by contract — so burning the patience loop
    // on it (~200 ms, re-paid per JVM since vacuum re-arms knownBad)
    // just stalls snapshotAt/time-travel/stale-listing recovery. One
    // stat on the first failure decides which case this is.
    var attempts = if (knownBad.contains(key)) 1 else 40
    var statted = false
    while (attempts > 0) {
      readBytes(fs, new Path(lp, manifestName(v))).flatMap(parse) match {
        case Some(Left(s)) if s.version == v =>
          parseCache.put(key, s)
          knownBad.remove(key)
          return Some(s)
        case Some(Right(d)) if d.version == v =>
          // valid delta bytes; resolution now depends on the predecessor
          // chain. An unresolvable predecessor (vacuumed away, or a dead
          // claim below us) is NOT this slot's fault — return without
          // marking the slot bad so a later repair resolves it.
          knownBad.remove(key)
          return readVersion(fs, lp, v - 1, dirKey).map { prev =>
            val applies = d.txn.forall { case (tid, fateUri) =>
              resolveFateFor(fs, lp, tid, fateUri) }
            val s = (if (applies) applyDelta(prev, d)
              else prev.copy(version = d.version)) // aborted txn: no-op slot
              .copy(chainDepth = prev.chainDepth + 1)
            parseCache.put(key, s)
            s
          }
        case _ =>
          attempts -= 1
          if (!statted) {
            statted = true
            try {
              val st = fs.getFileStatus(new Path(lp, manifestName(v)))
              if (st.getLen == 0 &&
                  System.currentTimeMillis() - st.getModificationTime > 10000L)
                attempts = 0 // conclusive tombstone, not an in-flight claim
            } catch { case _: java.io.IOException => () } // gone/hiccup: retry
          }
          if (attempts > 0) Thread.sleep(5)
      }
    }
    knownBad.add(key)
    None
  }

  /** current committed snapshot: one listing of `_commits/` + (cache-miss
    * only) one manifest read. None = not a log table / empty log. */
  def head(root: String, conf: Configuration): Option[Snapshot] = {
    headReads.incrementAndGet()
    val lp = logPath(root)
    val fs = lp.getFileSystem(conf)
    val dirKey = dirOf(root).toString
    // newest first; a corrupt head (killed writer that claimed a slot but
    // never finished the bytes on a non-atomic store) falls back one —
    // that slot stays claimed and dead, later commits build past it.
    //
    // An unresolvable NON-EMPTY listing must be RE-LISTED, not concluded
    // empty: a concurrent vacuum (racing appends advance the head, the
    // sweep keeps only versions committed AFTER we listed) can delete
    // every version of a stale listing, and treating that as "empty log"
    // reads a live table as EMPTY (silent row loss) and refuses first
    // commits (caught once by CrossProcessSpec's append+vacuum fuzz).
    // Convergence: resolved, or two consecutive IDENTICAL listings that
    // still resolve nothing (a genuinely dead/empty log — the pre-existing
    // fallback semantics); the iteration cap only backstops an adversarial
    // writer churning the listing forever.
    var prev: Seq[Long] = null
    var out: Option[Snapshot] = None
    var stable = false
    var guard = 0
    while (out.isEmpty && !stable && guard < 20) {
      guard += 1
      val vs = listVersions(fs, lp).sorted(Ordering[Long].reverse)
      out = vs.iterator.flatMap(v => readVersion(fs, lp, v, dirKey))
        .nextOption()
      // an EMPTY listing is conclusive (vacuum always retains the head,
      // so the race can never empty the dir) — no second listing
      stable = vs.isEmpty || (prev != null && vs == prev)
      prev = vs
    }
    out
  }

  /** snapshot at an exact version (time travel); None = never committed
    * or vacuumed away */
  def snapshotAt(root: String, version: Long,
      conf: Configuration): Option[Snapshot] = {
    val lp = logPath(root)
    readVersion(lp.getFileSystem(conf), lp, version, dirOf(root).toString)
  }

  /** head's live files as (absolute path, entry) — the log-mode listing
    * plus the per-file planning metadata */
  def liveEntries(root: String, conf: Configuration): Seq[(String, FileEntry)] = {
    val d = dirOf(root)
    val fs = d.getFileSystem(conf)
    val qd = fs.makeQualified(d).toString
    head(root, conf).map(_.live.map(e => (s"$qd/${e.relPath}", e)))
      .getOrElse(Seq.empty)
  }

  /** absolute paths of the head's live files (the log-mode listing) */
  def liveFiles(root: String, conf: Configuration): Seq[String] =
    liveEntries(root, conf).map(_._1)

  // ---------------- commit side ----------------

  private def putIfAbsent(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean =
    fs match {
      case cp: ConditionalPut => cp.putIfAbsent(p, bytes)
      case _ if fs.getScheme == "file" =>
        // RawLocalFileSystem.create(overwrite=false) is check-then-act —
        // two local committers could both "win" a slot. Claim with a
        // POSIX O_EXCL create instead (atomic), then write the bytes:
        // the same claim/content split HDFS has, but the claim itself
        // can no longer be won twice.
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        try {
          val parent = local.getParent
          if (parent != null) java.nio.file.Files.createDirectories(parent)
          java.nio.file.Files.createFile(local) // atomic exclusive claim
          java.nio.file.Files.write(local, bytes)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      case _ =>
        // HDFS-semantics stores: exclusive create IS a conditional put
        // (the namenode arbitrates the create atomically)
        try {
          val out = fs.create(p, false)
          try out.write(bytes) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
    }

  /** relative path of an absolute file under the table dir */
  def relOf(root: String, absPath: String, conf: Configuration): String = {
    val qd = GpxTable.qualifiedRoot(dirOf(root).toString, conf)
    val q = new Path(absPath).getFileSystem(conf)
      .makeQualified(new Path(absPath)).toString
    if (q.startsWith(qd)) q.drop(qd.length).stripPrefix("/") else q
  }

  /** manifest entry for a just-written data file, enriched with the
    * file-level zone maps merged from its footer (one cached footer read
    * per ADDED file — O(commit size), not O(table size)) */
  def entryFor(root: String, absPath: String, conf: Configuration): FileEntry = {
    val footer = GpxFileReader.FooterCache.get(absPath, conf)
    val len = GpxFs.stat(absPath, conf)
      .getOrElse(throw new java.io.FileNotFoundException(absPath)).len
    val rows = footer.rowGroups.map(_.numRows.toLong).sum
    val tss = footer.rowGroups.map(_.commitTs)
    val stats: Map[String, ChunkStats] =
      footer.schema.fieldNames.zipWithIndex.map { case (n, i) =>
        n -> footer.rowGroups.foldLeft(null: ChunkStats) { (acc, rg) =>
          val st = if (i < rg.chunks.length) rg.chunks(i).stats
            else ChunkStats.unreliable
          if (acc == null) st else ChunkStats.merge(acc, st)
        }
      }.filter(_._2 != null).toMap
    FileEntry(relOf(root, absPath, conf), len, rows,
      if (tss.isEmpty) -1L else tss.min, if (tss.isEmpty) -1L else tss.max,
      stats)
  }

  sealed trait Change
  /** plain append: commutes with everything, always rebases on conflict.
    * The optional specs only ever FILL an absent layout (first write to a
    * fresh log table); an established layout is never changed by append.
    * `schema` is the write's file schema — unioned into the table schema
    * under the tolerant-evolution rules (GpxTable.unionSchemas). */
  final case class Append(add: Seq[FileEntry],
      bucket: Option[GpxTable.BucketSpec] = None, sort: Seq[String] = Nil,
      range: Option[GpxTable.RangeSpec] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None) extends Change
  /** rewrite: adds replace the named still-live files; refuses loudly if a
    * concurrent commit already retired/rewrote any of them */
  final case class Replace(add: Seq[FileEntry], removeRel: Set[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None) extends Change
  /** overwrite: the new live set is exactly `add` (all current files
    * retire); layout specs and schema are REPLACED by the given ones */
  final case class Overwrite(add: Seq[FileEntry],
      bucket: Option[GpxTable.BucketSpec], sort: Seq[String],
      range: Option[GpxTable.RangeSpec],
      schema: Option[org.apache.spark.sql.types.StructType] = None) extends Change

  private def mergeSchemas(
      a: Option[org.apache.spark.sql.types.StructType],
      b: Option[org.apache.spark.sql.types.StructType])
      : Option[org.apache.spark.sql.types.StructType] = (a, b) match {
    case (Some(x), Some(y)) => Some(GpxTable.unionSchemas(x, y))
    case _ => a.orElse(b)
  }

  /** Commit a change: claim the next version slot with one conditional
    * put. Lost races re-read the head and rebase (appends, replaces whose
    * sources are still live) or throw `ConcurrentModificationException`
    * (replace sources rewritten underneath — retrying would duplicate or
    * lose rows). Returns the committed version. */
  def commit(root: String, conf: Configuration, change: Change,
      forceFull: Boolean = false,
      txn: Option[(String, String)] = None): Long = {
    require(txn.isEmpty || !change.isInstanceOf[Overwrite],
      "multi-table transactions support Append/Replace members only " +
        "(an overwrite would serialize as an unconditional full snapshot)")
    val lp = logPath(root)
    val fs = lp.getFileSystem(conf)
    if (!fs.exists(lp)) fs.mkdirs(lp)
    // NOTE: the positive logTableCache mark happens only after a slot is
    // WON (below) — a bare dir with no manifest is not a log table yet,
    // and marking it early would let a crash between here and the first
    // win flip the protocol with an empty head (every pre-existing file
    // invisible and vacuum-eligible, with enable() unable to re-seed)
    var attempts = 200
    var lastBase = -1L
    var sameBase = 0
    var guardedSeed = false
    // the added files the liveness re-check verifies on every retry
    // (None until the first retry — the happy path never stats; from the
    // first retry on, EVERY added file must be present on disk)
    var verifyAdds: Option[Set[String]] = None
    var firstAttempt = true
    while (attempts > 0) {
      attempts -= 1
      val h = head(root, conf)
      // a non-Overwrite FIRST commit on a dir that already holds data
      // files would orphan them (v1 would be built from an empty
      // predecessor): every internal path seeds via enable() first, so
      // this only fires on a protocol bug or a crashed half-enabled
      // state — refuse with the repair rather than silently losing files
      if (h.isEmpty && !change.isInstanceOf[Overwrite] && !guardedSeed) {
        guardedSeed = true
        val d = dirOf(root)
        val preExisting = try {
          fs.exists(d) && fs.listStatus(d).exists { st =>
            val n = st.getPath.getName
            n.endsWith(".gpx") && !n.startsWith("_") && !n.startsWith(".")
          }
        } catch { case scala.util.control.NonFatal(_) => false }
        if (preExisting) throw new IllegalStateException(
          s"gpx log commit refused: first manifest for $d would be an " +
            "append/replace, but the directory already holds data files " +
            "that a delta-seeded log would orphan. Seed the log first " +
            "(GpxCommitLog.enable) so the existing files carry over.")
      }
      val base = h.map(_.version).getOrElse(0L)
      // a head that does not advance while our claims keep losing means
      // the next slot is claimed by unreadable bytes — a dead (or stalled)
      // writer. Stop burning the retry budget and refuse with the repair.
      // generous threshold: a SLOW writer mid-upload looks identical to a
      // dead one from here, and the refusal message advises deleting its
      // slot — misdiagnosing an alive writer must be hard to do
      if (base == lastBase) { sameBase += 1; if (sameBase >= 25) attempts = 0 }
      else { lastBase = base; sameBase = 0 }
      val next = change match {
        case Append(add, b, s, r, sc) =>
          val prev = h.getOrElse(Snapshot(0L, None, None, Nil, None, Vector.empty))
          prev.copy(version = base + 1, live = prev.live ++ add,
            bucket = prev.bucket.orElse(b),
            sort = if (prev.sort.nonEmpty) prev.sort else s,
            range = prev.range.orElse(r),
            schema = mergeSchemas(prev.schema, sc))
        case Replace(add, removeRel, sc) =>
          val prev = h.getOrElse(Snapshot(0L, None, None, Nil, None, Vector.empty))
          val liveSet = prev.relPaths
          val gone = removeRel.filterNot(liveSet.contains)
          if (gone.nonEmpty)
            throw new java.util.ConcurrentModificationException(
              s"gpx log commit refused: ${gone.size} source file(s) this " +
              s"rewrite consumed are no longer live at version $base " +
              s"(${gone.take(3).mkString(", ")}…) — a concurrent mutation " +
              "rewrote them; committing would duplicate or lose rows. " +
              "Retry the operation.")
          prev.copy(version = base + 1,
            live = prev.live.filterNot(e => removeRel.contains(e.relPath)) ++ add,
            schema = mergeSchemas(prev.schema, sc))
        case Overwrite(add, b, s, r, sc) =>
          Snapshot(base + 1, sc, b, s, r, add.toVector)
      }
      // O(commit) manifest bytes: appends/replaces persist only their
      // CHANGE; overwrites, every CheckpointInterval-th version, and any
      // commit whose predecessor chain has grown to CheckpointInterval
      // deltas (txn members skip the cadence, so version % K alone would
      // never fire on a txn-heavy table) write the full self-contained
      // snapshot that bounds cold head resolution
      // txn members must stay CONDITIONAL deltas (a full snapshot would
      // bake the pending change in unconditionally); commitAtomic
      // checkpoints them AFTER the fate is decided
      // h.isEmpty: the FIRST manifest must be self-contained — a v1 delta
      // has no predecessor to replay onto and can never materialize
      val plainFull = forceFull || h.isEmpty ||
        next.version % CheckpointInterval == 0 ||
        h.exists(_.chainDepth >= CheckpointInterval - 1)
      if (txn.isDefined && h.isEmpty)
        throw new IllegalStateException(
          s"gpx txn member $root has no committed head — a v1 txn delta " +
            "would be unmaterializable; seed the log first " +
            "(commitAtomic enables members before committing)")
      val bytes = change match {
        case _: Overwrite => serialize(next)
        case _ if txn.isDefined =>
          serializeDelta(change match {
            case Append(add, b, s, r, sc) => Delta(next.version,
              isReplace = false, add.toVector, Set.empty, b, s, r, sc, txn)
            case Replace(add, removeRel, sc) => Delta(next.version,
              isReplace = true, add.toVector, removeRel, None, Nil, None,
              sc, txn)
            case _: Overwrite => throw new IllegalStateException("unreachable")
          })
        case _ if plainFull => serialize(next)
        case Append(add, b, s, r, sc) =>
          serializeDelta(Delta(next.version, isReplace = false,
            add.toVector, Set.empty, b, s, r, sc))
        case Replace(add, removeRel, sc) =>
          serializeDelta(Delta(next.version, isReplace = true,
            add.toVector, removeRel, None, Nil, None, sc))
      }
      // staged-file liveness re-check across the retry loop: vacuum
      // sweeps ANY unreferenced .gpx past its staging grace, so a writer
      // whose stage-to-commit latency exceeded that grace (contention,
      // GC, CPU starvation — or a grace misconfigured below commit
      // latency) may be about to publish entries for files that no
      // longer exist. A dangling reference is SILENT until some later
      // read trips FileNotFound — fail the commit loudly instead so the
      // writer re-stages and retries (CrossProcessSpec's append+vacuum
      // fuzz hit exactly this under host load). The log layer stays
      // metadata-only for entries that never existed: files ABSENT at
      // the first attempt are synthetic (tests, catalog seeds) and stay
      // unverified; files seen ONCE must stay present through every
      // retry. Overwrites skip entirely (snapshot-level metadata ops —
      // and a 10k-entry seed must not pay 10k stats). A logDefer-staged
      // file swept BEFORE this commit's first attempt is
      // indistinguishable from a synthetic entry and stays TTL-guarded
      // only (stage close to commit, or raise the grace). The stat-to-put
      // window remains (microseconds vs the whole retry loop), so the
      // hard guarantee is still the vacuum grace TTL — this check makes
      // a violated TTL overwhelmingly loud instead of silent.
      // LAZY: stats run only when a retry actually happens (first
      // re-entry of the loop) — an N-file append whose first putIfAbsent
      // wins pays ZERO extra exists() round-trips, which matters
      // per-commit on object storage. On the first retry, a file ALREADY
      // missing refuses loudly right away (it may have been swept during
      // attempt 1 — building a tolerant baseline here would silently
      // reopen exactly the dangling-reference window this check closes,
      // and is STRICTER than the old eager baseline, which tolerated
      // pre-attempt-1 sweeps). The cost: synthetic never-on-disk entries
      // (tests, catalog seeds) are only tolerated on single-attempt
      // commits — contended synthetic commits must stage real bytes.
      // explicit opt-out (`graft.gpx.commitLivenessCheck=false`, Hadoop
      // or Spark conf) for callers that COMMIT entries whose bytes never
      // exist on disk (metadata-only mirrors, external-file catalogs):
      // without it, such a commit fails permanently the first time it is
      // CONTENDED — a contention-only failure mode that would be
      // near-impossible to reproduce when first hit in production. Every
      // internal writer stages real bytes and keeps the check on.
      // tolerant parse: only a literal "false" opts out. `.toBoolean`
      // would turn a typo ("no", "0") into an IllegalArgumentException
      // thrown from INSIDE the contended retry path — the worst place to
      // learn a conf value is malformed — while this keeps the check ON
      // for anything that isn't an unambiguous opt-out.
      val livenessCheckOn =
        Option(conf.get("graft.gpx.commitLivenessCheck"))
          .orElse(org.apache.spark.sql.SparkSession.getActiveSession
            .flatMap(_.conf.getOption("spark.graft.gpx.commitLivenessCheck")))
          .forall(v => !v.trim.equalsIgnoreCase("false"))
      if (!change.isInstanceOf[Overwrite] && !firstAttempt && livenessCheckOn) {
        val d0 = dirOf(root)
        val addedRel = change match {
          case Append(add, _, _, _, _) => add.map(_.relPath)
          case Replace(add, _, _) => add.map(_.relPath)
          case _ => Nil
        }
        val toCheck = verifyAdds.getOrElse(addedRel.toSet)
        toCheck.foreach { rel =>
          if (!GpxFs.exists(new Path(d0, rel).toString, conf))
            throw new java.io.FileNotFoundException(
              s"gpx log commit refused: staged file $rel is missing " +
                "while the commit retries (vacuum staging grace below " +
                "this writer's stage-to-commit latency? a synthetic " +
                "entry on a contended table?) — re-stage and retry")
        }
        if (verifyAdds.isEmpty) verifyAdds = Some(toCheck)
      }
      if (putIfAbsent(fs, new Path(lp, manifestName(next.version)), bytes)) {
        manifestBytesWritten.addAndGet(bytes.length.toLong)
        // the log now has a committed manifest: presence is positively sticky
        logTableCache.put(dirOf(root).toString, Long.MaxValue)
        // a pending txn member must NOT cache its applied state — readers
        // (this JVM included) materialize it through fate resolution
        if (txn.isEmpty) {
          val isFull = change.isInstanceOf[Overwrite] || plainFull
          parseCache.put((dirOf(root).toString, next.version),
            next.copy(chainDepth =
              if (isFull) 0 else h.map(_.chainDepth).getOrElse(0) + 1))
        }
        // an OVERWRITE replaces the table's contents — a buffered
        // memtable tail is part of those contents and must die with
        // them (it would otherwise be re-served on top of the truncated
        // table and APPENDED back by the next flush)
        if (change.isInstanceOf[Overwrite]) GpxMemTable.clear(root)
        return next.version
      }
      // lost the slot: back off a touch and rebase on the new head
      firstAttempt = false
      Thread.sleep(2 + scala.util.Random.nextInt(8))
    }
    // Attempts exhausted. Distinguish livelock-by-contention from a DEAD
    // CLAIM: a writer that claimed the next slot and died before its bytes
    // became readable. We deliberately never skip past such a slot — on
    // the exclusive-create fallback (local/HDFS) the claim and its content
    // are two steps, so a stalled-but-alive writer could still complete
    // it, and building past it would erase its commit. Refusing loudly
    // with the repair path is the safe floor; true conditional-put stores
    // (S3/GCS/Azure) make claim+content one atomic PUT, so a dead claim
    // is a COMPLETE manifest there and this branch cannot trigger.
    val headV = head(root, conf).map(_.version).getOrElse(0L)
    val blocked = new Path(lp, manifestName(headV + 1))
    val deadClaim = try fs.exists(blocked) catch { case _: Throwable => false }
    throw new java.io.IOException(
      if (deadClaim)
        s"gpx log commit: version slot ${headV + 1} under $lp is claimed " +
        "but unreadable (a writer died mid-commit). No state was changed. " +
        s"Repair: verify no writer is alive, then delete $blocked and retry."
      else
        s"gpx log commit: could not claim a version slot after 200 attempts " +
        s"under $lp — pathological contention; no state was changed")
  }

  /** Opt a table into the log protocol: seed v1 from the current
    * listing-visible state (idempotent — an existing log is left alone).
    * From then on, listings stop being authoritative; writers commit
    * through the log and readers resolve it. */
  def enable(root: String, conf: Configuration): Long = {
    val lp = logPath(root)
    val fs = lp.getFileSystem(conf)
    if (fs.exists(lp)) {
      // a dir WITH a committed head is an enabled log — leave it alone.
      // A bare dir with no manifest (a writer crashed between creating
      // the dir and winning its first slot) is NOT: fall through and
      // seed it, or the table would stay half-enabled forever.
      head(root, conf) match {
        case Some(h) => return h.version
        case None => ()
      }
    }
    val d = dirOf(root)
    if (!fs.exists(d)) fs.mkdirs(d)
    val files = GpxTable.listFiles(Seq(root), conf)
    val entries = files.map(f => entryFor(root, f, conf))
    val schema = files.sorted
      .map(GpxFileReader.FooterCache.get(_, conf).schema)
      .reduceOption(GpxTable.unionSchemas)
    commit(root, conf, Overwrite(entries,
      GpxTable.readBucketSpec(d.toString, conf),
      GpxTable.readSortSpec(d.toString, conf),
      GpxTable.readRangeSpec(d.toString, conf),
      schema))
  }

  /** Commit N tables' changes ATOMICALLY: a reader can observe all
    * members or none, never a subset — the reference's central commit
    * timestamp for cross-table writes (proto/transaction.proto:33-48)
    * rebuilt on the conditional-put primitive, no daemon required.
    *
    * Protocol: (1) each member commits its manifest delta carrying a
    * pending `txn` marker — invisible, because materialization applies a
    * pending delta only after resolving the txn's FATE file; (2) once
    * every member manifest landed, ONE conditional put writes the fate
    * ("committed"). A crash anywhere before the fate put leaves the txn
    * in-doubt; the first reader/writer that needs the state waits out
    * [[TxnResolveWaitMs]] and claims the abort with the same conditional
    * put — exactly one of {committer, aborter} wins the slot, so every
    * observer converges. Aborted members become no-op versions; their
    * data files are orphans for vacuum.
    *
    * A member whose Replace sources were rewritten concurrently refuses
    * (ConcurrentModificationException); the whole transaction then aborts
    * via the fate file before rethrowing — members already committed are
    * never left in doubt. Fate files are small, immutable once decided,
    * and NEVER garbage-collected (a live manifest may reference one
    * indefinitely; resurrecting a deleted fate as "aborted" would flip
    * history). Returns the txn id. */
  def commitAtomic(conf: Configuration,
      members: Seq[(String, Change)]): String = {
    require(members.nonEmpty, "empty transaction")
    // dedupe on QUALIFIED dirs: "/data/t" and "file:/data/t" are one
    // table, and a double member would apply its delta twice
    require(members.map(m =>
      GpxTable.qualifiedRoot(dirOf(m._1).toString, conf)).distinct.size ==
      members.size, "one member per table")
    // seed any never-written member now (idempotent): its txn delta needs
    // a committed predecessor to replay onto
    members.foreach(m => enable(m._1, conf))
    val id = java.util.UUID.randomUUID().toString
    val fateP0 = new Path(logPath(members.head._1), s"_txn_$id.fate")
    val ffs = fateP0.getFileSystem(conf)
    val fateP = ffs.makeQualified(fateP0)
    val fateUri = fateP.toString
    if (!ffs.exists(fateP.getParent)) ffs.mkdirs(fateP.getParent)
    // the verdict line is followed by every member's log dir, so a later
    // DROP/RENAME of the fate-hosting table can re-home the decision
    // (sealHostedFates) instead of dangling the other members' fate URIs
    val memberDirs = members.map(m => logPath(m._1).toString)
    def fateBody(verdict: String): Array[Byte] =
      (verdict + "\n" + memberDirs.mkString("\n")).getBytes("UTF-8")
    try {
      members.foreach { case (root, change) =>
        commit(root, conf, change, txn = Some((id, fateUri)))
      }
    } catch {
      case e: Throwable =>
        // decide the fate DOWN before surfacing: members already
        // committed must die now, not linger in doubt for readers
        try { putIfAbsent(ffs, fateP, fateBody("aborted")); () }
        catch { case _: Throwable => () }
        fateCache.put(fateUri, java.lang.Boolean.FALSE)
        sealMembers(conf, memberDirs, id, committed = false)
        throw e
    }
    if (!putIfAbsent(ffs, fateP, fateBody("committed"))) {
      fateCache.put(fateUri, java.lang.Boolean.FALSE)
      sealMembers(conf, memberDirs, id, committed = false)
      throw new java.util.ConcurrentModificationException(
        s"gpx txn $id aborted: a concurrent reader declared it dead " +
          s"before the fate was sealed (patience $TxnResolveWaitMs ms) — " +
          "no member change is visible. Retry the transaction.")
    }
    fateCache.put(fateUri, java.lang.Boolean.TRUE)
    // eagerly close the fate's single-point-of-failure window: every
    // member gets its local seal NOW, not at first read
    sealMembers(conf, memberDirs, id, committed = true)
    // txn members skip the checkpoint cadence (a full snapshot would bake
    // the undecided change in unconditionally) — so a txn-heavy table
    // checkpoints HERE, after the fate is decided, once its delta chain
    // is due. Best-effort: readers stay correct either way, just slower.
    members.foreach { case (root, _) =>
      try head(root, conf).foreach { h =>
        if (h.chainDepth >= CheckpointInterval) {
          commit(root, conf, Append(Seq.empty), forceFull = true); ()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    id
  }

  private def sealMembers(conf: Configuration, memberLogDirs: Seq[String],
      id: String, committed: Boolean): Unit =
    memberLogDirs.foreach { d =>
      val p = new Path(d)
      try sealLocal(p.getFileSystem(conf), p, id, committed)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Reclaim retired bytes: delete data files referenced by NO manifest
    * among the newest `keepVersions`, then drop the older manifests.
    * Readers of retained versions are unaffected; readers pinned further
    * back fail loudly (file not found), the documented retention trade.
    * `minAgeMs` protects IN-FLIGHT commits: a writer that has published
    * its data files but not yet claimed its manifest slot looks exactly
    * like an orphan — only files older than the window are reclaimed
    * (no batch write publishes for an hour; raise it if yours do).
    * Defaults (minAgeMs < 0) to the [[vacuumGraceMs]] config surface,
    * which cross-validates against the lock TTL; an explicit value is
    * the caller's own liveness claim (tests race below it on purpose). */
  def vacuum(root: String, conf: Configuration,
      keepVersions: Int = 2,
      minAgeMs: Long = -1L): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the head")
    val stagingGraceMs = if (minAgeMs >= 0) minAgeMs else vacuumGraceMs(conf)
    val tombGraceMs = tombstoneGraceMs(conf)
    val lp = logPath(root)
    val fs = lp.getFileSystem(conf)
    def isSelfContained(v: Long): Boolean =
      readBytes(fs, new Path(lp, manifestName(v))).flatMap(parse) match {
        case Some(Left(_)) => true
        case _ => false
      }
    // make the newest retained version self-contained first: without a
    // checkpoint at (or near) the head, the keep-set would have to extend
    // down to the last full snapshot and the sweep could not converge the
    // disk to the live set. Best-effort — a blocked commit (dead claim)
    // falls back to the extension rule below, which retains more but
    // stays correct.
    head(root, conf).foreach { h =>
      if (!isSelfContained(h.version))
        try { commit(root, conf, Append(Seq.empty), forceFull = true); () }
        catch { case scala.util.control.NonFatal(_) => () }
    }
    val versions = listVersions(fs, lp).sorted(Ordering[Long].reverse)
    if (versions.isEmpty) return (0, 0)
    val dirKey = dirOf(root).toString
    val keep0 = versions.take(keepVersions)
    // a retained DELTA version only materializes through its predecessor
    // chain: extend the keep-set below the oldest retained version down
    // to (and including) the nearest self-contained full snapshot, so
    // every retained version stays resolvable after the sweep. Bounded by
    // CheckpointInterval extra manifests.
    val extra = Vector.newBuilder[Long]
    if (keep0.nonEmpty && !isSelfContained(keep0.last)) {
      val it = versions.drop(keepVersions).iterator
      var done = false
      while (it.hasNext && !done) {
        val v = it.next()
        extra += v
        if (isSelfContained(v)) done = true
      }
    }
    val keep = keep0 ++ extra.result()
    val keepSet = keep.toSet
    val reachable: Set[String] = keep.flatMap(v =>
      readVersion(fs, lp, v, dirKey).toSeq.flatMap(_.relPaths)).toSet
    val d = dirOf(root)
    val qd = fs.makeQualified(d).toString
    // physical .gpx files under the table dir not reachable from any
    // retained manifest — orphans from aborted/lost commits included
    val all = GpxFs.listRecursive(d.toString, conf).collect {
      case (full, true) if full.endsWith(".gpx") &&
        !full.drop(qd.length).stripPrefix("/").split('/')
          .exists(s => s.startsWith("_") || s.startsWith(".")) => full
    }
    val cutoff = System.currentTimeMillis() - stagingGraceMs
    var dataDeleted = 0
    all.foreach { f =>
      val rel = if (f.startsWith(qd)) f.drop(qd.length).stripPrefix("/") else f
      if (!reachable.contains(rel) &&
        GpxFs.stat(f, conf).forall(_.mtime <= cutoff)) {
        if (try fs.delete(new Path(f), false) catch { case _: Throwable => false }) {
          dataDeleted += 1
          if (sys.props.contains("graft.debug.vacuum"))
            System.err.println(s"[vacuum] deleted data $f keep=$keep " +
              s"t=${System.currentTimeMillis()}")
        }
      }
    }
    var mfDeleted = 0
    versions.filterNot(keepSet.contains).foreach { v =>
      val mp = new Path(lp, manifestName(v))
      // TOMBSTONE, do not delete: a deleted slot file REOPENS the slot
      // for putIfAbsent, and a committer holding a stale resolved head
      // (a cold first head() under contention takes seconds) can then
      // WIN the reopened slot and commit into a version below the keep
      // horizon that no reader will ever materialize — a silently lost
      // commit (caught live by CrossProcessSpec's append+vacuum fuzz:
      // writer A committed v4, vacuum deleted v4's manifest 176 ms
      // later, writer B "won" slot 4 with a base of 3 while the head
      // was at 16). A 0-byte truncate keeps the claim occupied forever
      // — the stale committer's exclusive create fails and it rebases
      // onto the real head — while readers treat it exactly like a
      // vacuumed version (unparseable -> "vacuumed away"). Tombstones
      // are reclaimed fully only once older than a 1 h grace: a
      // committer stalled longer than that between resolving its base
      // and claiming is the same liveness boundary the mutation-lock
      // and claim-steal TTLs already assume.
      val swept = GpxFs.stat(mp.toString, conf) match {
        case Some(st) if st.len == 0 =>
          // already a tombstone: reclaim after the grace, never recount
          if (System.currentTimeMillis() - st.mtime > tombGraceMs) {
            try { fs.delete(mp, false); () } catch { case _: Throwable => () }
          }
          false
        case Some(_) =>
          try { fs.create(mp, true).close(); true }
          catch { case _: Throwable => false }
        case None => false
      }
      if (swept) {
        mfDeleted += 1
        // a vacuumed version must fail loudly ("no such manifest
        // version") in THIS JVM too — a warm parseCache hit would serve
        // the snapshot until its data files 404 with a confusing error.
        // knownBad is ADDED, not cleared: a tombstone is permanently
        // unreadable, so later readVersion calls should pay one attempt,
        // not the fresh-claim patience loop. BOUNDED: a long-lived JVM
        // vacuuming a busy table would otherwise add one entry per swept
        // version forever — past the cap, clear and let genuinely-bad
        // slots re-pay one patience loop each (correctness never depends
        // on the marker; the tombstone stat fast-path caps the cost too).
        parseCache.remove((dirKey, v))
        if (knownBad.size > 4096) knownBad.clear()
        knownBad.add((dirKey, v))
        ()
      }
    }
    (dataDeleted, mfDeleted)
  }

  // -------- deferred commits (compound ops: rewrite = append + retire) --

  /** A compound mutation (COW DELETE: append survivors THEN retire
    * originals) must land as ONE manifest commit, or readers between the
    * two would see duplicated rows. The inner append defers: it registers
    * its files here under a caller-chosen token instead of committing, and
    * the outer operation drains the token into its single Replace. */
  private val pending = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentLinkedQueue[String]]()

  def deferAdd(token: String, absPaths: Seq[String]): Unit = {
    val q = pending.computeIfAbsent(token,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
    absPaths.foreach(q.add)
  }

  def drainDeferred(token: String): Seq[String] = {
    val q = pending.remove(token)
    if (q == null) Seq.empty
    else { val b = Seq.newBuilder[String]; q.forEach(p => b += p); b.result() }
  }
}
