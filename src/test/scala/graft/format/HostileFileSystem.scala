package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import java.net.URI

/** Object-store semantics simulator (registered under `hostile://` via
  * META-INF/services): the filesystem a cloud deployment actually gives
  * you, with the two guarantees HDFS-reared code silently leans on REMOVED —
  *
  *  - `rename` is COPY + DELETE: non-atomic, a concurrent reader can
  *    observe the half-copied destination or both files at once, exactly
  *    like S3 "rename" (which is CopyObject + DeleteObject);
  *  - `create(..., overwrite = false)` is LAST-WRITER-WINS: the exclusive-
  *    create contract does not hold (a plain object PUT), so advisory
  *    lock files and "atomic" token publishes stop excluding anyone.
  *
  * The ONE atomic primitive it provides is [[GpxCommitLog.ConditionalPut]]
  * — all-or-nothing put-if-absent, the semantics of S3 `If-None-Match: *`
  * / GCS `x-goog-if-generation-match: 0` — implemented under a JVM-global
  * lock standing in for the store's server-side atomicity. The commit-log
  * protocol must survive (or refuse loudly) on THIS filesystem; anything
  * that only works on `file://` is HDFS-only by definition.
  *
  * Implemented as a delegating wrapper over RawLocalFileSystem (paths
  * re-qualified both ways) rather than a subclass: RawLocal's FileStatus
  * lazily forks `ls` on `file:` URIs and breaks on any other scheme.
  */
class HostileFileSystem extends FileSystem with GpxCommitLog.ConditionalPut {

  private val local = new RawLocalFileSystem()
  private var uri: URI = URI.create("hostile:///")
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    local.initialize(URI.create("file:///"), conf)
    uri = URI.create(s"hostile://${Option(name.getAuthority).getOrElse("")}/")
    workDir = hostile(new Path(System.getProperty("user.dir")))
  }

  override def getScheme: String = "hostile"
  override def getUri: URI = uri

  private def toLocal(p: Path): Path = new Path(p.toUri.getPath)
  private def hostile(p: Path): Path =
    new Path("hostile", uri.getAuthority, p.toUri.getPath)

  /** plain status copy with synthesized permissions: never forks, never
    * re-resolves the (hostile) path against the local FS */
  private def requal(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "test", "test", hostile(st.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    // injected per-open latency (HostileFileSystem.readLatencyMs): the
    // first-byte cost of a remote GET, so cache layers can be proven to
    // absorb store latency rather than just asserted to
    val lat = HostileFileSystem.readLatencyMs.get
    if (lat > 0) Thread.sleep(lat)
    HostileFileSystem.opens.incrementAndGet()
    local.open(toLocal(f), bufferSize)
  }

  /** overwrite=false is silently ignored — last writer wins (object PUT) */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, true, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException("hostile store: no append")

  /** copy+delete with a visible (partially-written) intermediate state */
  override def rename(src: Path, dst: Path): Boolean = {
    try {
      val ls = toLocal(src); val ld = toLocal(dst)
      if (!local.exists(ls)) return false
      if (local.getFileStatus(ls).isDirectory) {
        local.mkdirs(ld)
        val ok = local.listStatus(ls).forall(c =>
          rename(hostile(c.getPath), new Path(dst, c.getPath.getName)))
        ok && local.delete(ls, true)
      } else {
        val in = local.open(ls)
        try {
          // destination becomes visible DURING the copy — the
          // non-atomicity under test
          val out = local.create(ld, true)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally out.close()
        } finally in.close()
        local.delete(ls, false)
      }
    } catch { case _: java.io.IOException => false }
  }

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(requal)

  override def getFileStatus(f: Path): FileStatus =
    requal(local.getFileStatus(toLocal(f)))

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def setWorkingDirectory(d: Path): Unit = workDir = d
  override def getWorkingDirectory: Path = workDir

  /** the store's server-side conditional put: atomic existence check +
    * all-or-nothing content publish */
  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean =
    HostileFileSystem.casLock.synchronized {
      val lp = toLocal(path)
      if (local.exists(lp)) false
      else {
        val parent = lp.getParent
        if (parent != null) local.mkdirs(parent)
        val out = local.create(lp, false)
        try out.write(bytes) finally out.close()
        true
      }
    }
}

object HostileFileSystem {
  /** stands in for the object store's server-side linearization point */
  val casLock = new Object

  /** per-open() injected latency (ms) — the first-byte cost of a remote
    * GET; 0 disables. Static because Hadoop constructs FS instances. */
  val readLatencyMs = new java.util.concurrent.atomic.AtomicLong(0)

  /** total open() calls — "how many GETs did that operation issue" */
  val opens = new java.util.concurrent.atomic.AtomicLong(0)
}
