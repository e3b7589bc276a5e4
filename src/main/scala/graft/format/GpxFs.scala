package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.nio.file.{Files, Paths, Path => JPath}

/** Filesystem METADATA fast path.
  *
  * Hadoop's RawLocalFileSystem materializes FileStatus permission bits by
  * forking `ls -ld` per file, so listing or stat-ing a table of N files
  * costs N subprocess forks — a multi-second planning tax that lands on
  * every query (the data-plane reads were already fork-free; only metadata
  * suffers). For `file:` paths we serve existence, length, mtime and
  * recursive listings straight from java.nio. Any other scheme (hdfs://,
  * s3a://) falls through to the Hadoop FileSystem, whose metadata comes
  * from the namenode / object listing and never forks — so the fast path
  * changes nothing about cluster deployments, it only removes a local-FS
  * pathology.
  *
  * Path strings stay in Hadoop's own rendering (`file:/abs/path`) so
  * callers can mix fast-path and Hadoop-path results freely.
  */
object GpxFs {

  final case class Stat(len: Long, mtime: Long, isFile: Boolean)

  /** local java.nio path for `file:`/schemeless strings; None for real
    * remote schemes (falls back to Hadoop). `file://host/p` carries an
    * AUTHORITY: naive prefix-stripping would resolve `host/p` relative to
    * the cwd and silently report an existing table absent — only an
    * empty/localhost authority is local; anything else goes to Hadoop. */
  private def local(s: String): Option[JPath] =
    try {
      if (s.startsWith("file:")) {
        val rest = s.stripPrefix("file:")
        if (!rest.startsWith("//")) Some(Paths.get(rest))
        else {
          val body = rest.stripPrefix("//")
          val slash = body.indexOf('/')
          val authority = if (slash < 0) body else body.substring(0, slash)
          if (authority.isEmpty || authority == "localhost")
            Some(Paths.get(if (slash < 0) "/" else body.substring(slash)))
          else None // foreign authority: let Hadoop resolve it
        }
      } else if (!s.contains(":")) Some(Paths.get(s))
      else None
    } catch { case _: Exception => None }

  private def qualify(p: JPath): String = "file:" + p.toAbsolutePath

  def stat(path: String, conf: Configuration): Option[Stat] =
    local(path) match {
      case Some(jp) =>
        // ONE readAttributes call, vanish-tolerant: exists-then-size has
        // a TOCTOU window (tmp+rename publishes and vacuums delete files
        // concurrently with list-then-stat walks), and it also collapses
        // several syscalls per stat on this metadata fast path
        try {
          val attrs = Files.readAttributes(jp,
            classOf[java.nio.file.attribute.BasicFileAttributes])
          Some(Stat(if (attrs.isDirectory) 0L else attrs.size(),
            attrs.lastModifiedTime().toMillis, attrs.isRegularFile))
        } catch {
          // FileSystemException covers NoSuchFile, NotDirectory (a probe
          // like <data.gpx>/_index where a path component is a FILE) and
          // AccessDenied — all of which Files.exists reported as absent
          case _: java.nio.file.FileSystemException => None
          case _: java.io.FileNotFoundException => None
        }
      case None =>
        val hp = new Path(path)
        val fs = hp.getFileSystem(conf)
        try {
          val st = fs.getFileStatus(hp) // one RPC; FNFE = absent
          Some(Stat(st.getLen, st.getModificationTime, st.isFile))
        } catch { case _: java.io.FileNotFoundException => None }
    }

  def exists(path: String, conf: Configuration): Boolean =
    stat(path, conf).isDefined

  /** Recursive file listing rendered as qualified path strings (Hadoop
    * convention), in no particular order.
    *
    * MUST tolerate entries vanishing mid-walk: version-token bumps and
    * lock handoffs publish via tmp-file + rename, so a concurrent lister
    * can see `._version.<uuid>` in the directory listing and find it gone
    * by the stat — `Files.walk` then kills the whole walk with an
    * UncheckedIOException (observed killing a streaming tail query).
    * `walkFileTree` with a CONTINUE-on-failure visitor skips exactly the
    * vanished entry instead. */
  def listRecursive(root: String, conf: Configuration): Seq[(String, Boolean)] =
    local(root) match {
      case Some(jp) =>
        if (!Files.exists(jp)) Seq.empty
        else {
          val out = Seq.newBuilder[(String, Boolean)]
          Files.walkFileTree(jp, new java.nio.file.SimpleFileVisitor[JPath] {
            override def visitFile(p: JPath,
                attrs: java.nio.file.attribute.BasicFileAttributes)
                : java.nio.file.FileVisitResult = {
              if (!attrs.isDirectory) out += ((qualify(p), true))
              java.nio.file.FileVisitResult.CONTINUE
            }
            override def visitFileFailed(p: JPath, e: java.io.IOException)
                : java.nio.file.FileVisitResult =
              java.nio.file.FileVisitResult.CONTINUE // vanished mid-walk
          })
          out.result()
        }
      case None =>
        val hp = new Path(root)
        val fs = hp.getFileSystem(conf)
        if (!fs.exists(hp)) Seq.empty
        else {
          // remote listings can also race a rename (FileNotFound from a
          // paged list) — retry the whole walk a couple of times
          var attempts = 3
          while (true) {
            try {
              val it = fs.listFiles(hp, true)
              val out = Seq.newBuilder[(String, Boolean)]
              while (it.hasNext) {
                val s = it.next()
                out += ((s.getPath.toString, s.isFile))
              }
              return out.result()
            } catch {
              case e: java.io.FileNotFoundException =>
                attempts -= 1
                if (attempts <= 0) throw e
            }
          }
          Seq.empty // unreachable
        }
    }
}
