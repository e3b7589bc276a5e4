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
    * remote schemes (falls back to Hadoop) */
  private def local(s: String): Option[JPath] =
    try {
      if (s.startsWith("file:")) {
        val p = s.stripPrefix("file:")
        Some(Paths.get(if (p.startsWith("//")) p.stripPrefix("//") else p))
      } else if (!s.contains(":")) Some(Paths.get(s))
      else None
    } catch { case _: Exception => None }

  private def qualify(p: JPath): String = "file:" + p.toAbsolutePath

  def stat(path: String, conf: Configuration): Option[Stat] =
    local(path) match {
      case Some(jp) =>
        if (!Files.exists(jp)) None
        else Some(Stat(if (Files.isDirectory(jp)) 0L else Files.size(jp),
          Files.getLastModifiedTime(jp).toMillis, Files.isRegularFile(jp)))
      case None =>
        val hp = new Path(path)
        val fs = hp.getFileSystem(conf)
        if (!fs.exists(hp)) None
        else {
          val st = fs.getFileStatus(hp)
          Some(Stat(st.getLen, st.getModificationTime, st.isFile))
        }
    }

  def exists(path: String, conf: Configuration): Boolean =
    stat(path, conf).isDefined

  /** recursive file listing rendered as qualified path strings (Hadoop
    * convention), in no particular order */
  def listRecursive(root: String, conf: Configuration): Seq[(String, Boolean)] =
    local(root) match {
      case Some(jp) =>
        if (!Files.exists(jp)) Seq.empty
        else {
          val out = Seq.newBuilder[(String, Boolean)]
          val stream = Files.walk(jp)
          try {
            stream.forEach(p =>
              if (!Files.isDirectory(p)) out += ((qualify(p), true)))
          } finally stream.close()
          out.result()
        }
      case None =>
        val hp = new Path(root)
        val fs = hp.getFileSystem(conf)
        if (!fs.exists(hp)) Seq.empty
        else {
          val it = fs.listFiles(hp, true)
          val out = Seq.newBuilder[(String, Boolean)]
          while (it.hasNext) {
            val s = it.next()
            out += ((s.getPath.toString, s.isFile))
          }
          out.result()
        }
    }
}
