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
    // their scratch next to the files being written)
    val candidates = fs.listStatus(root).flatMap { st =>
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
    sweptDirs ++ sweptTmps
  }
}
