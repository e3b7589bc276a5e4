package graft

import graft.format.GpxCommitLog
import org.apache.hadoop.conf.Configuration

/** Debug tool: dump a commit-log table's manifest chain (per-version
  * live sets) and the rows in each physical file — the post-mortem
  * reader for CrossProcessSpec's preserved-evidence dirs.
  *   sbt 'Test/runMain graft.LogDump /tmp/xproc_evidence_<ts>' */
object LogDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val conf = new Configuration()
    val head = GpxCommitLog.head(dir, conf)
    println(s"head = ${head.map(_.version)}")
    val versions = Option(new java.io.File(s"$dir/_commits").listFiles())
      .getOrElse(Array.empty).map(_.getName).sorted
    println(s"manifests on disk: ${versions.mkString(", ")}")
    versions.foreach { m =>
      val v = m.replaceAll("[^0-9]", "")
      if (v.nonEmpty) {
        val sn = GpxCommitLog.snapshotAt(dir, v.toLong, conf)
        println(s"v$v: " + sn.map(s =>
          s"live=${s.live.size} files=[${s.live.map(_.relPath).sorted.mkString(",")}]")
          .getOrElse("UNRESOLVABLE"))
      }
    }
    // which physical file holds which amount
    val spark = Tables.localSession(4)
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".gpx")).sortBy(_.getName).foreach { f =>
        val rows = spark.read.format("gpx").load(f.getAbsolutePath)
          .collect().map(_.getLong(0)).mkString(",")
        println(s"file ${f.getName}: [$rows]")
      }
    spark.stop()
  }
}
