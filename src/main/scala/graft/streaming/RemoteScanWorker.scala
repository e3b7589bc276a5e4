package graft.streaming

import graft.format.GpxFileReader
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.types.StructType

import java.io.File

/** A Spark-SESSION-free scan worker: reads the projected columns of gpx
  * files row group by row group and streams them into a remote
  * [[ExchangeChannel]] over the socket transport — the disjoint-fleet
  * shape of the reference's stream mode, where producer workers scan
  * storage and push framed row groups to consumers over the wire
  * (proto/stream.proto:33-70; pixels-worker scan stream operators). The
  * worker JVM links Spark's catalyst/row classes for the UnsafeRow wire
  * image but never builds a SparkSession, so it starts in ~1 s; one
  * streamed row group per gpx row group preserves the "row group is the
  * transfer unit" framing end-to-end.
  *
  * Runs as a forked child of an engine JVM (see [[fork]]) or standalone:
  *   RemoteScanWorker host port channel col1,col2,... file1 [file2 ...]
  * Exits 0 after a clean channel close; on any failure it FAILs the
  * channel (or lets the dropped-connection contract do it) and exits 1.
  */
object RemoteScanWorker {

  def main(args: Array[String]): Unit =
    try {
      require(args.length >= 5,
        "usage: RemoteScanWorker host port channel cols file...")
      stream(args(0), args(1).toInt, args(2),
        args(3).split(',').toSeq, args.drop(4).toSeq)
      System.exit(0)
    } catch {
      case t: Throwable =>
        t.printStackTrace()
        System.exit(1)
    }

  /** scan `columns` of each gpx file and append one exchange row group
    * per file row group; close the channel on success, fail it on error */
  def stream(host: String, port: Int, channel: String,
      columns: Seq[String], files: Seq[String]): Unit = {
    val conf = new Configuration()
    val client = new RemoteExchangeProducer(host, port)
    try {
      try {
        files.foreach { f =>
          val footer = GpxFileReader.readFooter(f, conf)
          val cis = columns.map { c =>
            val i = footer.schema.fieldNames.indexOf(c)
            require(i >= 0, s"column $c not in gpx schema of $f")
            i
          }
          val outSchema = StructType(cis.map(footer.schema(_)))
          val proj = UnsafeProjection.create(outSchema)
          footer.rowGroups.zipWithIndex.foreach { case (rg, rgIdx) =>
            val slices = cis.toArray.map { ci =>
              val ch = rg.chunks(ci)
              ch.pixels.indices.map(p => GpxFileReader.PixelSlice(
                ch.offset + ch.pixels(p).relOffset, ch.pixelLength(p),
                ch.pixels(p).rows)).toArray
            }
            val batch = GpxFileReader.readSlices(
              f, conf, outSchema, slices, rg.numRows, -1L)
            val rows = new Array[Array[Byte]](rg.numRows)
            val it = batch.rowIterator()
            var i = 0
            while (it.hasNext) {
              rows(i) = proj(it.next()).copy().getBytes
              i += 1
            }
            batch.close()
            // backpressure crosses the wire: this blocks while the
            // consumer channel is at capacity (TCP window, see
            // ExchangeServer doc) — worker memory stays one row group
            client.append(channel, rgIdx, rows)
          }
        }
        client.closeChannel(channel)
      } catch {
        case t: Throwable =>
          // poison the channel loudly; the consumer must not wait out
          // its stall watchdog on a half-streamed table
          try client.fail(channel,
            s"remote scan worker failed: ${t.getMessage}")
          catch { case _: Throwable => () }
          throw t
      }
    } finally client.close()
  }

  // mirrors build.sbt's jdk17AddOpens: Spark 4.x catalyst on JDK 17
  // needs these whenever catalyst runs outside spark-submit
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  final case class Worker(process: Process, log: File) {
    def logTail: String =
      try new String(java.nio.file.Files.readAllBytes(log.toPath))
        .takeRight(4000)
      catch { case _: Throwable => "" }
  }

  /** fork a worker JVM on this process's classpath (requires a forked
    * parent — java.class.path must be the real application classpath,
    * which spark-submit and sbt's fork-mode runners both guarantee) */
  def fork(host: String, port: Int, channel: String,
      columns: Seq[String], files: Seq[String]): Worker = {
    val java = new File(new File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val log = File.createTempFile("gpx-scan-worker-", ".log")
    val cmd = (Seq(java) ++ addOpens ++ Seq("-Xmx1g", "-cp",
      System.getProperty("java.class.path"),
      "graft.streaming.RemoteScanWorker",
      host, port.toString, channel, columns.mkString(","))) ++ files
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    // a temp log file, never a pipe: a chatty child must not block on a
    // full pipe buffer nobody drains
    pb.redirectOutput(log)
    Worker(pb.start(), log)
  }
}
