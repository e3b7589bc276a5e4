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
  * image but never builds a SparkSession, so it starts fast; file row
  * groups COALESCE up to a ~64k-row transfer unit — the writer sized
  * them for scan locality, but the exchange's per-group cost is a
  * consumer micro-batch share plus a socket round trip, so shipping
  * 8k-row file groups one-by-one wastes ~4x wall clock in consumer
  * engine overhead (the reference's stream writer likewise sizes its
  * OWN rowGroupData frames).
  *
  * Startup is latency-engineered for a fork-per-query caller: the three
  * serial init costs — socket connect, Hadoop FileSystem init (pinned to
  * LocalFileSystem for file: paths so the ServiceLoader never scans the
  * full jar classpath), and UnsafeProjection codegen (built from the
  * schema DDL the parent passes, not from the first footer) — all run
  * CONCURRENTLY before the first byte is decoded.
  *
  * Runs as a forked child of an engine JVM (see [[fork]]) or standalone:
  *   RemoteScanWorker host port channel col1,col2,... schemaDDL file...
  * Exits 0 after a clean channel close; on any failure it FAILs the
  * channel (or lets the dropped-connection contract do it) and exits 1.
  */
object RemoteScanWorker {

  def main(args: Array[String]): Unit =
    try {
      require(args.length >= 6,
        "usage: RemoteScanWorker host port channel cols schemaDDL file...")
      stream(args(0), args(1).toInt, args(2),
        args(3).split(',').toSeq, args(4), args.drop(5).toSeq)
      System.exit(0)
    } catch {
      case t: Throwable =>
        t.printStackTrace()
        System.exit(1)
    }

  /** scan `columns` of each gpx file and stream the rows as exchange row
    * groups of ~`rowsPerGroup` rows. `schemaDDL` is the channel schema
    * (the parent derives it from the same footers); every file's
    * projected columns must match it exactly — the UnsafeRow wire image
    * is layout-typed, so a mismatch must fail loudly, never reinterpret.
    * Close the channel on success, fail it on error. Worker memory stays
    * bounded at one transfer unit. */
  def stream(host: String, port: Int, channel: String,
      columns: Seq[String], schemaDDL: String, files: Seq[String],
      rowsPerGroup: Int = 65536): Unit = {
    val t0 = System.nanoTime()
    def mark(what: String): Unit = // child-log-only phase timing
      System.err.println(f"[scan-worker] $what +${(System.nanoTime() - t0) / 1e9}%.2fs")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    // overlap the three independent init costs (measured ~0.5s connect,
    // ~1.1s cold Hadoop FS init, ~0.5s projection codegen — serial they
    // dominate a fork-per-query run)
    val confF = pool.submit(() => {
      val c = new Configuration()
      // pin the local scheme so FileSystem.getFileSystemClass answers
      // from config instead of ServiceLoader-scanning every jar
      c.set("fs.file.impl", "org.apache.hadoop.fs.LocalFileSystem")
      files.headOption.foreach(f =>
        new org.apache.hadoop.fs.Path(f).getFileSystem(c))
      c
    })
    val outSchema = StructType.fromDDL(schemaDDL)
    require(outSchema.fieldNames.sameElements(columns),
      s"schema DDL fields ${outSchema.fieldNames.toSeq} != columns $columns")
    val projF = pool.submit(() => UnsafeProjection.create(outSchema))
    // shutdown NOW, not after the gets: submitted tasks still run and
    // get() still works, but a failure anywhere below (connect refused,
    // a future threw) can no longer leak two non-daemon threads that pin
    // an in-process caller's JVM
    pool.shutdown()
    val client = new RemoteExchangeProducer(host, port)
    mark("connected")
    val conf = confF.get()
    val proj = projF.get()
    mark("init ready")
    val buf = new scala.collection.mutable.ArrayBuffer[Array[Byte]](rowsPerGroup)
    var groupIdx = 0
    def flush(): Unit = if (buf.nonEmpty) {
      // backpressure crosses the wire: this blocks while the consumer
      // channel is at capacity (TCP window, see ExchangeServer doc)
      client.append(channel, groupIdx, buf.toArray)
      groupIdx += 1
      buf.clear()
    }
    try {
      try {
        files.foreach { f =>
          val footer = GpxFileReader.readFooter(f, conf)
          val cis = columns.map { c =>
            val i = footer.schema.fieldNames.indexOf(c)
            require(i >= 0, s"column $c not in gpx schema of $f")
            i
          }
          require(StructType(cis.map(footer.schema(_))) == outSchema,
            s"$f: projected schema does not match the channel schema " +
              s"$schemaDDL — refusing to stream a reinterpreted layout")
          footer.rowGroups.foreach { rg =>
            val slices = cis.toArray.map { ci =>
              val ch = rg.chunks(ci)
              ch.pixels.indices.map(p => GpxFileReader.PixelSlice(
                ch.offset + ch.pixels(p).relOffset, ch.pixelLength(p),
                ch.pixels(p).rows)).toArray
            }
            val batch = GpxFileReader.readSlices(
              f, conf, outSchema, slices, rg.numRows, -1L)
            val it = batch.rowIterator()
            while (it.hasNext) {
              buf += proj(it.next()).copy().getBytes
              if (buf.length >= rowsPerGroup) flush()
            }
            batch.close()
          }
          mark(s"streamed $f")
        }
        flush()
        client.closeChannel(channel)
        mark("closed")
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
      columns: Seq[String], schema: StructType, files: Seq[String]): Worker = {
    val java = new File(new File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val log = File.createTempFile("gpx-scan-worker-", ".log")
    val cmd = (Seq(java) ++ addOpens ++ Seq("-Xmx1g", "-cp",
      System.getProperty("java.class.path"),
      "graft.streaming.RemoteScanWorker",
      host, port.toString, channel, columns.mkString(","),
      schema.toDDL)) ++ files
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    // a temp log file, never a pipe: a chatty child must not block on a
    // full pipe buffer nobody drains
    pb.redirectOutput(log)
    Worker(pb.start(), log)
  }
}
