package graft

import graft.format.{GpxCommitLog, GpxFileWriter}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.types._

/** Child-JVM worker for [[CrossProcessSpec]]: races commit-log appends,
  * atomic cross-table transfers and vacuums against sibling PROCESSES on
  * one shared table, and streams row groups into a remote exchange
  * channel. Deliberately Spark-free (GpxFileWriter + GpxCommitLog +
  * catalyst row codecs only) so a child starts in ~1 s and the fuzz
  * actually overlaps. Exits 0 on success, 1 with a stack trace on any
  * failure — the parent asserts on the exit code. */
object CrossProcessMain {
  private val amountSchema = StructType(Seq(StructField("amount", LongType)))

  /** stage one single-row gpx file into the table dir; INVISIBLE until a
    * manifest commit references it (log-table readers resolve the head) */
  private def writeAmountFile(dir: String, amount: Long, conf: Configuration): String = {
    val path = s"$dir/x${java.util.UUID.randomUUID().toString.take(12)}.gpx"
    val w = new GpxFileWriter(path, amountSchema, conf)
    w.addRow(InternalRow(amount))
    w.close()
    path
  }

  def main(args: Array[String]): Unit = try {
    val conf = new Configuration()
    args(0) match {

      // append <dir> <writerId> <n>: n sequential appends of one-row
      // files with distinct amounts writerId*100000+i
      case "append" =>
        val dir = args(1); val id = args(2).toInt; val n = args(3).toInt
        (0 until n).foreach { i =>
          val amount = id * 100000L + i
          // a vacuum racing this writer may sweep the staged file while
          // the commit retries past the staging grace — the commit then
          // fails LOUDLY (never a dangling reference) and the writer's
          // contract is to re-stage and retry, which is what a
          // production ingester would do
          // bounded: a vacuum grace persistently below stage-to-commit
          // latency must fail LOUDLY (exit 1 -> parent's awaitOk), not
          // spin this child forever and hang the test on its exit
          var done = false; var restages = 0
          while (!done) {
            val f = writeAmountFile(dir, amount, conf)
            System.err.println(s"[append] staged amount=$amount file=$f " +
              s"t=${System.currentTimeMillis()}")
            try {
              val v = GpxCommitLog.commit(dir, conf,
                GpxCommitLog.Append(Seq(GpxCommitLog.entryFor(dir, f, conf)),
                  schema = Some(amountSchema)))
              System.err.println(s"[append] committed amount=$amount v=$v " +
                s"t=${System.currentTimeMillis()}")
              done = true
            } catch {
              case e: java.io.FileNotFoundException =>
                restages += 1
                if (restages > 50) throw new IllegalStateException(
                  s"append starved: staged file swept $restages times for " +
                    s"amount=$amount (vacuum grace below stage-to-commit " +
                    "latency?)", e)
                System.err.println(s"[append] staged file swept " +
                  s"mid-commit for amount=$amount — re-staging " +
                  s"t=${System.currentTimeMillis()}")
            }
          }
        }

      // transfer <a> <b> <iters> <base>: atomic append-pair transfers of
      // base+k from a to b (negative delta on a, positive on b)
      case "transfer" =>
        val a = args(1); val b = args(2)
        val iters = args(3).toInt; val base = args(4).toLong
        (0 until iters).foreach { k =>
          val x = base + k
          var done = false; var tries = 0
          while (!done) {
            try {
              val fa = writeAmountFile(a, -x, conf)
              val fb = writeAmountFile(b, x, conf)
              GpxCommitLog.commitAtomic(conf, Seq(
                a -> GpxCommitLog.Append(
                  Seq(GpxCommitLog.entryFor(a, fa, conf)),
                  schema = Some(amountSchema)),
                b -> GpxCommitLog.Append(
                  Seq(GpxCommitLog.entryFor(b, fb, conf)),
                  schema = Some(amountSchema))))
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                tries += 1
                if (tries > 100) throw new IllegalStateException("txn starved")
                Thread.sleep(10)
            }
          }
        }

      // compact <dir> <iters>: repeated IN-PLACE compactions racing the
      // other children. A lost Replace race (a concurrent commit retired
      // or rewrote an input) is a legitimate loss — skip and retry next
      // iteration. Anything else (a dead-claim refusal, a missing staged
      // file) is a real protocol failure and must exit 1.
      case "compact" =>
        val dir = args(1); val iters = args(2).toInt
        (0 until iters).foreach { _ =>
          try {
            if (GpxCommitLog.isLogTable(dir, conf) &&
                GpxCommitLog.head(dir, conf).exists(_.live.nonEmpty)) {
              graft.format.GpxCompactor.compactInPlace(dir, conf)
              ()
            }
          } catch {
            case _: java.util.ConcurrentModificationException => ()
            // a COW delete can retire an input AND the racing vacuum can
            // reclaim it mid-byte-copy (a retired file's mtime predates
            // the grace window): a clean loss, not a protocol failure —
            // the compactor aborts loudly, cleans its staging, and the
            // next iteration replans from the fresh head
            case _: java.io.FileNotFoundException => ()
          }
          Thread.sleep(30)
        }

      // import <dir> <writerId> <n>: n IMPORTs, each registering a
      // one-row gpx file staged OUTSIDE the table (a private tmp dir)
      // through GpxMaintenance.importFiles — copy + one manifest Append
      // racing sibling appends/compactions/vacuums. The copies carry
      // visible imp_*.gpx names, so the window between copy and commit
      // is exactly where a sweep or a Replace could lose or duplicate
      // the registration.
      case "import" =>
        val dir = args(1); val id = args(2).toInt; val n = args(3).toInt
        val tmp = java.nio.file.Files
          .createTempDirectory("xproc_impsrc").toString
        (0 until n).foreach { i =>
          val amount = id * 100000L + i
          val src = writeAmountFile(tmp, amount, conf)
          // a racing vacuum can sweep the pre-commit imp_ copy past the
          // staging grace: importFiles fails LOUDLY (removing its
          // copies) — retry, as a production importer would
          // bounded like the append loop: persistent sweeps fail loudly
          var done = false; var retries = 0
          while (!done) {
            try {
              val (files, rows) =
                graft.format.GpxMaintenance.importFiles(dir, Seq(src), conf)
              require(files == 1 && rows == 1L,
                s"import returned ($files, $rows)")
              System.err.println(s"[import] committed amount=$amount " +
                s"t=${System.currentTimeMillis()}")
              done = true
            } catch {
              case e: java.io.FileNotFoundException =>
                retries += 1
                if (retries > 50) throw new IllegalStateException(
                  s"import starved: copy swept $retries times for " +
                    s"amount=$amount (vacuum grace below copy-to-commit " +
                    "latency?)", e)
                System.err.println(s"[import] copy swept mid-commit for " +
                  s"amount=$amount — retrying t=${System.currentTimeMillis()}")
            }
          }
        }

      // vacuum <dir> <iters> <minAgeMs>: repeated vacuums racing the
      // other children. minAgeMs is the STAGING GRACE window — a vacuum
      // with minAgeMs below the writers' stage-to-commit latency deletes
      // their staged-but-unreferenced files by design (the production
      // default is 1 h for exactly this reason), so the fuzz passes a
      // window the racing appends comfortably fit inside
      case "vacuum" =>
        // child-log-only deletion trace: when the fuzz fails, the sweeper
        // log says exactly which files vacuum reclaimed and under which
        // keep-set (how the round-12 lost-commit slot-reopen was found)
        sys.props("graft.debug.vacuum") = "1"
        val dir = args(1); val iters = args(2).toInt; val minAge = args(3).toLong
        (0 until iters).foreach { _ =>
          if (GpxCommitLog.isLogTable(dir, conf)) {
            GpxCommitLog.vacuum(dir, conf, keepVersions = 3, minAgeMs = minAge)
            ()
          }
          Thread.sleep(50)
        }

      // exproduce <host> <port> <channel> <nGroups> <rowsPerGroup>:
      // stream UnsafeRow row groups into a REMOTE exchange channel over
      // the socket transport, then close the channel cleanly
      case "exproduce" =>
        val host = args(1); val port = args(2).toInt; val name = args(3)
        val nGroups = args(4).toInt; val rowsPerGroup = args(5).toInt
        val schema = StructType(Seq(
          StructField("id", LongType), StructField("v", LongType)))
        val proj = UnsafeProjection.create(schema)
        val client = new graft.streaming.RemoteExchangeProducer(host, port)
        try {
          var g = 0
          var idx = 0L
          while (g < nGroups) {
            val rows = Array.tabulate(rowsPerGroup) { _ =>
              val r = proj(InternalRow(idx, idx * 2L)).copy().getBytes
              idx += 1
              r
            }
            client.append(name, g, rows)
            g += 1
          }
          client.closeChannel(name)
        } finally client.close()

      // excrash <host> <port> <channel> <nGroups> <rowsPerGroup>: append
      // a few row groups then exit WITHOUT closing — the server must fail
      // the channel on the dropped connection
      case "excrash" =>
        val host = args(1); val port = args(2).toInt; val name = args(3)
        val nGroups = args(4).toInt; val rowsPerGroup = args(5).toInt
        val schema = StructType(Seq(
          StructField("id", LongType), StructField("v", LongType)))
        val proj = UnsafeProjection.create(schema)
        val client = new graft.streaming.RemoteExchangeProducer(host, port)
        var g = 0
        while (g < nGroups) {
          val rows = Array.tabulate(rowsPerGroup)(i =>
            proj(InternalRow(i.toLong, i.toLong)).copy().getBytes)
          client.append(name, g, rows)
          g += 1
        }
        // hard exit, no close: simulates a crashed producer JVM
        Runtime.getRuntime.halt(0)

      case other => throw new IllegalArgumentException(s"unknown mode $other")
    }
    System.exit(0)
  } catch {
    case t: Throwable =>
      t.printStackTrace()
      System.exit(1)
  }
}
