package graft.streaming

import org.apache.spark.sql.types.StructType

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

/** Socket transport for [[ExchangeChannel]] — the cross-process seam the
  * in-JVM channel registry was designed around. The reference streams
  * framed row groups over HTTP between disjoint worker fleets
  * (proto/stream.proto:33-70 StreamHeader/StreamRowGroupFooter;
  * PixelsWriterStreamImpl/PixelsReaderStreamImpl in pixels-core); this is
  * the same shape on a length-prefixed binary frame: a server fronts the
  * consumer JVM's channel registry, and a remote producer appends row
  * groups with the SAME append/close/fail contract the in-process path
  * uses. Backpressure crosses the wire for free: a server-side append
  * blocks its connection thread while the channel is at capacity, which
  * stops reading from the socket, which fills the TCP window, which
  * blocks the remote producer — no explicit credit protocol needed.
  *
  * Wire protocol (DataOutputStream framing, one request/response pair at
  * a time per connection):
  *   OPEN   1: name, schemaDDL, capacity:i32        -> ok
  *   APPEND 2: name, partition:i32, n:i32, n*(len:i32, bytes) -> ok, seq:i64
  *   CLOSE  3: name                                 -> ok
  *   FAIL   4: name, message                        -> ok
  *   LATEST 5: name                                 -> ok, seq:i64
  *   response status: 0 ok | 1 error (message follows)
  *
  * Failure contract: a connection that appended to a channel and drops
  * without sending CLOSE or FAIL (producer JVM crash, network cut) fails
  * those channels, so the consumer dies loudly instead of waiting out the
  * stall watchdog. Corollary: ONE logical producer connection per channel
  * — a multi-connection producer fleet needs a session protocol on top
  * (the reference's per-worker HTTP streams carry the same assumption:
  * one stream per producer task, closed explicitly). */
object ExchangeServer {

  final class Running private[ExchangeServer] (
      server: ServerSocket, stopped: AtomicBoolean) {
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      stopped.set(true)
      try server.close() catch { case _: IOException => () }
    }
  }

  /** Start a loopback server fronting THIS JVM's channel registry.
    * `port` 0 picks a free port (read it back from [[Running.port]]). */
  def start(port: Int = 0): Running = {
    val server = new ServerSocket(port, 64, InetAddress.getLoopbackAddress)
    val stopped = new AtomicBoolean(false)
    val acceptor = new Thread(() => {
      while (!stopped.get()) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "gpx-exchange-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          // server closed -> loop exits on flag; a persistent accept
          // failure while still running (fd exhaustion under load) must
          // not hot-spin a core — back off before retrying
          case _: IOException => if (!stopped.get()) Thread.sleep(100)
        }
      }
    }, "gpx-exchange-server")
    acceptor.setDaemon(true)
    acceptor.start()
    new Running(server, stopped)
  }

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16))
    // channels this connection appended to and has not yet cleanly
    // closed/failed — failed on abrupt disconnect so a crashed producer
    // JVM kills its consumer loudly
    val touched = ConcurrentHashMap.newKeySet[String]()
    var clean = false
    try {
      var done = false
      while (!done) {
        val cmd = try in.readByte() catch { case _: EOFException => done = true; 0.toByte }
        if (!done) cmd match {
          case 1 => // OPEN
            val name = in.readUTF(); val ddl = in.readUTF(); val cap = in.readInt()
            reply(out) { ExchangeChannel.open(name, StructType.fromDDL(ddl), cap); () }
          case 2 => // APPEND
            val name = in.readUTF()
            val partition = in.readInt()
            val n = in.readInt()
            val rows = new Array[Array[Byte]](n)
            var i = 0
            while (i < n) {
              val len = in.readInt()
              val b = new Array[Byte](len)
              in.readFully(b)
              rows(i) = b
              i += 1
            }
            touched.add(name)
            replyLong(out) { ExchangeChannel.get(name).append(partition, rows) }
          case 3 => // CLOSE
            val name = in.readUTF()
            touched.remove(name)
            reply(out) { ExchangeChannel.get(name).close() }
          case 4 => // FAIL
            val name = in.readUTF(); val msg = in.readUTF()
            touched.remove(name)
            reply(out) { ExchangeChannel.get(name)
              .fail(new IOException(s"remote producer failed: $msg")) }
          case 5 => // LATEST
            val name = in.readUTF()
            replyLong(out) { ExchangeChannel.get(name).latest }
          case other =>
            throw new IOException(s"unknown exchange command $other")
        }
      }
      clean = touched.isEmpty
    } catch {
      case _: Throwable => clean = false
    } finally {
      if (!clean) touched.forEach { name =>
        try {
          val ch = ExchangeChannel.get(name)
          if (!ch.isClosed) ch.fail(new IOException(
            s"remote producer connection for channel $name dropped " +
              "without close — producer JVM crashed or network cut"))
        } catch { case _: Throwable => () } // channel already gone
      }
      try sock.close() catch { case _: IOException => () }
    }
  }

  private def reply(out: DataOutputStream)(body: => Unit): Unit = {
    try { body; out.writeByte(0) }
    catch { case t: Throwable =>
      out.writeByte(1)
      out.writeUTF(Option(t.getMessage).getOrElse(t.getClass.getName).take(2000))
    }
    out.flush()
  }

  private def replyLong(out: DataOutputStream)(body: => Long): Unit = {
    try { val v = body; out.writeByte(0); out.writeLong(v) }
    catch { case t: Throwable =>
      out.writeByte(1)
      out.writeUTF(Option(t.getMessage).getOrElse(t.getClass.getName).take(2000))
    }
    out.flush()
  }
}

/** Producer-side client: the remote half of the append/close/fail
  * contract. Thread-compatible with one connection per producer task
  * (each task opens its own client); calls are synchronized per client so
  * a shared instance also works. */
final class RemoteExchangeProducer(host: String, port: Int) extends AutoCloseable {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream, 1 << 16))
  private val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16))

  private def check(): Unit = {
    val status = in.readByte()
    if (status != 0) throw new IOException(s"exchange server error: ${in.readUTF()}")
  }

  def open(name: String, schema: StructType, capacity: Int): Unit = synchronized {
    out.writeByte(1); out.writeUTF(name); out.writeUTF(schema.toDDL)
    out.writeInt(capacity); out.flush()
    check()
  }

  /** Append one row group of UnsafeRow byte images; blocks under the
    * consumer channel's backpressure (TCP window, see server doc). */
  def append(name: String, partition: Int, rows: Array[Array[Byte]]): Long = synchronized {
    out.writeByte(2); out.writeUTF(name); out.writeInt(partition)
    out.writeInt(rows.length)
    var i = 0
    while (i < rows.length) {
      out.writeInt(rows(i).length); out.write(rows(i)); i += 1
    }
    out.flush()
    check()
    in.readLong()
  }

  def closeChannel(name: String): Unit = synchronized {
    out.writeByte(3); out.writeUTF(name); out.flush(); check()
  }

  def fail(name: String, message: String): Unit = synchronized {
    out.writeByte(4); out.writeUTF(name); out.writeUTF(message.take(2000))
    out.flush(); check()
  }

  def latest(name: String): Long = synchronized {
    out.writeByte(5); out.writeUTF(name); out.flush(); check(); in.readLong()
  }

  override def close(): Unit = {
    try sock.close() catch { case _: IOException => () }
  }
}
