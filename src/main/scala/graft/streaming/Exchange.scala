package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** Pipelined (streaming) exchange — SURVEY §2.1 S17.
  *
  * The reference pushes intermediate results between DAG stages as framed
  * row-group batches over HTTP instead of materializing files, so a
  * consumer stage starts processing while its producer is still running
  * (reference: proto/stream.proto:33-70 — StreamHeader/StreamRowGroupFooter,
  * "each row group is a hash partition if partitioned";
  * ExchangeMethod.batch|stream, pixels-planner PixelsPlanner.java:88-98;
  * stream operators ScanStreamOperator / PartitionedJoinStreamOperator).
  *
  * Spark-first re-expression: WITHIN a stage Spark already pipelines
  * (WholeStageCodegen iterators); ACROSS an exchange Spark batch is
  * blocking. This module adds the cross-stage path as a Structured
  * Streaming channel:
  *
  *   - the PRODUCER stage runs as a normal batch job whose tasks push
  *     fixed-size row-group batches (compact UnsafeRow bytes — the wire
  *     analog of rowGroupData framing) into a named [[ExchangeChannel]]
  *     with bounded capacity and producer backpressure;
  *   - the CONSUMER stage is a streaming query over the `gpx-exchange`
  *     micro-batch source: row groups become input partitions the moment
  *     they are appended, so downstream aggregation/join work overlaps the
  *     producer's scan — the reference's operator pipelining;
  *   - `partitioned` mode preserves the reference's "row group = hash
  *     partition" contract AT THE CHANNEL LEVEL: the producer is
  *     hash-repartitioned and every pushed row group carries its
  *     partition id (gated hash-pure in ExchangeSpec), so a
  *     partition-local consumer — a partitioned writer, a per-partition
  *     state machine, a cluster transport routing row groups to
  *     per-partition workers — can rely on it. NOTE a consumer that is
  *     itself a Spark SQL query does NOT see this partitioning (the
  *     micro-batch scan reports none), so Catalyst still plans its own
  *     shuffle for joins/aggs; use partitioned mode for its semantics,
  *     not as a consumer-side shuffle elision;
  *   - the consumer joining each arriving batch against a materialized
  *     build side (stream-static join) is exactly the reference's
  *     PartitionedJoinStreamOperator shape: populate the small table, then
  *     STREAM the large side through it.
  *
  * Failure/retry semantics mirror the reference's HTTP streams: an
  * exchange is ephemeral — on failure the whole exchange re-runs (the
  * reference re-invokes the worker DAG; there is no mid-stream resume).
  * A producer failure fails the consumer loudly, and a dead consumer
  * releases the producer (no hung appenders).
  *
  * Scale notes (100 TB): memory is bounded by `2 × capacity ×
  * rowsPerBatch × rowWidth` per channel regardless of input size (see
  * [[ExchangeChannel.Channel.append]] for why the admission bound is the
  * un-planned backlog); offsets are row-group
  * sequence numbers so admission is naturally batched; the in-process
  * [[ExchangeChannel]] is the transport seam — its append/plan/commit
  * surface is what a cluster deployment would back with the HTTP streams
  * of stream.proto (local[n] shares one JVM, same as the reference's
  * single-process stream tests).
  */
object ExchangeChannel {

  /** One pushed row group: `seq` is the channel-global order, `partition`
    * the producer hash-partition id (StreamRowGroupFooter.partitionInfo),
    * rows are copied UnsafeRow bytes (the rowGroupData framing). */
  final case class ExBatch(seq: Long, partition: Int, numFields: Int,
      rows: Array[Array[Byte]])

  final class Channel private[ExchangeChannel] (
      val name: String, val schema: StructType, val capacity: Int) {

    private val lock = new Object
    private val retained = new util.TreeMap[Long, ExBatch]
    private var last = -1L // highest appended seq
    private var planned = -1L // highest seq served to a consumer plan
    private var committed = -1L // highest consumer-committed seq
    private var closed = false
    private var failure: Option[Throwable] = None

    // instrumentation for the pipelining/backpressure gates
    @volatile private[graft] var maxRetained = 0
    @volatile private[graft] var firstCommitNanos = 0L
    @volatile private[graft] var closeNanos = 0L

    private def raise(t: Throwable): Nothing =
      throw new IllegalStateException(
        s"exchange channel $name failed: ${t.getMessage}", t)

    /** Producer side: append one row group; BLOCKS while `capacity` row
      * groups are appended-but-not-yet-PLANNED — the backpressure that
      * bounds channel memory at any input scale.
      *
      * Why the bound is on the un-planned backlog and not on total
      * retained: Spark's micro-batch engine commits batch N's offsets to
      * the source only while CONSTRUCTING batch N+1, and it constructs
      * batch N+1 only when latestOffset advances. Blocking on total
      * retained therefore deadlocks — commit needs new data, new data
      * needs space, space needs commit. Planned-but-uncommitted row
      * groups are released at the very next batch construction, which a
      * single backlog row group triggers, so bounding the backlog keeps
      * the exchange live AND keeps total retention ≤ 2×capacity
      * (≤ capacity planned-awaiting-commit + ≤ capacity backlog). */
    def append(partition: Int, rows: Array[Array[Byte]]): Long =
      lock.synchronized {
        while (last - planned >= capacity && failure.isEmpty) lock.wait(100)
        failure.foreach(raise)
        require(!closed, s"append to closed exchange channel $name")
        last += 1
        retained.put(last, ExBatch(last, partition, schema.length, rows))
        if (retained.size > maxRetained) maxRetained = retained.size
        lock.notifyAll()
        last
      }

    /** Producer side: end of stream ("the end of the stream is done by
      * simply closing the stream" — stream.proto header comment). */
    def close(): Unit = lock.synchronized {
      closed = true
      if (closeNanos == 0L) closeNanos = System.nanoTime()
      lock.notifyAll()
    }

    /** Either side: poison the channel; blocked appenders and the consumer
      * stream both observe the failure on their next step. */
    def fail(t: Throwable): Unit = lock.synchronized {
      if (failure.isEmpty) failure = Some(t)
      closed = true
      lock.notifyAll()
    }

    def failed: Option[Throwable] = lock.synchronized(failure)

    /** Consumer side: newest appended seq (streaming latestOffset).
      * Throws if the producer failed — the consumer query dies loudly
      * instead of silently truncating the stream. */
    def latest: Long = lock.synchronized { failure.foreach(raise); last }

    def isClosed: Boolean = lock.synchronized(closed)

    /** Consumer side: row groups in (fromExcl, toIncl] — replayable until
      * committed (Structured Streaming may re-plan a range on retry). */
    def range(fromExcl: Long, toIncl: Long): Array[ExBatch] =
      lock.synchronized {
        failure.foreach(raise)
        val out = ((fromExcl + 1) to toIncl).map { s =>
          val b = retained.get(s)
          require(b != null,
            s"exchange channel $name: row group $s already released " +
              s"(committed=$committed) — offsets cannot regress")
          b
        }.toArray
        if (toIncl > planned) { planned = toIncl; lock.notifyAll() }
        out
      }

    /** Consumer side: batch complete — release row groups ≤ seq and wake
      * backpressured appenders. */
    def commitUpTo(seq: Long): Unit = lock.synchronized {
      if (seq > committed) {
        committed = seq
        if (firstCommitNanos == 0L) firstCommitNanos = System.nanoTime()
        retained.headMap(seq, true).clear()
        lock.notifyAll()
      }
    }

    /** Executor side: pull one retained row group by seq (the stream-
      * endpoint fetch). Valid from plan time until the row group's batch
      * commits. */
    def fetch(seq: Long): ExBatch = lock.synchronized {
      failure.foreach(raise)
      val b = retained.get(seq)
      require(b != null,
        s"exchange channel $name: row group $seq is not retained " +
          s"(committed=$committed, last=$last)")
      b
    }

    /** test/inspection hook: currently retained row groups in seq order */
    private[graft] def retainedBatches: Array[ExBatch] =
      lock.synchronized(retained.values().asScala.toArray)
  }

  private val channels = new util.concurrent.ConcurrentHashMap[String, Channel]
  private val nameSeq = new AtomicLong(0L)

  /** unique channel name (queries re-run; names must not collide) */
  def freshName(prefix: String): String =
    s"$prefix-${nameSeq.incrementAndGet()}"

  def open(name: String, schema: StructType, capacity: Int): Channel = {
    require(capacity > 0, s"channel capacity must be positive, got $capacity")
    val ch = new Channel(name, schema, capacity)
    val prior = channels.putIfAbsent(name, ch)
    require(prior == null, s"exchange channel $name already open")
    ch
  }

  def get(name: String): Channel = {
    val ch = channels.get(name)
    require(ch != null, s"no such exchange channel: $name")
    ch
  }

  def remove(name: String): Unit = channels.remove(name)
}

/** `spark.readStream.format("gpx-exchange").option("channel", name)` —
  * the consumer side of [[ExchangeChannel]]. */
class GpxExchangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gpx-exchange"
  override def supportsExternalMetadata(): Boolean = true

  private def channel(options: CaseInsensitiveStringMap): String =
    Option(options.get("channel")).getOrElse(
      throw new IllegalArgumentException("gpx-exchange needs option(\"channel\", name)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExchangeChannel.get(channel(options)).schema

  override def getTable(tableSchema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val props = new CaseInsensitiveStringMap(properties)
    val chName = channel(props)
    val minGroups = Option(props.get("minGroupsPerTrigger"))
      .map(_.toInt).getOrElse(1)
    require(minGroups > 0, s"minGroupsPerTrigger must be positive: $minGroups")
    new Table with SupportsRead {
      override def name(): String = s"gpx-exchange:$chName"
      override def schema(): StructType = tableSchema
      override def capabilities(): util.Set[TableCapability] =
        Set(TableCapability.MICRO_BATCH_READ).asJava
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        () => new Scan {
          override def readSchema(): StructType = tableSchema
          override def description(): String = s"GpxExchangeScan[$chName]"
          override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
            new GpxExchangeStream(chName, minGroups)
        }
    }
  }
}

/** row-group sequence number as a streaming offset */
case class GpxExchangeOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** `minGroups`: admission control that COALESCES micro-batches — a
  * trigger is held back until at least `minGroups` row groups are
  * pending (or the stream closed). Every micro-batch pays fixed
  * engine overhead (offset/commit log writes, a state-store commit per
  * state partition, sink assembly), so batching row groups up is the
  * difference between ~per-row-group overhead and ~per-trigger overhead
  * on a fast producer. Liveness requires minGroups <= channel capacity
  * (the producer can always buffer a full trigger's worth). */
class GpxExchangeStream(name: String, minGroups: Int = 1)
  extends MicroBatchStream with SupportsAdmissionControl {
  private def ch = ExchangeChannel.get(name)

  override def initialOffset(): Offset = GpxExchangeOffset(-1L)
  override def latestOffset(): Offset = GpxExchangeOffset(ch.latest)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = GpxExchangeOffset(ch.latest)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GpxExchangeOffset].seq
    val l = ch.latest
    if (ch.isClosed || l - s >= minGroups) GpxExchangeOffset(l)
    else GpxExchangeOffset(s)
  }
  override def deserializeOffset(json: String): Offset =
    GpxExchangeOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GpxExchangeOffset].seq
    val to = end.asInstanceOf[GpxExchangeOffset].seq
    // partitions carry only the (channel, seq) COORDINATES — embedding the
    // row bytes would serialize the whole micro-batch into the broadcast
    // task binary (measured: 37 MB task binaries, ~3.5 s/batch). Readers
    // PULL the row group at execution time, which is also the reference's
    // shape: workers fetch row groups from the stream endpoint.
    ch.range(from, to).map(b =>
      GpxExchangePartition(name, b.seq, b.numFields): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GpxExchangeReaderFactory

  override def commit(end: Offset): Unit =
    ch.commitUpTo(end.asInstanceOf[GpxExchangeOffset].seq)

  override def stop(): Unit = ()
}

/** One row group = one Spark input partition: the consumer parallelizes
  * over the row groups of each micro-batch, and in partitioned mode each
  * partition is hash-pure (the reference's partitioned stream contract).
  * Carries coordinates only; the reader pulls the bytes from the channel
  * (a task retry re-pulls safely — row groups are retained until their
  * batch commits, and a batch cannot commit before all its tasks end). */
case class GpxExchangePartition(channel: String, seq: Long, numFields: Int)
  extends InputPartition

object GpxExchangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GpxExchangePartition]
    val b = ExchangeChannel.get(p.channel).fetch(p.seq)
    new PartitionReader[InternalRow] {
      private var i = -1
      private val row = new UnsafeRow(b.numFields)
      override def next(): Boolean = { i += 1; i < b.rows.length }
      override def get(): InternalRow = {
        val bytes = b.rows(i)
        row.pointTo(bytes, bytes.length)
        row
      }
      override def close(): Unit = ()
    }
  }
}

/** Driver-side orchestration: wire a producer stage and a consumer stage
  * through an [[ExchangeChannel]] and run them CONCURRENTLY. */
object PipelinedExchange {

  /** LIVENESS: backpressured producer tasks BLOCK while holding their
    * task slots. Producer and consumer stages share the same executors
    * (the reference runs them on separate workers), so the producer's
    * concurrency must stay below the slot count or a full channel
    * deadlocks the exchange — cap it and leave ≥1/4 of slots (min 1)
    * for the consumer's micro-batches. A single-slot context cannot
    * host both stages at all, so it is refused up front. */
  def maxProducerTasks(spark: SparkSession): Int = {
    val slots = spark.sparkContext.defaultParallelism
    require(slots >= 2,
      s"pipelined exchange needs >= 2 executor slots (producer AND " +
        s"consumer stages run concurrently), got $slots")
    math.max(1, slots - math.max(1, slots / 4))
  }

  /** Start the producer stage: runs `df` as a batch job whose tasks push
    * `rowsPerBatch`-row groups into channel `name`. Returns the channel
    * and the producer's completion handle.
    *
    * `partitionKeys` non-empty = partitioned exchange: the producer is
    * hash-repartitioned to `numPartitions` first, and each pushed row
    * group carries its partition id (one task = one hash partition).
    * `interBatchDelayMs` is a test knob that paces the producer so specs
    * can observe overlap deterministically. */
  def produce(df: DataFrame, name: String, rowsPerBatch: Int = 65536,
      capacity: Int = 8, partitionKeys: Seq[Column] = Nil,
      numPartitions: Int = 0, interBatchDelayMs: Long = 0L):
      (ExchangeChannel.Channel, java.util.concurrent.CompletableFuture[Void]) = {
    require(rowsPerBatch > 0, s"rowsPerBatch must be positive: $rowsPerBatch")
    val cap = maxProducerTasks(df.sparkSession)
    val shaped =
      if (partitionKeys.nonEmpty) {
        require(numPartitions > 0 && numPartitions <= cap,
          s"partitioned exchange needs 0 < numPartitions <= $cap " +
            s"(slots minus the consumer-stage reserve), got $numPartitions")
        df.repartition(numPartitions, partitionKeys: _*)
      } else df
    val schema = shaped.schema
    // build the producer plan BEFORE registering the channel: an
    // analysis/planning failure here must not leak a registry entry
    val rdd0 = shaped.queryExecution.toRdd
    val rdd =
      if (partitionKeys.isEmpty && rdd0.getNumPartitions > cap)
        rdd0.coalesce(cap)
      else rdd0
    val ch = ExchangeChannel.open(name, schema, capacity)
    val fut = java.util.concurrent.CompletableFuture.runAsync(() => {
      rdd.foreachPartition { (rows: Iterator[InternalRow]) =>
        // Executor side. In local[n] the channel registry is this JVM; on
        // a cluster this lookup is the HTTP-stream client seam.
        val out = ExchangeChannel.get(name)
        val pid = TaskContext.getPartitionId()
        val proj = UnsafeProjection.create(schema)
        val buf = new scala.collection.mutable.ArrayBuffer[Array[Byte]](rowsPerBatch)
        def flush(): Unit = if (buf.nonEmpty) {
          out.append(pid, buf.toArray)
          buf.clear()
          if (interBatchDelayMs > 0) Thread.sleep(interBatchDelayMs)
        }
        rows.foreach { r =>
          // normalize to UnsafeRow and copy out of the reused buffer
          buf += proj(r).copy().getBytes
          if (buf.length >= rowsPerBatch) flush()
        }
        flush()
      }
    })
    fut.whenComplete((_: Void, err: Throwable) =>
      if (err != null) ch.fail(err) else ch.close())
    (ch, fut)
  }

  /** Run the consumer stage over channel `name`: `build` shapes the
    * streaming DataFrame (aggregate, stream-static join, filter, …); the
    * result accumulates in an in-memory sink table. Blocks until the
    * channel is closed AND fully drained, then returns the final result
    * as a batch DataFrame. Fails loudly (and releases the producer) if
    * either side dies.
    *
    * Semantics note: an EMPTY stream produces zero micro-batches, so a
    * global (ungrouped) aggregate yields an empty result here where
    * batch SQL would yield one row — grouped aggregates (empty → empty)
    * match batch semantics exactly.
    *
    * `statePartitions`: shuffle-partition count for the CONSUMER query
    * only (applied in a cloned session — the caller's conf is never
    * touched). A stateful consumer pays a per-micro-batch state-store
    * commit PER state partition, so size this to the aggregate's key
    * cardinality, not the scan width — a 6-group rollup under the
    * session default of 32 spends more time in state commits than in
    * aggregation.
    *
    * `producerStallSec`: watchdog for a producer that stopped making
    * progress (the stall detector, NOT a runtime budget — size it to the
    * longest healthy producer stage). */
  def consume(spark: SparkSession, name: String,
      build: DataFrame => DataFrame, outputMode: String = "complete",
      statePartitions: Option[Int] = None,
      minGroupsPerTrigger: Int = 1,
      producerStallSec: Long = 600L): DataFrame = {
    val ch = ExchangeChannel.get(name)
    // EVERY failure from here on must poison the channel: a consumer
    // that dies (including during its own setup — a bad build() plan, a
    // failed query start) leaves backpressured producer tasks blocked in
    // append() holding executor slots otherwise.
    try {
      require(minGroupsPerTrigger <= ch.capacity,
        s"minGroupsPerTrigger=$minGroupsPerTrigger exceeds channel capacity " +
          s"${ch.capacity} — the producer could never fill a trigger")
      val sinkName = name.replaceAll("[^a-zA-Z0-9_]", "_")
      // the channel is ephemeral — a restored checkpoint from an earlier
      // exchange would alias this one's offsets into a dead channel's
      // history, so the checkpoint must be unique per exchange run
      val ckpt = java.nio.file.Files.createTempDirectory(s"gpx_exchange_$sinkName")
        .toString
      val session = statePartitions match {
        case Some(n) =>
          val ss = spark.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", n.toString)
          ss
        case None => spark
      }
      val src = session.readStream.format("gpx-exchange")
        .option("channel", name)
        .option("minGroupsPerTrigger", minGroupsPerTrigger.toString)
        .load()
      val q = build(src).writeStream
        .format("memory").queryName(sinkName)
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0L))
        .start()
      try {
        // Wait for end-of-stream (producer close), then drain what was
        // appended. NOTE the engine never commits the FINAL batch back to
        // the source (a source commit rides on the NEXT batch's
        // construction), so drain-completion cannot be keyed on channel
        // commits — processAllAvailable is the authoritative "all appended
        // row groups processed and in the sink" barrier.
        var lastSeen = ch.latest
        var stallDeadlineNs =
          System.nanoTime() + producerStallSec * 1000L * 1000 * 1000
        while (!ch.isClosed) {
          if (q.exception.isDefined) {
            val e = q.exception.get
            throw Option(e.cause).getOrElse(e)
          }
          val seen = ch.latest
          if (seen != lastSeen) { // progress resets the stall watchdog
            lastSeen = seen
            stallDeadlineNs =
              System.nanoTime() + producerStallSec * 1000L * 1000 * 1000
          } else if (System.nanoTime() > stallDeadlineNs)
            throw new IllegalStateException(
              s"exchange $name: producer made no progress for " +
                s"${producerStallSec}s (appended=${seen + 1} row groups)")
          Thread.sleep(2)
        }
        q.processAllAvailable()
        val out = session.table(sinkName)
        // the result DataFrame holds the resolved sink relation; drop the
        // catalog entry so finished exchanges don't pin their results in
        // the session for the process lifetime
        session.catalog.dropTempView(sinkName)
        out
      } finally {
        try q.stop() catch { case _: Throwable => () }
        deleteDir(new java.io.File(ckpt))
      }
    } catch {
      case t: Throwable =>
        // a dead consumer must not leave producer tasks blocked in append
        ch.fail(t)
        throw t
    }
  }

  private def deleteDir(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteDir)
    f.delete(): Unit
  }

  /** One pipelined exchange end-to-end: producer `df` streams through the
    * channel into `build`; returns the consumer's final result. The two
    * stages run concurrently — the overlap the reference's stream mode
    * exists to create. */
  def run(spark: SparkSession, df: DataFrame, namePrefix: String,
      build: DataFrame => DataFrame, rowsPerBatch: Int = 65536,
      capacity: Int = 8, partitionKeys: Seq[Column] = Nil,
      numPartitions: Int = 0, outputMode: String = "complete",
      statePartitions: Option[Int] = None,
      minGroupsPerTrigger: Int = 1): DataFrame = {
    val name = ExchangeChannel.freshName(namePrefix)
    try {
      val (_, fut) = produce(df, name, rowsPerBatch, capacity,
        partitionKeys, numPartitions)
      val out = consume(spark, name, build, outputMode, statePartitions,
        minGroupsPerTrigger)
      fut.join() // surface producer-side failures even if consumer won
      out
    } finally ExchangeChannel.remove(name)
  }
}
