package graft

import graft.streaming.{ExchangeChannel, PipelinedExchange}
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.functions._

/** S17 pipelined exchange: correctness, actual producer/consumer overlap,
  * bounded-memory backpressure, hash-partition purity, failure
  * propagation, and replayability of uncommitted row groups. */
class ExchangeSpec extends GraftSpec {
  private val sp = TestSpark.spark
  import sp.implicits._

  test("pipelined agg equals batch agg") {
    val df = sp.range(0, 10000).select(
      (col("id") % 7).as("k"), col("id").as("v"))
    val out = PipelinedExchange.run(sp, df, "xspec-agg",
      src => src.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n")),
      rowsPerBatch = 512)
    val got = out.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("consumer overlaps the producer (pipelining, not store-then-forward)") {
    val df = sp.range(0, 4000).repartition(1).select(col("id").as("v"))
    val name = ExchangeChannel.freshName("xspec-overlap")
    // paced producer: 20 row groups, 25ms apart — plenty of room for the
    // consumer to commit row groups while production is still running
    val (ch, fut) = PipelinedExchange.produce(df, name,
      rowsPerBatch = 200, capacity = 4, interBatchDelayMs = 25)
    try {
      val out = PipelinedExchange.consume(sp, name,
        src => src.agg(sum("v").as("s"), count(lit(1)).as("n")))
      fut.join()
      val r = out.head()
      assert(r.getLong(0) == (0L until 4000).sum && r.getLong(1) == 4000)
      assert(ch.firstCommitNanos > 0 && ch.closeNanos > 0)
      assert(ch.firstCommitNanos < ch.closeNanos,
        "consumer committed its first row group only after the producer " +
          "finished — the exchange did not pipeline")
    } finally ExchangeChannel.remove(name)
  }

  test("backpressure bounds retained row groups at channel capacity") {
    val df = sp.range(0, 5000).repartition(1).select(col("id").as("v"))
    val name = ExchangeChannel.freshName("xspec-bp")
    // 25 row groups into a capacity-2 channel with NO consumer: the
    // producer must block rather than buffer the stream
    val (ch, fut) = PipelinedExchange.produce(df, name,
      rowsPerBatch = 200, capacity = 2)
    try {
      Thread.sleep(1500)
      assert(!fut.isDone, "producer finished with no consumer — nothing backpressured")
      assert(ch.maxRetained <= 2, s"retained ${ch.maxRetained} > capacity 2")
      // now drain: every row arrives exactly once
      val out = PipelinedExchange.consume(sp, name,
        src => src.agg(count(lit(1)).as("n"), sum("v").as("s")))
      fut.join()
      val r = out.head()
      assert(r.getLong(0) == 5000 && r.getLong(1) == (0L until 5000).sum)
      // once draining, retention may briefly hold planned-awaiting-commit
      // row groups on top of the backlog — bounded at 2×capacity
      assert(ch.maxRetained <= 4)
    } finally ExchangeChannel.remove(name)
  }

  test("partitioned exchange: every row group is hash-pure (one partition)") {
    val df = sp.range(0, 2000).select((col("id") % 97).as("k"), col("id").as("v"))
    val name = ExchangeChannel.freshName("xspec-part")
    val (ch, fut) = PipelinedExchange.produce(df, name, rowsPerBatch = 100,
      capacity = 1000, partitionKeys = Seq(col("k")), numPartitions = 3)
    fut.join() // capacity is large: producer completes without a consumer
    try {
      val batches = ch.retainedBatches
      assert(batches.nonEmpty)
      // decode each row group's keys; a key must live in exactly one
      // partition tag (stream.proto StreamHeader.partitioned: "each row
      // group is a hash partition")
      val keyToPartitions = batches.flatMap { b =>
        b.rows.map { bytes =>
          val row = new UnsafeRow(b.numFields)
          row.pointTo(bytes, bytes.length)
          (row.getLong(0), b.partition)
        }
      }.groupBy(_._1).map { case (k, prs) => k -> prs.map(_._2).distinct }
      assert(keyToPartitions.values.forall(_.size == 1),
        "a join key appeared in row groups of two different hash partitions")
      assert(batches.map(_.partition).distinct.length == 3)
      assert(batches.map(_.rows.length).sum == 2000)
    } finally ExchangeChannel.remove(name)
  }

  test("pipelined partitioned join equals batch join (stream probe, static build)") {
    val probe = sp.range(0, 5000).select(
      (col("id") % 50).as("k"), col("id").as("v"))
    val build = sp.range(0, 50).select(
      col("id").as("k"), concat(lit("g"), (col("id") % 5).cast("string")).as("grp"))
    val out = PipelinedExchange.run(sp, probe, "xspec-join",
      src => src.join(build, "k")
        .groupBy("grp").agg(sum("v").as("s"), count(lit(1)).as("n")),
      rowsPerBatch = 512, partitionKeys = Seq(col("k")), numPartitions = 3)
    val want = probe.join(build, "k")
      .groupBy("grp").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("grp").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = out.orderBy("grp").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("producer failure fails the consumer loudly") {
    val boom = udf((v: Long) =>
      if (v == 1500L) throw new RuntimeException("producer exploded") else v)
    val df = sp.range(0, 3000).repartition(1).select(boom(col("id")).as("v"))
    intercept[Exception] {
      PipelinedExchange.run(sp, df, "xspec-fail",
        src => src.agg(count(lit(1)).as("n")), rowsPerBatch = 100)
    }
  }

  test("consumer SETUP failure (bad plan) releases blocked producer tasks") {
    val df = sp.range(0, 5000).repartition(1).select(col("id").as("v"))
    val name = ExchangeChannel.freshName("xspec-setupfail")
    val (ch, fut) = PipelinedExchange.produce(df, name,
      rowsPerBatch = 100, capacity = 1)
    try {
      // build() references a nonexistent column: the consumer dies before
      // its query ever starts — the channel must still be poisoned or the
      // backpressured producer tasks hold their slots forever
      intercept[Exception] {
        PipelinedExchange.consume(sp, name,
          src => src.select(col("no_such_column")))
      }
      intercept[Exception] { fut.join() }
      assert(ch.failed.isDefined)
    } finally ExchangeChannel.remove(name)
  }

  test("dead consumer releases blocked producer tasks") {
    val df = sp.range(0, 5000).repartition(1).select(col("id").as("v"))
    val name = ExchangeChannel.freshName("xspec-release")
    val (ch, fut) = PipelinedExchange.produce(df, name,
      rowsPerBatch = 100, capacity = 1)
    try {
      Thread.sleep(500)
      assert(!fut.isDone)
      ch.fail(new RuntimeException("consumer died"))
      // the blocked append must observe the failure and the task fail —
      // the producer job terminates instead of hanging forever
      intercept[Exception] { fut.join() }
    } finally ExchangeChannel.remove(name)
  }

  test("uncommitted row groups replay identically (streaming retry contract)") {
    val df = sp.range(0, 1000).repartition(1).select(col("id").as("v"))
    val name = ExchangeChannel.freshName("xspec-replay")
    val (ch, fut) = PipelinedExchange.produce(df, name,
      rowsPerBatch = 100, capacity = 1000)
    fut.join()
    try {
      val a = ch.range(-1L, 4L)
      val b = ch.range(-1L, 4L)
      assert(a.length == 5 && b.length == 5)
      assert(a.zip(b).forall { case (x, y) =>
        x.seq == y.seq && x.rows.length == y.rows.length &&
          x.rows.zip(y.rows).forall { case (r1, r2) => r1.sameElements(r2) }
      })
      // committed row groups are released; re-planning them must refuse
      ch.commitUpTo(4L)
      intercept[IllegalArgumentException] { ch.range(-1L, 4L) }
      // but later ranges still plan
      assert(ch.range(4L, 9L).length == 5)
    } finally ExchangeChannel.remove(name)
  }
}
