package graft

import graft.streaming.{ExchangeChannel, PipelinedExchange}
import org.apache.spark.sql.functions._

/** Phase profiler for the S17 exchange:
  *   sbt 'Test/runMain graft.ProfileX /root/testdata/sf0.1'
  * Times (a) the plain batch agg, (b) producer push alone, (c) consumer
  * drain of a pre-filled closed channel, (d) the full pipelined run, and
  * dumps the consumer's micro-batch progress. */
object ProfileX {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_linestatus"), col("l_quantity"), col("l_extendedprice"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag", "l_linestatus")
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFX $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm the parquet scan
    li.count()
    time("batch_agg")(agg(li).collect())
    time("batch_agg2")(agg(li).collect())

    // producer alone
    val n1 = ExchangeChannel.freshName("profx-prod")
    time("producer_only") {
      val (ch, fut) = PipelinedExchange.produce(li, n1, capacity = 1000)
      fut.join()
    }
    // consumer alone over the pre-filled closed channel
    time("consumer_only") {
      val out = PipelinedExchange.consume(s, n1, agg,
        statePartitions = Some(8), minGroupsPerTrigger = 8)
      out.collect()
    }
    ExchangeChannel.remove(n1)
    s.streams.active.foreach(_.stop())
    // progress of the last consumer query
    val t0 = System.nanoTime()
    val n2 = ExchangeChannel.freshName("profx-prog")
    val (ch2, fut2) = PipelinedExchange.produce(li, n2, capacity = 1000)
    fut2.join()
    val src = s.readStream.format("gpx-exchange").option("channel", n2)
      .option("minGroupsPerTrigger", "8").load()
    val q = agg(src).writeStream.format("memory").queryName("profx_prog")
      .outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("profx_prog").toString)
      .start()
    println(f"PROFX start_returned ${(System.nanoTime() - t0) / 1e9}%.2f s")
    q.processAllAvailable()
    println(f"PROFX drained ${(System.nanoTime() - t0) / 1e9}%.2f s")
    q.recentProgress.foreach(p => println(s"PROFX progress $p"))
    q.stop()
    ExchangeChannel.remove(n2)

    time("full_run") {
      PipelinedExchange.run(s, li, "profx-full", agg,
        statePartitions = Some(8), minGroupsPerTrigger = 8).collect()
    }
    time("full_run2") {
      PipelinedExchange.run(s, li, "profx-full", agg,
        statePartitions = Some(8), minGroupsPerTrigger = 8).collect()
    }
    s.stop()
  }
}
