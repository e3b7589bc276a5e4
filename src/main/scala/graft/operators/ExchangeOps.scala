package graft.operators

import graft.{Det, GQuery, Tables}
import graft.streaming.PipelinedExchange
import org.apache.spark.sql.functions._

/** Oracle gates for the S17 pipelined exchange: the SAME aggregations the
  * relational family verifies, computed with the intermediate data flowing
  * through a producer->channel->consumer exchange instead of a
  * materialized Spark shuffle — any row lost, duplicated, or torn at the
  * exchange boundary fails the DuckDB hash compare.
  *
  * Reference: stream-mode operator DAGs (ExchangeMethod.stream,
  * pixels-planner PixelsPlanner.java:88-98) compute identical answers to
  * batch mode; these gates assert the same batch/stream equivalence.
  */
object ExchangeOps {

  /** producer-task cap leaves slots for the consumer stage */
  private def probeParts(s: org.apache.spark.sql.SparkSession): Int =
    PipelinedExchange.maxProducerTasks(s)

  val queries: Seq[GQuery] = Seq(

    // Scan -> pipelined exchange -> grouped aggregation (the reference's
    // ScanStreamOperator feeding an aggregation worker).
    GQuery("x01_exchange_agg", (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
      PipelinedExchange.run(s, li, "x01",
        src => src.groupBy("l_returnflag", "l_linestatus")
          .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
            Det.dsum(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n")),
        statePartitions = Some(8), minGroupsPerTrigger = 8)
        .orderBy("l_returnflag", "l_linestatus")
    },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${Det.o.dsum("l_quantity")} AS sum_qty,
              |  ${Det.o.dsum("l_extendedprice")} AS sum_price,
              |  COUNT(*) AS n
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Partitioned pipelined join: orders STREAM through the exchange as
    // hash-pure row groups and join the materialized customer build side
    // micro-batch by micro-batch (the reference's
    // PartitionedJoinStreamOperator: populate small table, stream the
    // large side). Partitioned mode here exercises the channel-level
    // "row group = hash partition" contract under the oracle — the SQL
    // consumer still plans its own shuffle (see PipelinedExchange doc).
    GQuery("x02_exchange_join", (s, d) => {
      val probe = Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice"))
      val build = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      PipelinedExchange.run(s, probe, "x02",
        src => src.join(build, src("o_custkey") === build("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(Det.dsum(col("o_totalprice")).as("sum_price"),
            count(lit(1)).as("n")),
        partitionKeys = Seq(col("o_custkey")), numPartitions = probeParts(s),
        statePartitions = Some(8), minGroupsPerTrigger = 8)
        .orderBy("c_mktsegment")
    },
      Some(s"""SELECT c_mktsegment,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price,
              |  COUNT(*) AS n
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )
}
