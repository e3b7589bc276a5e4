package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends GraftSpec {

  test("q01 scan+filter+project: filtered rows only, projected schema") {
    val df = run("q01_scan_filter_project")
    assert(df.columns.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
    assert(df.filter(col("l_quantity") >= 10).count() == 0)
    assert(df.count() > 0)
  }

  test("q03 TPC-H Q1: six (returnflag, linestatus) groups, counts add up") {
    val df = run("q03_tpch_q1_agg").cache()
    assert(df.count() <= 6 && df.count() > 0)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp_ntz")).count()
    assert(total == expected)
  }

  test("q04 TPC-H Q6: single row, revenue positive") {
    val r = run("q04_tpch_q6_global_agg").head
    assert(r.getDouble(0) > 0 && r.getLong(1) > 0)
  }

  test("q05 broadcast join plan actually broadcasts") {
    val plan = run("q05_join_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q06 merge hint yields sort-merge join") {
    val plan = run("q06_join_sortmerge").queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
  }

  test("q07 shuffle_hash hint yields shuffled hash join") {
    val plan = run("q07_join_shuffledhash").queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"))
  }

  test("q08 top-k: at most 10 rows, descending revenue") {
    val rows = run("q08_tpch_q3_topk").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q09 left outer: one row per customer") {
    assert(run("q09_join_left_outer").count() ==
      Tables.customer(spark, sf).count())
  }

  test("q11/q12 semi+anti partition customers") {
    val semi = run("q11_join_semi").count()
    val anti = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(semi >= 0 && anti >= 0)
    assert(semi <= Tables.customer(spark, sf).count())
  }

  test("q13 top-k ordered desc by totalprice") {
    val rows = run("q13_sort_limit_topk").collect()
    assert(rows.length == 15)
    val p = rows.map(_.getAs[Double]("o_totalprice"))
    assert(p.zip(p.tail).forall { case (a, b) => a >= b })
  }

  test("q16 window: rn bounded by 3, running sum monotone in partition") {
    val rows = run("q16_window_rank").collect()
    assert(rows.forall(_.getAs[Int]("rn") <= 3))
  }

  test("q22 posexplode: 64 elements per vector") {
    val df = run("q22_explode_posexplode")
    assert(df.groupBy("vec_id").count().filter(col("count") =!= 64).count() == 0)
  }
}
