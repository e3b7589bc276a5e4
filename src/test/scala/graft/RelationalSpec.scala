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

  test("q47 rollup: levels reconcile and plan is one Expand + one agg pass") {
    // logical shape first (before caching): rollup is ONE Expand feeding
    // one partial+final agg chain, not a scan pass per grouping level
    val nExpand = run("q47_rollup_agg").queryExecution.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }.size
    assert(nExpand == 1, s"expected one Expand, got $nExpand")
    val rows = run("q47_rollup_agg").cache()
    val detail = rows.filter(col("gid") === 0)
    val byFlag = rows.filter(col("gid") === 1)
    val total = rows.filter(col("gid") === 3).collect()
    assert(total.length == 1, "exactly one grand-total row")
    assert(rows.filter(col("gid") === 2).count() == 0,
      "rollup (not cube) must not emit linestatus-only groups")
    // each level sums to the same totals (one agg job per level)
    val sumOf = (df: org.apache.spark.sql.DataFrame) => {
      val r = df.agg(sum("sum_qty"), sum("n_rows")).head
      (r.getDouble(0), r.getLong(1))
    }
    val (dq, dn) = sumOf(detail)
    val (fq, fn) = sumOf(byFlag)
    assert(math.abs(dq - fq) < 1e-6 && dn == fn)
    assert(math.abs(dq - total.head.getAs[Double]("sum_qty")) < 1e-6)
    assert(dn == total.head.getAs[Long]("n_rows"))
    rows.unpersist()
  }

  test("q49 window family: all six functions share ONE Window operator") {
    val qe = run("q49_window_family").queryExecution
    val windows = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 1,
      s"same (partition, order) spec must fuse into one Window, got ${windows.size}")
    assert(windows.head.windowExpressions.size == 6)
    val rows = run("q49_window_family").cache()
    // ntile buckets within 1..4 and non-decreasing along rn
    assert(rows.filter(col("tile4") < 1 || col("tile4") > 4).count() == 0)
    // percent_rank endpoints: first row of each partition is 0.0
    assert(rows.filter(col("rn") === 1 && col("prank") =!= 0.0).count() == 0)
    // lag of the first row is null, lead of the last row is null
    assert(rows.filter(col("rn") === 1 && col("prev_price").isNotNull)
      .count() == 0)
    rows.unpersist()
  }
}
