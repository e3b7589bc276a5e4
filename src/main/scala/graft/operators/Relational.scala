package graft.operators

import graft.{Det, GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator surface (SURVEY.md §2.1 S1-S14 + §2.2).
  *
  * Every query is declared via the DataFrame API so Catalyst plans it:
  * filter/projection pushdown into the parquet scan (S1/S2/S4), partial+
  * final hash aggregation (S10/S11/S14), broadcast vs shuffled vs sort-merge
  * join strategies (S5/S6/S7), exchanges (S9), sort/limit (S13) — all the
  * things the reference hand-builds in pixels-executor / pixels-turbo
  * (e.g. HashJoiner.java:50, Aggregator.java:75, BaseSortWorker.java:63).
  *
  * Determinism: every output is totally ordered; doubles go through exact
  * decimal arithmetic (see graft.Det); timestamps are emitted as DATE or
  * TIMESTAMP_NTZ (naive on both engines).
  */
object Relational {
  import Det.{dec, dsum, dsumE, davg, revenueTerm, chargeTerm}

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  val queries: Seq[GQuery] = Seq(

    // S1/S2/S4: columnar scan with predicate + projection pushdown.
    GQuery("q01_scan_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1999-01-01") && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity < 10
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S2: compound predicates — IN list, BETWEEN, LIKE, OR, AND.
    GQuery("q02_filter_predicates",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(1000.0, 5000.0) &&
          (col("o_orderpriority").like("1%") || col("o_orderpriority").like("5%")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
             |FROM orders
             |WHERE o_orderstatus IN ('O','F')
             |  AND o_totalprice BETWEEN 1000.0 AND 5000.0
             |  AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%')
             |ORDER BY o_orderkey""".stripMargin)),

    // S10/S11: TPC-H Q1 — grouped partial+final agg, SUM/AVG/COUNT.
    GQuery("q03_tpch_q1_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
          dsumE(chargeTerm(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${Det.o.dsum("l_quantity")} AS sum_qty,
              |  ${Det.o.dsum("l_extendedprice")} AS sum_base_price,
              |  ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS sum_disc_price,
              |  ${Det.o.dsumE(Det.o.chargeTerm("l_extendedprice", "l_discount", "l_tax"))} AS sum_charge,
              |  ${Det.o.davg("l_quantity")} AS avg_qty,
              |  ${Det.o.davg("l_extendedprice")} AS avg_price,
              |  ${Det.o.davg("l_discount")} AS avg_disc,
              |  COUNT(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q6 — global aggregate over pushed-down range predicates.
    GQuery("q04_tpch_q6_global_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          dsumE(dec(col("l_extendedprice")) * col("l_discount").cast(Det.D32)).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // S5: broadcast hash join — small dim broadcast to every partition of
    // the big probe side (reference: HashJoiner.java:50-129).
    GQuery("q05_join_broadcast",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(col("p_size") <= 15)
        .groupBy("p_brand")
        .agg(dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand"),
      Some(s"""SELECT p_brand,
              |  ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS revenue,
              |  COUNT(*) AS n_items
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE p_size <= 15
              |GROUP BY p_brand
              |ORDER BY p_brand""".stripMargin)),

    // S7: sort-merge join (both sides shuffled+sorted on the key —
    // reference SortedJoiner.java:36-286).
    GQuery("q06_join_sortmerge",
      (s, d) => Tables.orders(s, d).hint("merge")
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some(s"""SELECT o_orderstatus, ${Det.o.dsum("l_extendedprice")} AS sum_price, COUNT(*) AS n
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // S6: partitioned (shuffled) hash join — reference
    // BasePartitionedJoinWorker.java:66 + Partitioner.java:39.
    GQuery("q07_join_shuffledhash",
      (s, d) => Tables.supplier(s, d).hint("shuffle_hash")
        .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("s_name"),
      Some(s"""SELECT s_name, ${Det.o.dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
              |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
              |GROUP BY s_name
              |ORDER BY s_name""".stripMargin)),

    // S8-style chain of joins + TPC-H Q3 shape: filter, 3-way join,
    // grouped agg, top-k by computed measure.
    GQuery("q08_tpch_q3_topk",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < ts("1998-01-01"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > ts("1998-01-01"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast(DateType).as("orderdate"))
        .agg(dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
              |  ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |  AND l_shipdate > TIMESTAMP '1998-01-01'
              |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
              |ORDER BY revenue DESC, l_orderkey
              |LIMIT 10""".stripMargin)),

    // Left outer join preserving unmatched build rows
    // (reference Joiner.writeLeftOuter, HashJoiner.java:129).
    GQuery("q09_join_left_outer",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price
              |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              |GROUP BY c_custkey
              |ORDER BY c_custkey""".stripMargin)),

    // Full outer join with unmatched rows on BOTH sides (JoinType EQUI_FULL,
    // reference join/JoinType.java:28-44). Null sort order pinned explicitly.
    GQuery("q10_join_full_outer",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_custkey") % 3 =!= 0)
        val o = Tables.orders(s, d).filter(col("o_custkey") % 2 === 0)
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full")
          .select(col("c_custkey"), col("o_custkey"), col("n_orders"))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_custkey"))
      },
      Some("""SELECT c_custkey, o_custkey, n_orders
             |FROM (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c
             |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
             |           WHERE o_custkey % 2 = 0 GROUP BY o_custkey) o
             |  ON c_custkey = o_custkey
             |ORDER BY c_custkey ASC NULLS FIRST, o_custkey ASC NULLS FIRST""".stripMargin)),

    // Semi join = EXISTS subquery (TPC-H Q4/Q18 shape).
    GQuery("q11_join_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Anti join = NOT EXISTS (TPC-H Q22 shape).
    GQuery("q12_join_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // S13: global sort + limit → TakeOrderedAndProject (top-k without
    // a full global sort at scale).
    GQuery("q13_sort_limit_topk",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin)),

    // UNION / INTERSECT / EXCEPT (Calcite ENUMERABLE_UNION/INTERSECT/MINUS).
    GQuery("q14_set_ops",
      (s, d) => {
        val o = Tables.orders(s, d)
        val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
        val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        val c = o.filter(col("o_totalprice") > 400000.0).select(col("o_custkey").as("k"))
        a.intersect(b).except(c).orderBy("k")
      },
      Some("""(SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
             | INTERSECT
             | SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
             |EXCEPT
             |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
             |ORDER BY k""".stripMargin)),

    // Distinct aggregation (TPC-H Q16 shape; Calcite
    // AGGREGATE_EXPAND_DISTINCT_AGGREGATES).
    GQuery("q15_distinct_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
             |  COUNT(*) AS n_orders
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Window functions: ranking + lag + running sum over a deterministic
    // total order (Calcite ENUMERABLE_WINDOW_RULE).
    GQuery("q16_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("running_price", sum(dec(col("o_totalprice"))).over(run).cast(DoubleType))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice", "prev_price", "running_price")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice, prev_price, running_price
             |FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER w AS rn,
             |    LAG(o_totalprice, 1) OVER w AS prev_price,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |      (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             |) t WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // CASE WHEN inside aggregation (TPC-H Q12/Q14 shape).
    GQuery("q17_case_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("low_line_count"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // String functions: LIKE, substring, concat, upper, length (TPC-H
    // Q2/Q9/Q13/Q14/Q16/Q22 scalar surface).
    GQuery("q18_string_funcs",
      (s, d) => Tables.part(s, d)
        .filter(col("p_type").like("%AND%") || col("p_type").like("PROMO%"))
        .select(
          col("p_partkey"),
          concat(col("p_brand"), lit("_"), substring(col("p_type"), 1, 3)).as("code"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  p_brand || '_' || substring(p_type, 1, 3) AS code,
             |  upper(p_name) AS uname,
             |  CAST(length(p_name) AS INT) AS name_len
             |FROM part
             |WHERE p_type LIKE '%AND%' OR p_type LIKE 'PROMO%'
             |ORDER BY p_partkey""".stripMargin)),

    // Date/time functions: EXTRACT(year/month), date grouping (TPC-H Q7/8/9).
    GQuery("q19_date_funcs",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(year(col("l_shipdate")).as("ship_year"),
          month(col("l_shipdate")).as("ship_month"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .filter(col("ship_year") < 1998)
        .orderBy("ship_year", "ship_month"),
      Some(s"""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
              |  CAST(month(l_shipdate) AS INT) AS ship_month,
              |  COUNT(*) AS n, ${Det.o.dsum("l_extendedprice")} AS sum_price
              |FROM lineitem
              |GROUP BY 1, 2 HAVING CAST(year(l_shipdate) AS INT) < 1998
              |ORDER BY ship_year, ship_month""".stripMargin)),

    // Correlated scalar subquery (TPC-H Q17 shape) — expressed Spark-side
    // as a grouped self-join (what Catalyst's decorrelator produces anyway).
    GQuery("q20_correlated_subquery",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // NO broadcast hint: avg_qty has |part| cardinality (millions of
        // rows per sf) — forcing it past autoBroadcastJoinThreshold would
        // collect a multi-GB aggregate to the driver at scale. AQE
        // promotes the join when the aggregate actually is small; at
        // large sf the shuffled hash join on l_partkey is the plan a
        // decorrelated Q17 wants anyway.
        val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
          .agg((sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"))
        li.join(avgQty, col("l_partkey") === col("ap_partkey"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("n"))
      },
      Some(s"""SELECT ${Det.o.dsum("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n
              |FROM lineitem l1
              |WHERE l_quantity < 0.5 * (
              |  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
              |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)),

    // Top-k per group via window (distributed alternative to per-group sort).
    GQuery("q21_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy("l_suppkey", "rn")
      },
      Some("""SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
             |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             |        ROW_NUMBER() OVER (PARTITION BY l_suppkey
             |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |      FROM lineitem) t
             |WHERE rn <= 2
             |ORDER BY l_suppkey, rn""".stripMargin)),

    // Explode / unnest with ordinality (Calcite ENUMERABLE_UNCOLLECT).
    GQuery("q22_explode_posexplode",
      (s, d) => Tables.embeddings(s, d)
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("idx", "val")))
        .select(col("vec_id"), col("idx"), col("val").cast(DoubleType).as("val"))
        .orderBy("vec_id", "idx"),
      Some("""SELECT vec_id,
             |  CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS idx,
             |  CAST(unnest(embedding) AS DOUBLE) AS val
             |FROM embeddings WHERE vec_id < 5
             |ORDER BY vec_id, idx""".stripMargin)),

    // 5-table star join through the full dimension chain (TPC-H Q5 shape);
    // small dims broadcast, fact side stays partitioned.
    GQuery("q23_tpch_q5_star",
      (s, d) => Tables.region(s, d)
        .filter(col("r_name").isin("AMERICA", "ASIA"))
        .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("n_name")
        .agg(dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("n_name"),
      Some(s"""SELECT n_name,
              |  ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS revenue,
              |  COUNT(*) AS n
              |FROM region
              |JOIN nation ON r_regionkey = n_regionkey
              |JOIN customer ON n_nationkey = c_nationkey
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE r_name IN ('AMERICA','ASIA')
              |GROUP BY n_name
              |ORDER BY n_name""".stripMargin)),

    // Min/max aggregate parity (reference FunctionType SUM/MIN/MAX/COUNT,
    // aggregation/function/FunctionType.java:31-37).
    GQuery("q24_minmax_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          min(col("l_shipdate").cast(DateType)).as("min_ship"),
          max(col("l_shipdate").cast(DateType)).as("max_ship"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
             |  MIN(CAST(l_shipdate AS DATE)) AS min_ship,
             |  MAX(CAST(l_shipdate AS DATE)) AS max_ship,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Inline VALUES relation joined against a table (Calcite
    // ENUMERABLE_VALUES_RULE parity) — broadcast by construction.
    GQuery("q25_values_join",
      (s, d) => {
        import s.implicits._
        val weights = Seq(
          ("1-URGENT", 10), ("2-HIGH", 5), ("3-MEDIUM", 3),
          ("4-NOT SPECIFIED", 1), ("5-LOW", 0))
          .toDF("prio", "weight")
        Tables.orders(s, d)
          .join(broadcast(weights), col("o_orderpriority") === col("prio"))
          .groupBy("o_orderstatus")
          .agg(sum(col("weight")).as("total_weight"), count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(SUM(weight) AS BIGINT) AS total_weight, COUNT(*) AS n
             |FROM orders
             |JOIN (VALUES ('1-URGENT', 10), ('2-HIGH', 5), ('3-MEDIUM', 3),
             |             ('4-NOT SPECIFIED', 1), ('5-LOW', 0)) AS w(prio, weight)
             |  ON o_orderpriority = prio
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // Date arithmetic: interval add, date_add, month bucketing (TPC-H
    // Q1/Q4/Q5 date windows use exactly this surface).
    GQuery("q26_date_arith",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < add_months(ts("1996-01-01"), 6))
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          min(date_add(col("o_orderdate").cast(DateType), 30)).as("min_due"),
          max(col("o_orderdate").cast(DateType)).as("max_day"))
        .orderBy("y", "m"),
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m,
             |  COUNT(*) AS n,
             |  MIN(CAST(o_orderdate AS DATE) + 30) AS min_due,
             |  MAX(CAST(o_orderdate AS DATE)) AS max_day
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-01-01' + INTERVAL 6 MONTH
             |GROUP BY 1, 2
             |ORDER BY y, m""".stripMargin)),

    // TPC-H Q2 shape: join-back to the per-group minimum (min acctbal
    // customer per nation).
    GQuery("q27_min_per_group_joinback",
      (s, d) => {
        val c = Tables.customer(s, d)
        val mins = c.groupBy(col("c_nationkey").as("mn_nationkey"))
          .agg(min(col("c_acctbal")).as("min_bal"))
        c.join(broadcast(mins),
            col("c_nationkey") === col("mn_nationkey") &&
              col("c_acctbal") === col("min_bal"))
          .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
          .orderBy("c_nationkey", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey, c_name, c_acctbal
             |FROM customer c1
             |WHERE c_acctbal = (SELECT MIN(c_acctbal) FROM customer c2
             |                   WHERE c2.c_nationkey = c1.c_nationkey)
             |ORDER BY c_nationkey, c_custkey""".stripMargin)),

    // TPC-H Q11 shape: HAVING against a global scalar subquery fraction.
    GQuery("q28_having_global_fraction",
      (s, d) => {
        val o = Tables.orders(s, d)
        val total = o.agg(Det.dsum(col("o_totalprice")).as("grand")).select("grand")
        o.groupBy("o_custkey")
          .agg(Det.dsum(col("o_totalprice")).as("cust_total"))
          .crossJoin(broadcast(total))
          .filter(col("cust_total") > col("grand") * 0.0005)
          .select("o_custkey", "cust_total")
          .orderBy("o_custkey")
      },
      Some(s"""SELECT o_custkey, ${Det.o.dsum("o_totalprice")} AS cust_total
              |FROM orders
              |GROUP BY o_custkey
              |HAVING ${Det.o.dsum("o_totalprice")} >
              |  (SELECT ${Det.o.dsum("o_totalprice")} FROM orders) * 0.0005
              |ORDER BY o_custkey""".stripMargin)),

    // TPC-H Q13 shape: distribution of customers by their order count
    // (outer join + double aggregation).
    GQuery("q29_double_aggregation",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, COUNT(*) AS custdist
             |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |      GROUP BY c_custkey) t
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q22 full shape: prefix-blocked customers with above-average
    // balances and no orders (avg scalar subquery + anti join).
    GQuery("q30_tpch_q22_shape",
      (s, d) => {
        val c = Tables.customer(s, d)
          .withColumn("code", substring(col("c_name"), -1, 1))
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg((sum(Det.dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
        val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("code")
          .agg(count(lit(1)).as("numcust"), Det.dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy("code")
      },
      Some(s"""SELECT substring(c_name, -1, 1) AS code, COUNT(*) AS numcust,
              |  ${Det.o.dsum("c_acctbal")} AS totacctbal
              |FROM customer c1
              |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
              |                   FROM customer WHERE c_acctbal > 0.0)
              |  AND NOT EXISTS (SELECT 1 FROM orders
              |                  WHERE o_custkey = c1.c_custkey AND o_totalprice > 300000.0)
              |GROUP BY 1
              |ORDER BY code""".stripMargin)),

    // ROLLUP hierarchy aggregation (SURVEY §2.2 notes grouping sets are
    // free in Spark; exercised here so the surface is verified, not just
    // claimed). One Expand + one hash agg — Spark expands each input row
    // into its grouping-set combinations before the shuffle, so partial
    // aggregation still applies; no extra pass per grouping level. The
    // grouping-id column disambiguates rolled-up NULLs from data NULLs
    // and gives a total order without NULL-ordering dialect differences.
    GQuery("q47_rollup_agg",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast(IntegerType).as("gid"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n_rows")
        .orderBy("gid", "l_returnflag", "l_linestatus"),
      Some(s"""SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
              |  l_returnflag, l_linestatus,
              |  ${Det.o.dsum("l_quantity")} AS sum_qty,
              |  COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    // Salted skew join (Skew.saltedJoin): the hot-key defense when one
    // join key dominates a shuffle — the fact side scatters over
    // saltFactor sub-keys, the dim side replicates to all of them, and
    // the hot partition shrinks by saltFactor with identical semantics.
    // Salt values are run-varying but the joined row SET is salt-invariant,
    // so the aggregate is deterministic and oracle-checkable against the
    // plain join.
    GQuery("q48_skew_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_suppkey").as("suppkey"),
            col("l_quantity"), col("l_extendedprice"))
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
        Skew.saltedJoin(li, sup, "suppkey", 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_items"),
            Det.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("s_nationkey")
      },
      Some(s"""SELECT s_nationkey, COUNT(*) AS n_items,
              |  ${Det.o.dsum("l_quantity")} AS sum_qty
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_nationkey
              |ORDER BY s_nationkey""".stripMargin)),

    // Window-function family beyond rank (q16): lag/lead offsets, ntile
    // bucketing, percent_rank/cume_dist distribution ranks — one Exchange
    // on the partition key serves all six functions (they share the same
    // (partition, order) spec, so Catalyst plans a single Window operator;
    // per-partition evaluation is sort-local, no extra shuffle per
    // function). Ties broken by the unique order key for determinism.
    GQuery("q49_window_family",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .filter(col("o_custkey") % 10 === 0)
          .withColumn("rn", row_number().over(w))
          .withColumn("tile4", ntile(4).over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("prank", percent_rank().over(w))
          .withColumn("cdist", cume_dist().over(w))
          .select("o_custkey", "o_orderkey", "rn", "tile4",
            "prev_price", "next_price", "prank", "cdist")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  ROW_NUMBER() OVER w AS rn,
             |  CAST(NTILE(4) OVER w AS INT) AS tile4,
             |  LAG(o_totalprice, 1) OVER w AS prev_price,
             |  LEAD(o_totalprice, 1) OVER w AS next_price,
             |  PERCENT_RANK() OVER w AS prank,
             |  CUME_DIST() OVER w AS cdist
             |FROM orders
             |WHERE o_custkey % 10 = 0
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, rn""".stripMargin))
  )
}
