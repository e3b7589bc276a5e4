package graft.operators

import graft.{Det, GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The TPC-H query corpus beyond the shapes already covered in
  * [[Relational]] — Q4, Q7, Q8, Q9, Q10, Q12, Q14, Q15, Q18, Q19, Q20,
  * Q21, adapted to the driver's TPC-H-ish schema (no partsupp table, no
  * commit/receipt dates or ship modes; synthetic nation/part domains).
  *
  * The reference validates all 22 TPC-H queries through its planner
  * (pixels-parser/src/test/java/io/pixelsdb/pixels/parser/TpchQuery.java:25-46);
  * here each shape is planned by Catalyst from the DataFrame API and
  * hash-checked against a DuckDB oracle.
  *
  * Scale notes: only the provably tiny dims (nation=25, region=5 rows at
  * ANY scale factor) carry broadcast hints; part/supplier/customer joins
  * are left to AQE, which broadcasts them when they fit and shuffles
  * otherwise. Every top-k has a unique-key tiebreaker so LIMIT is
  * deterministic under the driver's hash compare.
  */
object Tpch {
  import Det.{dec, dsum, dsumE, revenueTerm}

  private def ts(s: String) = lit(s).cast("timestamp_ntz")

  /** same flag the dedup/ANN families honor: flips the round-16
    * pre-filter plan shapes (q31 broadcast-EXISTS, q42 Bloom pre-filter,
    * q43 pre-aggregation semi pruning) back onto the legacy shapes so an
    * equivalence leg can hash-compare both at any scale. */
  private def referencePlan(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.dedup.referencePlan").exists(_.toBoolean)

  /** lineitems of 'F' orders shipped >60 days after the order date —
    * built fresh per call site so the Q21 semi/anti self-joins get
    * independent attribute ids (no ambiguous-self-join resolution). */
  private def lateLines(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))

  val queries: Seq[GQuery] = Seq(

    // TPC-H Q4: priority count of orders with at least one late line —
    // EXISTS decorrelates to a left-semi join (equi key + range filter).
    GQuery("q31_tpch_q4_exists_agg", (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      // Broadcast-EXISTS under a measured count gate (round 16, guide
      // §3.1/§3.2 — VERDICT r15 #4): the date window keeps ~4% of orders,
      // but a LEFT-SEMI with orders on the LEFT can only broadcast the
      // RIGHT side (lineitem), so both sides shuffled — 64 MB at sf1 for
      // a ~58k-row probe set. Below the gate the filtered orders
      // broadcast instead: lineitem is consumed map-side (never
      // exchanged) and EXISTS becomes distinct-(orderkey, priority) over
      // the matched pairs — the identical multiset the semi join's
      // projected output carries (o_orderkey is the orders PK; the
      // referencePlan leg hash-verifies the equivalence end to end).
      // Past the gate — at a scale where 3 months of orders no longer
      // fit a broadcast — the legacy semi join stands unchanged.
      val maxB = s.conf.getOption("spark.graft.tpch.existsBroadcastMaxRows")
        .map(_.toLong).getOrElse(2000000L)
      val nFiltered = if (referencePlan(s)) Long.MaxValue else o.count()
      if (nFiltered <= maxB) {
        l.join(broadcast(o.select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate"))
          .select(col("o_orderkey"), col("o_orderpriority"))
          .distinct()
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      } else {
        o.join(l, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      }
    },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
             |  AND o_orderdate < TIMESTAMP '1996-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q7: bilateral shipping volume between two nations by year.
    // The nation dims are pre-filtered to the two names BEFORE the joins
    // so the fact side is pruned by the broadcast hash join, not post-hoc.
    GQuery("q32_tpch_q7_volume_shipping", (s, d) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  CAST(year(l_shipdate) AS INT) AS l_year,
              |  ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS revenue
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
              |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              |GROUP BY 1, 2, 3
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H Q8: national market share — conditional-sum / sum ratio per
    // year. Both sums are exact decimals cast to double, so the division
    // is bit-identical across engines.
    GQuery("q33_tpch_q8_market_share", (s, d) => {
      val vol = revenueTerm(col("l_extendedprice"), col("l_discount"))
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val suppNation = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"), "left_semi")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_2", vol).otherwise(lit(0)))
          .cast(DoubleType) / sum(vol).cast(DoubleType)).as("mkt_share"))
        .orderBy("o_year")
    },
      Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
              |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_2'
              |    THEN ${Det.o.revenueTerm("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE)
              |  / CAST(SUM(${Det.o.revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS mkt_share
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |JOIN region ON n2.n_regionkey = r_regionkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
              |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
              |GROUP BY 1
              |ORDER BY o_year""".stripMargin)),

    // TPC-H Q9: profit by supplier nation and year. No partsupp table, so
    // supply cost is proxied by p_retailprice * quantity — the shape (5-way
    // join, LIKE part filter, decimal-exact profit expression) is intact.
    GQuery("q34_tpch_q9_product_profit", (s, d) => {
      val profit = revenueTerm(col("l_extendedprice"), col("l_discount")) -
        dec(col("p_retailprice")) * dec(col("l_quantity"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").like("%red%")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(dsumE(profit).as("sum_profit"))
        .orderBy("nation", "o_year")
    },
      Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
              |  CAST(SUM(${Det.o.revenueTerm("l_extendedprice", "l_discount")}
              |    - ${Det.o.dec("p_retailprice")} * ${Det.o.dec("l_quantity")}) AS DOUBLE) AS sum_profit
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN orders ON l_orderkey = o_orderkey
              |WHERE p_name LIKE '%red%'
              |GROUP BY 1, 2
              |ORDER BY nation, o_year""".stripMargin)),

    // TPC-H Q10: returned-item revenue per customer, top 20 (tiebreak on
    // the unique custkey keeps LIMIT deterministic).
    GQuery("q35_tpch_q10_returned_items", (s, d) =>
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-10-01") &&
            col("o_orderdate") < ts("1997-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
              |  ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1996-10-01'
              |  AND o_orderdate < TIMESTAMP '1997-01-01'
              |GROUP BY 1, 2, 3, 4
              |ORDER BY revenue DESC, c_custkey
              |LIMIT 20""".stripMargin)),

    // TPC-H Q12: order-priority class counts per line status (ship modes
    // don't exist in this schema; l_linestatus plays the grouping role).
    GQuery("q36_tpch_q12_priority_class", (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .as("low_line_count"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin)),

    // TPC-H Q14: promo revenue share over one month — conditional revenue
    // ratio, single output row.
    GQuery("q37_tpch_q14_promo_revenue", (s, d) => {
      val rev = revenueTerm(col("l_extendedprice"), col("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-09-01") &&
          col("l_shipdate") < ts("1996-10-01"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0)))
          .cast(DoubleType) / sum(rev).cast(DoubleType)).as("promo_revenue"))
    },
      Some(s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
              |    THEN ${Det.o.revenueTerm("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE)
              |  / CAST(SUM(${Det.o.revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS promo_revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
              |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin)),

    // TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    // revenue "view" feeds both the max scalar and the join; revenue
    // doubles are exact decimals so the equality compare is safe.
    GQuery("q38_tpch_q15_top_supplier", (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      Tables.supplier(s, d)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },
      Some(s"""WITH revenue AS (
              |  SELECT l_suppkey,
              |    ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1996-04-01'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, total_revenue
              |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
              |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
              |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q18: large-volume orders — HAVING SUM(qty) pushed into a
    // grouped pre-aggregate, then joined back to orders/customer, top 100.
    GQuery("q39_tpch_q18_large_volume", (s, d) => {
      val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 200.0)
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("o_date"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
              |  o_totalprice, total_qty
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN (SELECT l_orderkey, ${Det.o.dsum("l_quantity")} AS total_qty
              |      FROM lineitem GROUP BY l_orderkey
              |      HAVING ${Det.o.dsum("l_quantity")} > 200.0) t
              |  ON o_orderkey = l_orderkey
              |ORDER BY o_totalprice DESC, o_orderkey
              |LIMIT 100""".stripMargin)),

    // TPC-H Q19: disjunction of conjunctive brand/size/quantity ranges —
    // Catalyst keeps the equi key and evaluates the OR as a join filter.
    GQuery("q40_tpch_q19_disjunctive", (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40)))
        .agg(dsumE(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"),
          count(lit(1)).as("n")),
      Some(s"""SELECT ${Det.o.dsumE(Det.o.revenueTerm("l_extendedprice", "l_discount"))} AS revenue,
              |  COUNT(*) AS n
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
              |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
              |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin)),

    // TPC-H Q20: suppliers who moved serious volume of 'small%' parts in a
    // year, restricted to one region — IN-subquery with HAVING becomes a
    // grouped pre-aggregate + left-semi join (no partsupp, so shipped
    // quantity stands in for availqty).
    GQuery("q41_tpch_q20_part_promotion", (s, d) => {
      val qty = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .join(Tables.part(s, d).filter(col("p_name").like("small%")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 400.0)
      val euroNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      Tables.supplier(s, d)
        .join(broadcast(euroNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(qty, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },
      Some(s"""SELECT s_suppkey, s_name
              |FROM supplier
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'EUROPE'
              |  AND s_suppkey IN (
              |    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
              |    WHERE p_name LIKE 'small%'
              |      AND l_shipdate >= TIMESTAMP '1996-01-01'
              |      AND l_shipdate < TIMESTAMP '1997-01-01'
              |    GROUP BY l_suppkey
              |    HAVING ${Det.o.dsum("l_quantity")} > 400.0)
              |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q21: suppliers who were the SOLE late supplier on a
    // multi-supplier finished order — EXISTS (another supplier on the
    // order) as a left-semi join; NOT EXISTS (another LATE supplier) as a
    // window over the SAME lateLines frame: a line survives that anti
    // condition iff its order's distinct late-supplier set is a singleton,
    // i.e. min == max of l_suppkey per order. One lineitem⋈orders
    // materialization instead of two, and the window's hash partitioning
    // on l_orderkey is the semi join's partitioning too.
    GQuery("q42_tpch_q21_waiting_supplier", (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      val l1base = lateLines(s, d)
        .withColumn("_mn", min("l_suppkey").over(w))
        .withColumn("_mx", max("l_suppkey").over(w))
        .filter(col("_mn") === col("_mx"))
        .drop("_mn", "_mx")
      val others = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
      // Bloom pre-filter on the EXISTS probe (round 16, guide §3.2 —
      // VERDICT r15 #4): `others` is the whole lineitem keyed by
      // orderkey, but only lines of LATE orders (~25% of orders) can
      // semi-match l1 — the rest ride the exchange for nothing (the bulk
      // of q42's 62 MB sf1 stamp). A Bloom filter over l1's orderkeys
      // (persisted, so the build materializes the cache the main join
      // reuses) drops them map-side; false positives only re-admit rows
      // the semi join drops anyway, so the result is unchanged. Gated on
      // the SCAN size (same discipline as Spark's own
      // runtime.bloomFilter applicationSideScanSizeThreshold): below
      // the threshold the build action costs more than the exchange it
      // saves. The referencePlan leg always runs unfiltered.
      val minBytes = s.conf.getOption("spark.graft.tpch.bloomMinScanBytes")
        .map(_.toLong).getOrElse(64L << 20)
      val liBytes = Tables.lineitem(s, d)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val (l1, othersF) =
        if (referencePlan(s) || liBytes < BigInt(minBytes)) (l1base, others)
        else {
          import graft.CacheScope.Trackable
          val l1c = l1base.tracked
          // expectedNumItems: the orders row count is a cheap metadata
          // upper bound on distinct late orderkeys (1% fpp ~ 1.2 B/key)
          val nOrders = math.max(1000L, Tables.orders(s, d).count())
          val bf = l1c.stat.bloomFilter("l_orderkey", nOrders, 0.01)
          val bfB = s.sparkContext.broadcast(bf)
          val mightMatch = udf((k: Long) => bfB.value.mightContainLong(k))
          (l1c, others.filter(mightMatch(col("x_orderkey"))))
        }
      l1
        .join(othersF, col("x_orderkey") === col("l_orderkey") &&
          col("x_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(50)
    },
      Some("""SELECT s_name, COUNT(*) AS numwait
             |FROM lineitem l1
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |WHERE o_orderstatus = 'F'
             |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name
             |LIMIT 50""".stripMargin)),

    // TPC-H Q2 shape (adapted: no partsupp — the per-(part,supplier)
    // offer relation derives from lineitem as MIN extendedprice):
    // region-scoped min-cost supplier per part. The correlated MIN
    // decorrelates to one per-part aggregate joined back; the
    // region-filtered offer relation is computed ONCE and feeds both the
    // candidates and the minima (the oracle re-derives it per row).
    // MIN of a double set is exact, so the cost equality is safe.
    GQuery("q43_tpch_q2_min_cost_supplier", (s, d) => {
      val regionalSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
      val sizedParts = Tables.part(s, d).filter(col("p_size") === 5)
        .select(col("p_partkey"), col("p_brand"))
      // Pre-aggregation semi pruning (round 16, guide §3.2 — VERDICT r15
      // #4): the offers groupBy shuffled EVERY lineitem (partkey,
      // suppkey, price) — q43's 129 MB sf1 stamp — yet the query keeps
      // only ASIA suppliers (~1/5) and size-5 parts (~1/50). Both
      // predicates filter on GROUP KEYS, so dropping non-qualifying rows
      // BEFORE the aggregate leaves every surviving (part, supplier)
      // group's row set — and its MIN — bit-identical, and the per-part
      // minimum is over regional offers of that same part, unaffected by
      // other parts. Gated on the dims fitting a broadcast (cheap
      // metadata row counts); past the gate, and always under
      // referencePlan, the unpruned aggregate stands.
      val maxDim = s.conf.getOption("spark.graft.tpch.semiBroadcastMaxRows")
        .map(_.toLong).getOrElse(2000000L)
      val prune = !referencePlan(s) &&
        Tables.part(s, d).count() <= maxDim &&
        Tables.supplier(s, d).count() <= maxDim
      val offersIn =
        if (!prune) Tables.lineitem(s, d)
        else Tables.lineitem(s, d)
          .join(broadcast(sizedParts.select(col("p_partkey").as("_pp"))),
            col("l_partkey") === col("_pp"), "left_semi")
          .join(broadcast(regionalSupp.select(col("s_suppkey").as("_ss"))),
            col("l_suppkey") === col("_ss"), "left_semi")
      val offers = offersIn
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("cost"))
      val regional = offers
        .join(regionalSupp, col("l_suppkey") === col("s_suppkey"))
      val minCost = regional.groupBy(col("l_partkey").as("mc_pk"))
        .agg(min(col("cost")).as("min_cost"))
      regional
        .join(minCost, col("l_partkey") === col("mc_pk") &&
          col("cost") === col("min_cost"))
        .join(sizedParts, col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("cost"))
        .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
        .limit(20)
    },
      Some("""WITH offers AS (
             |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
             |  FROM lineitem GROUP BY 1, 2),
             |regional AS (
             |  SELECT l_partkey, cost, s_acctbal, s_name, n_name
             |  FROM offers
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'ASIA')
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost
             |FROM part JOIN regional ON p_partkey = l_partkey
             |WHERE p_size = 5
             |  AND cost = (SELECT MIN(r2.cost) FROM regional r2
             |              WHERE r2.l_partkey = p_partkey)
             |ORDER BY s_acctbal DESC, s_name, p_partkey
             |LIMIT 20""".stripMargin)),

    // TPC-H Q11 shape (adapted: part value := exact-decimal sum of
    // lineitem extendedprice, scoped to one nation's suppliers):
    // per-part value + HAVING against a global-scalar fraction of the
    // SAME scoped relation — the scoped fact side is built once, the
    // global total broadcast back as a scalar (vs q28's single-table
    // form, this one scopes through a dim join on both sides).
    GQuery("q44_tpch_q11_important_parts", (s, d) => {
      val scoped = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
            .join(broadcast(Tables.nation(s, d)
              .filter(col("n_name") === "NATION_3")),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), col("l_extendedprice"))
      val total = scoped.agg(dsum(col("l_extendedprice")).as("grand"))
      scoped.groupBy(col("l_partkey"))
        .agg(dsum(col("l_extendedprice")).as("part_value"))
        .crossJoin(broadcast(total))
        .filter(col("part_value") > col("grand") * 0.001)
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },
      Some(s"""WITH scoped AS (
              |  SELECT l_partkey, l_extendedprice
              |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation ON s_nationkey = n_nationkey
              |  WHERE n_name = 'NATION_3')
              |SELECT l_partkey, ${Det.o.dsum("l_extendedprice")} AS part_value
              |FROM scoped
              |GROUP BY l_partkey
              |HAVING ${Det.o.dsum("l_extendedprice")} >
              |  (SELECT ${Det.o.dsum("l_extendedprice")} FROM scoped) * 0.001
              |ORDER BY part_value DESC, l_partkey""".stripMargin)),

    // TPC-H Q16 shape (adapted: the part-supplier relation is lineitem's
    // (part, supplier) pairs; the complaints exclusion becomes
    // negative-balance suppliers): NOT IN over a provably tiny set ->
    // broadcast anti join, then COUNT(DISTINCT) per group.
    GQuery("q45_tpch_q16_supplier_cnt", (s, d) => {
      val excluded = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(excluded),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.part(s, d).filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 3, 5, 7, 9))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
      Some("""SELECT p_brand, p_type, p_size,
             |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1'
             |  AND p_size IN (1, 3, 5, 7, 9)
             |  AND l_suppkey NOT IN
             |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // avg threshold is rewritten EXACTLY — qty < 0.2 * avg(qty) <=>
    // 5 * qty * cnt < sum(qty) in exact decimal arithmetic — so row
    // membership is bit-identical across engines (a double avg could
    // flip boundary rows). Decorrelated to a per-part agg + join.
    GQuery("q46_tpch_q17_small_qty_revenue", (s, d) => {
      val pstats = Tables.lineitem(s, d).groupBy(col("l_partkey").as("ps_pk"))
        .agg(sum(dec(col("l_quantity"))).as("qty_sum"),
          count(lit(1)).as("qty_cnt"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#23")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(pstats, col("l_partkey") === col("ps_pk"))
        .filter(dec(col("l_quantity")) * lit(5) * col("qty_cnt") < col("qty_sum"))
        .agg(dsum(col("l_extendedprice")).as("small_qty_revenue"))
    },
      Some(s"""SELECT ${Det.o.dsum("l_extendedprice")} AS small_qty_revenue
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN (SELECT l_partkey AS ps_pk,
              |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
              |        COUNT(*) AS qty_cnt
              |      FROM lineitem GROUP BY 1) ps ON ps_pk = p_partkey
              |WHERE p_brand = 'Brand#23'
              |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qty_cnt < qty_sum""".stripMargin))
  )
}
