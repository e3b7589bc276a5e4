package graft

import graft.Offload._

/** The amphi-coordinator contract (reference Coordinator.java:70-104,
  * PlanAnalysis, PeerDownloader): required-column analysis from the
  * analyzed plan, the coverage decision, partial-schema download, and
  * routed execution whose on-prem answers match the cloud's. */
class OffloadSpec extends GraftSpec {

  private def withBase[T](body: => T): T = {
    Offload.registerBase(spark, sf)
    body
  }

  test("requiredColumns: filter/join/group/sort columns all count, unreferenced do not") {
    withBase {
      val req = requiredColumns(spark,
        """SELECT c_mktsegment, count(*) AS n
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |WHERE o_totalprice > 500.0
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      assert(req("customer") == Set("c_custkey", "c_mktsegment"))
      assert(req("orders") == Set("o_custkey", "o_totalprice"))
    }
  }

  test("requiredColumns: self-joins union occurrences; subquery plans are included") {
    withBase {
      val selfJoin = requiredColumns(spark,
        """SELECT a.o_orderkey FROM orders a JOIN orders b
          |ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
          |WHERE b.o_totalprice > 100.0""".stripMargin)
      assert(selfJoin("orders") ==
        Set("o_orderkey", "o_custkey", "o_totalprice"))
      val scalarSub = requiredColumns(spark,
        """SELECT o_orderpriority FROM orders
          |WHERE o_totalprice > (SELECT avg(c_acctbal) FROM customer)""".stripMargin)
      assert(scalarSub("orders") == Set("o_orderpriority", "o_totalprice"))
      assert(scalarSub("customer") == Set("c_acctbal"))
    }
  }

  test("requiredColumns: count(*) needs the table but no columns; VALUES is no table") {
    withBase {
      val req = requiredColumns(spark,
        "SELECT count(*) AS n FROM orders, (VALUES (1), (2)) v(x)")
      assert(req.keySet == Set("orders"))
      assert(req("orders").isEmpty)
    }
  }

  test("decideInCloud: covered -> on-prem; missing column or missing table -> cloud") {
    withBase {
      val peer = Peer("edge", "/nowhere", Map(
        "orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice")))
      assert(!decideInCloud(spark,
        "SELECT sum(o_totalprice) AS s FROM orders", peer))
      // count(*)-only still needs the table's rows: present -> on-prem
      assert(!decideInCloud(spark, "SELECT count(*) AS n FROM orders", peer))
      // a referenced column outside the subset forces cloud
      assert(decideInCloud(spark,
        "SELECT o_orderpriority FROM orders", peer))
      // a table the peer never downloaded forces cloud even when covered
      assert(decideInCloud(spark,
        """SELECT count(*) AS n FROM orders
          |JOIN customer ON c_custkey = o_custkey""".stripMargin, peer))
    }
  }

  test("download + routed execution: on-prem scans the peer copies and matches the cloud answer") {
    val dir = tempDir("offload_peer")
    val peer = Peer("edge", dir,
      Map("orders" -> Seq("o_custkey", "o_totalprice"),
        "customer" -> Seq("c_custkey", "c_mktsegment")))
    download(spark, sf, peer)
    val sql =
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin
    val (onPrem, inCloud) = Offload.execute(spark, sql, sf, peer)
    assert(!inCloud)
    val files = onPrem.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(dir)),
      s"on-prem plan must scan only the peer dir, got ${files.take(3).mkString(",")}")
    // the partial copies are column-pruned: the downloaded orders file
    // carries exactly the requested subset
    val copied = spark.read.parquet(s"$dir/orders.parquet")
    assert(copied.schema.fieldNames.sorted.sameElements(
      Array("o_custkey", "o_totalprice")))
    // cloud execution of the same SQL (peer lacking a column) hits base
    val cloudPeer = peer.copy(cached = Map("orders" -> Seq("o_custkey")))
    val (cloud, inCloud2) = Offload.execute(spark, sql, sf, cloudPeer)
    assert(inCloud2)
    assert(cloud.inputFiles.forall(_.contains(sf)))
    // value-identical answers either way
    val a = onPrem.orderBy("c_mktsegment").collect().map(_.toSeq)
    val b = cloud.orderBy("c_mktsegment").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("registered gates: a01 on-prem, a02 cloud, a03 join route and return rows") {
    val a01 = run("a01_offload_onprem").collect()
    assert(a01.nonEmpty && a01.forall(!_.getAs[Boolean]("in_cloud")))
    val a02 = run("a02_offload_cloud").collect()
    assert(a02.nonEmpty && a02.forall(_.getAs[Boolean]("in_cloud")))
    val a03 = run("a03_offload_join_onprem").collect()
    assert(a03.nonEmpty && a03.forall(!_.getAs[Boolean]("in_cloud")))
  }

  // ---------------------------------------------------------------------
  // Cache planning (reference cache_algorithm.py strategies)

  test("columnSizes: every orders column priced from the footers, positive") {
    val sizes = columnSizes(spark, sf, Seq("orders"))
    val cols = sizes.keys.map(_._2).toSet
    assert(cols == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(sizes.values.forall(_ > 0))
    // a missing table prices nothing instead of throwing
    assert(columnSizes(spark, sf, Seq("no_such_table")).isEmpty)
  }

  test("planCache MostCoverage: exact optimum under a zero-slack budget, weighted tie-break") {
    val w0 = "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1"
    val w1 = "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1"
    val w2 =
      """SELECT c_mktsegment, max(o_totalprice) AS m
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin
    val budget = planBytes(spark, sf, Seq(w0, w2))
    val plan = planCache(spark, sf, Seq(w0, w1, w2), budget,
      CacheStrategy.MostCoverage, weights = Seq(1.0, 0.1, 1.0))
    assert(plan.covered == Seq(0, 2), s"covered ${plan.covered}")
    assert(plan.bytes <= budget)
    assert(plan.columns("orders").toSet ==
      Set("o_orderpriority", "o_totalprice", "o_custkey"))
    assert(plan.columns("customer").toSet == Set("c_custkey", "c_mktsegment"))
    // the planned peer really covers what the plan claims
    val peer = plan.toPeer("planned", "/nowhere")
    assert(!decideInCloud(requiredColumns(spark, w0), peer))
    assert(decideInCloud(requiredColumns(spark, w1), peer))
    assert(!decideInCloud(requiredColumns(spark, w2), peer))
  }

  test("planCache: coverage dominates the greedy strategies; budgets respected") {
    val workload = Seq(
      "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1",
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1",
      """SELECT c_mktsegment, max(o_totalprice) AS m
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
      "SELECT count(*) AS n FROM nation")
    val budget = planBytes(spark, sf, workload) // covers everything
    for (b <- Seq(budget, budget / 2, budget / 8, 1L)) {
      val exact = planCache(spark, sf, workload, b, CacheStrategy.MostCoverage)
      assert(exact.bytes <= b)
      for (s <- Seq(CacheStrategy.MostColumns, CacheStrategy.MostFrequent,
          CacheStrategy.RateGreedy)) {
        val g = planCache(spark, sf, workload, b, s)
        assert(g.bytes <= b, s"$s over budget $b")
        assert(exact.covered.size >= g.covered.size,
          s"$s covered ${g.covered.size} > exact ${exact.covered.size} at $b")
      }
    }
    // the full budget covers the full workload, count(*)-only table included
    val full = planCache(spark, sf, workload, budget)
    assert(full.covered == Seq(0, 1, 2, 3))
    assert(full.columns.contains("nation"),
      "presence-only table needs at least one cached column")
    // a 1-byte budget covers nothing and caches nothing
    val none = planCache(spark, sf, workload, 1L)
    assert(none.covered.isEmpty && none.bytes <= 1)
  }

  test("planned cache end-to-end: a04 downloads the planned columns and routes on-prem") {
    val a04 = run("a04_offload_planned").collect()
    assert(a04.nonEmpty && a04.forall(!_.getAs[Boolean]("in_cloud")))
  }

  test("CoverageAcc incremental bytes equal unionCost on random workloads") {
    // the branch-and-bound's incremental cost state must agree with the
    // batch formula at EVERY prefix, including presence-only tables,
    // missing columns, and surcharge/required-pair collisions
    val rnd = new scala.util.Random(4242)
    val tables = Vector("t0", "t1", "t2", "t3")
    (0 until 200).foreach { trial =>
      val sizes: Map[(String, String), Long] = (for {
        t <- tables
        c <- 0 until 4
        if rnd.nextInt(10) > 0 // some columns missing from disk
      } yield (t, s"c$c") -> (1L + rnd.nextInt(1000))).toMap
      val reqs: Seq[Map[String, Set[String]]] = (0 until 6).map { _ =>
        tables.filter(_ => rnd.nextBoolean()).map { t =>
          // sometimes presence-only (count(*) shape): empty column set
          val cs = (0 until 4).filter(_ => rnd.nextInt(3) == 0)
            .map(c => s"c$c").toSet
          t -> (if (rnd.nextInt(4) == 0) Set.empty[String] else cs)
        }.toMap
      }
      var acc = graft.Offload.CoverageAcc.empty
      reqs.zipWithIndex.foreach { case (q, i) =>
        acc = acc.add(q, sizes)
        val want = graft.Offload.unionCost(reqs.take(i + 1), sizes)._2
        assert(acc.bytes == want,
          s"trial $trial prefix ${i + 1}: incremental ${acc.bytes} != " +
            s"unionCost $want\nreqs=${reqs.take(i + 1)}\nsizes=$sizes")
      }
    }
  }
}
