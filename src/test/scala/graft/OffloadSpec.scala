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
}
