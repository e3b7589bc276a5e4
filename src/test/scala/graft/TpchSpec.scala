package graft

import org.apache.spark.sql.functions._

class TpchSpec extends GraftSpec {
  test("q31 Q4: one row per priority present in the window") {
    val df = run("q31_tpch_q4_exists_agg").cache()
    assert(df.count() > 0)
    assert(df.filter(col("order_count") <= 0).count() == 0)
  }

  test("q32 Q7: only the two nations appear, never as their own partner") {
    val df = run("q32_tpch_q7_volume_shipping").cache()
    assert(df.filter(!col("supp_nation").isin("NATION_1", "NATION_2")).count() == 0)
    assert(df.filter(col("supp_nation") === col("cust_nation")).count() == 0)
  }

  test("q33 Q8: market share is a fraction in [0, 1]") {
    val df = run("q33_tpch_q8_market_share").cache()
    assert(df.count() > 0)
    assert(df.filter(col("mkt_share") < 0.0 || col("mkt_share") > 1.0).count() == 0)
  }

  test("q35 Q10 / q39 Q18 / q42 Q21: top-k limits hold") {
    assert(run("q35_tpch_q10_returned_items").count() <= 20)
    assert(run("q39_tpch_q18_large_volume").count() <= 100)
    assert(run("q42_tpch_q21_waiting_supplier").count() <= 50)
  }

  test("q38 Q15: every returned supplier carries the same max revenue") {
    val df = run("q38_tpch_q15_top_supplier").cache()
    assert(df.count() >= 1)
    assert(df.select(countDistinct(col("total_revenue"))).head().getLong(0) == 1)
  }

  test("q31/q42/q43 pre-filter shapes are row-identical to the referencePlan legs") {
    // the round-16 shapes: q31 broadcast-EXISTS, q42 Bloom pre-filter on
    // the probe (forced on via the scan-size conf), q43 pre-aggregation
    // semi pruning. Each must emit the exact row multiset the legacy
    // shape does — collected and compared sorted, all columns.
    def rowsOf(name: String): Seq[String] =
      run(name).collect().map(_.toString).sorted.toSeq
    for (q <- Seq("q31_tpch_q4_exists_agg", "q42_tpch_q21_waiting_supplier",
        "q43_tpch_q2_min_cost_supplier")) {
      spark.conf.set("spark.graft.tpch.bloomMinScanBytes", "0")
      val fused = rowsOf(q)
      CacheScope.release(blocking = true)
      spark.conf.set("spark.graft.dedup.referencePlan", "true")
      val ref =
        try rowsOf(q)
        finally {
          spark.conf.unset("spark.graft.dedup.referencePlan")
          spark.conf.unset("spark.graft.tpch.bloomMinScanBytes")
        }
      assert(fused == ref, s"$q: pre-filter shape diverges from legacy")
    }
  }

  test("q32/q34: tiny dims (nation/region) join via broadcast, fact side never broadcast") {
    // earlier tests cache() some results; a cached plan would appear as an
    // InMemoryRelation scan and hide the joins from this assertion
    spark.catalog.clearCache()
    for (q <- Seq("q32_tpch_q7_volume_shipping", "q34_tpch_q9_product_profit")) {
      val plan = run(q).queryExecution.sparkPlan
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty, s"$q has no broadcast hash join")
      // lineitem (the fact table) must not be on a broadcast side
      val broadcastSides = bhj.map { j =>
        j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
      }
      assert(!broadcastSides.exists(_.toString.contains("l_extendedprice")),
        s"$q broadcasts the lineitem side")
    }
  }
}
