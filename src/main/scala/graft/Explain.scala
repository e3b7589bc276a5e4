package graft

/** Plan-review tool: prints formatted physical plans for headline queries
  * so pushdowns/broadcasts/shuffles can be eyeballed per round. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_filter_project", "q04_tpch_q6_global_agg",
        "q08_tpch_q3_topk", "q23_tpch_q5_star", "f02_gpx_zonemap_scan",
        "v02_knn_brute")
    val spark = Tables.localSession(8)
    // ad-hoc conf injection (e.g. referencePlan for before/after plan
    // captures), same contract as the Profile* tools
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
