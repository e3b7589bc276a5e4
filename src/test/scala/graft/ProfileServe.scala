package graft

/** Ad-hoc timer for the ANN SERVE cores (the bodies Bench times for
  * v03/v05/v06/v07) — BenchOne runs the registered recall audits, which
  * hide the serve path behind the brute-force truth side. Warm once,
  * then min-of-2, optionally under referencePlan for A/B. Run:
  *   sbt 'Test/runMain graft.ProfileServe /root/testdata/sf0.1 v03 [ref]'
  */
object ProfileServe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "v03"
    val s = Tables.localSession(32)
    if (args.contains("ref"))
      s.conf.set("spark.graft.dedup.referencePlan", "true")
    // `explain`: dump the formatted plan of EVERY action the serve body
    // drives (training iterations run as separate driver actions, so the
    // returned frame's lineage alone cannot show them)
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    if (args.contains("explain"))
      s.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            plans.add(s"== action: $funcName ==\n" + qe.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            ()
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    def body(): Long = (which match {
      case "v03" => operators.VectorOps.knnIvf(s, d)
      case "v05" => operators.VectorOps.cosinePairsLsh(s, d)
      case "v06" => operators.VectorOps.knnIvfIndexed(s, d)
      case "v07" => operators.VectorOps.knnSq8(s, d)
    }).count()
    def once(): Double = {
      val t0 = System.nanoTime()
      val n = body()
      val dt = (System.nanoTime() - t0) / 1e9
      CacheScope.release(blocking = true)
      println(f"RUN $which $dt%.2f s ($n rows)")
      dt
    }
    once() // warm (JIT + parquet footers)
    if (args.contains("explain")) {
      Thread.sleep(500) // listener bus drain
      val out = new java.io.PrintWriter(s"/tmp/serve_plans_$which.txt")
      plans.forEach(p => out.println(p))
      out.close()
      println(s"PLANS ${plans.size()} -> /tmp/serve_plans_$which.txt")
    }
    val best = math.min(once(), once())
    println(f"SERVE $which best=$best%.2f s")
    s.stop()
  }
}
