package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** generic per-query stage profile: flags stages whose task count is far
  * below the runtime they consume (the AQE explode-coalesce pathology) */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_stretch_sf1")
    val names = args.drop(1)
    val s = Tables.localSession(32)
    val stages = mutable.Map.empty[Int, (Long, Long, Int)]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages(si.stageId) = (
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime, si.numTasks)
      }
    })
    names.foreach { name =>
      try { SparkEntry.queries(name)(s, d); () } catch { case _: Throwable => () }
      CacheScope.release(blocking = true)
      stages.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(s, d).count()
      println(f"QUERY $name ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      CacheScope.release(blocking = true)
      Thread.sleep(500)
      stages.toSeq.sortBy(-_._2._2).take(5).foreach { case (id, (w, rt, nt)) =>
        val flag = if (nt <= 2 && rt > 3000) "  <-- LOW-PARALLELISM" else ""
        println(f"  stage $id%4d wall=${w / 1000.0}%8.2f s runSum=${rt / 1000.0}%9.2f s tasks=$nt%4d$flag")
      }
    }
    s.stop()
  }
}
