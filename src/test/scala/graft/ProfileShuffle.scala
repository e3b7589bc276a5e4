package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** per-stage SHUFFLE WRITE attribution for one query: which exchange
  * actually produces the bytes the StageGate stamp sums. Prints every
  * stage with its shuffle write, row counts and the first callsite line
  * of its details, largest first — the round-15 d10/d03 shuffle-fat work
  * needs the per-exchange breakdown, not just the query total. */
object ProfileShuffle {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_stretch_sf1")
    val names = args.drop(1).toSeq
    val s = Tables.localSession(32)
    val stages = mutable.Map.empty[Int, (String, Long, Long, Long, Int)]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          stages(si.stageId) = (si.name,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.shuffleWriteMetrics.recordsWritten,
            si.taskMetrics.executorRunTime, si.numTasks)
        }
        ()
      }
    })
    names.foreach { name =>
      try { SparkEntry.queries(name)(s, d); () } catch { case _: Throwable => () }
      CacheScope.release(blocking = true)
      Thread.sleep(300)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val res = try Right(SparkEntry.queries(name)(s, d).count())
        catch { case t: Throwable => Left(t.toString.take(200)) }
      val wall = (System.nanoTime() - t0) / 1e9
      CacheScope.release(blocking = true)
      Thread.sleep(300)
      val snap = stages.synchronized(stages.toSeq)
      val totMb = snap.map(_._2._2).sum / (1024.0 * 1024.0)
      println(f"QUERY $name $wall%.2f s shufTotal=$totMb%.1f MB $res")
      snap.sortBy(-_._2._2).take(20).foreach {
        case (id, (nm, by, rec, rt, nt)) =>
          println(f"  stage $id%5d shuf=${by / 1048576.0}%9.1f MB rows=$rec%11d " +
            f"runSum=${rt / 1000.0}%8.2f s tasks=$nt%4d  $nm")
      }
    }
    s.stop()
  }
}
