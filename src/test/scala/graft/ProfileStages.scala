package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** generic per-query stage profile: flags stages whose parallelism is far
  * below the runtime they consume — either the AQE explode-coalesce
  * pathology (few tasks, big runtime: found d05's single-task collapse)
  * or a straggler/skew shape (many tasks but the wall is one task long).
  * Pass query names, or ALL to sweep the whole registry. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_stretch_sf1")
    val names: Seq[String] =
      if (args.drop(1).toSeq == Seq("ALL")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    val s = Tables.localSession(32)
    // ad-hoc conf A/B, same contract as ProfileJobs
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      s.conf.set(k, v)
    })
    val stages = mutable.Map.empty[Int, (Long, Long, Int, String)]
    val io = mutable.Map.empty[Int, String] // stageId -> shuffle/io summary
    val stageJob = mutable.Map.empty[Int, String] // stageId -> job callsite
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the action's callsite survives as a job property even when the
        // stage details stack is the SQL-execution thread-pool wrapper
        val p = Option(e.properties)
        val cs = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        e.stageIds.foreach(id => stageJob(id) = s"job ${e.jobId} $cs")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val site = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("Profile"))
          .map(_.trim.take(80))
          .getOrElse(stageJob.getOrElse(si.stageId, si.name.take(60)))
        stages(si.stageId) = (
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime, si.numTasks, site)
        val m = si.taskMetrics
        io(si.stageId) = f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1fMB/" +
          f"${m.shuffleReadMetrics.recordsRead}%d sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1fMB/" +
          f"${m.shuffleWriteMetrics.recordsWritten}%d in=${m.inputMetrics.bytesRead / 1e6}%.1fMB"
      }
    })
    names.foreach { name =>
      try { SparkEntry.queries(name)(s, d); () } catch { case _: Throwable => () }
      CacheScope.release(blocking = true)
      stages.clear()
      val t0 = System.nanoTime()
      val res = try Right(SparkEntry.queries(name)(s, d).count())
        catch { case t: Throwable => Left(t.getClass.getSimpleName) }
      val wall = (System.nanoTime() - t0) / 1e9
      CacheScope.release(blocking = true)
      Thread.sleep(300)
      // rt >= w on the straggler arm: see StageGate — a near-idle stage
      // queued behind a core-hogging sibling is scheduler wait, not skew
      val flagged = stages.toSeq.filter { case (_, (w, rt, nt, _)) =>
        (nt <= 2 && rt > 3000) ||
          (w > 5000 && rt >= w && rt.toDouble / math.max(w, 1) < 4)
      }
      val flag = if (flagged.nonEmpty) " FLAGGED" else ""
      println(f"QUERY $name $wall%.2f s $res$flag")
      val toShow =
        if (flagged.nonEmpty)
          (flagged ++ stages.toSeq.sortBy(-_._2._2).take(6)).distinct
        else if (wall > 3.0) stages.toSeq.sortBy(-_._2._2)
          .take(sys.env.get("GRAFT_PROF_TOP").map(_.toInt).getOrElse(6))
        else Nil
      toShow.sortBy(-_._2._2).foreach { case (id, (w, rt, nt, site)) =>
        println(f"  stage $id%5d wall=${w / 1000.0}%8.2f s runSum=${rt / 1000.0}%9.2f s tasks=$nt%4d  ${io.getOrElse(id, "")}  $site")
      }
    }
    s.stop()
  }
}
