package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-JOB wall-clock attribution for one query run: the dedup pipelines
  * interleave sequential driver actions (injectivity gates, broadcast-table
  * collects) with the final count — per-stage runSum (ProfileShuffle) shows
  * where CPU burns, but the WALL is paced by the sequential job chain.
  * Prints each job of the timed run with its wall seconds, first stage
  * callsite, and the driver GAP since the previous job ended (plan/analysis/
  * collect-deserialize time happens in the gaps). Run ad hoc:
  *   sbt 'Test/runMain graft.ProfileJobs /root/testdata/sf0.1 d08_incremental_dedup'
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val s = Tables.localSession(32)
    // ad-hoc conf A/B: GRAFT_PROF_CONF="spark.sql.x=y,spark.sql.z=w"
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      s.conf.set(k, v)
    })
    case class J(id: Int, t0: Long, var t1: Long, site: String)
    val jobs = mutable.ArrayBuffer.empty[J]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val site = e.stageInfos
            .flatMap(_.details.linesIterator)
            .find(l => (l.contains("graft/operators") ||
              l.contains("Dedup.scala") || l.contains("VectorOps.scala") ||
              l.contains("Tables.scala")) && !l.contains("ProfileJobs"))
            .map(_.trim.take(90))
            .orElse(e.stageInfos.headOption.map(_.name.take(60)))
            .getOrElse("?") +
            s" [${e.stageInfos.size} stages]"
          jobs += J(e.jobId, System.nanoTime(), 0L, site)
          ()
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime())
          ()
        }
    })
    names.foreach { name =>
      try { SparkEntry.queries(name)(s, d).count(); () }
      catch { case t: Throwable => println(s"warm failed: $t") }
      CacheScope.release(blocking = true)
      Thread.sleep(300)
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(s, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      CacheScope.release(blocking = true)
      val snap = jobs.synchronized(jobs.toVector)
      println(f"QUERY $name $wall%.2f s ($n rows, ${snap.size} jobs)")
      var prevEnd = t0
      snap.sortBy(_.t0).foreach { j =>
        val gap = (j.t0 - prevEnd) / 1e9
        val dur = (math.max(j.t1, j.t0) - j.t0) / 1e9
        prevEnd = math.max(j.t1, prevEnd)
        println(f"  job ${j.id}%4d gap=$gap%6.2f s run=$dur%6.2f s  ${j.site}")
      }
      println(f"  tail gap=${(t0 + (wall * 1e9).toLong - prevEnd) / 1e9}%.2f s")
    }
    s.stop()
  }
}
