package graft

import org.apache.spark.sql.functions._

/** Ad-hoc v05 phase timer for the round-16 conditional-spread work: times
  * the serve core end-to-end and its phases with and without the
  * pre-sign corpus spread / probe-side pin (conf-switched).
  *   sbt 'Test/runMain graft.ProbeV05 /root/testdata/sf0.1'
  */
object ProbeV05 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    // ad-hoc conf A/B: GRAFT_PROF_CONF="spark.graft.v05.noSpread=true,..."
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      s.conf.set(k, v)
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    operators.VectorOps.cosinePairsLsh(s, d).count()
    CacheScope.release(blocking = true)
    case class J(id: Int, t0: Long, var t1: Long, site: String)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[J]
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.synchronized {
          val site = e.stageInfos
            .flatMap(_.details.linesIterator)
            .find(l => l.contains("VectorOps.scala") && !l.contains("ProbeV05"))
            .map(_.trim.take(90))
            .orElse(e.stageInfos.headOption.map(_.name.take(60)))
            .getOrElse("?") + s" [${e.stageInfos.size} stages]"
          jobs += J(e.jobId, System.nanoTime(), 0L, site); ()
        }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime()); ()
        }
    })
    (1 to 2).foreach { i =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      time(s"full_$i") { operators.VectorOps.cosinePairsLsh(s, d).count() }
      CacheScope.release(blocking = true)
      val snap = jobs.synchronized(jobs.toVector)
      var prevEnd = t0
      snap.sortBy(_.t0).foreach { j =>
        val gap = (j.t0 - prevEnd) / 1e9
        val dur = (math.max(j.t1, j.t0) - j.t0) / 1e9
        prevEnd = math.max(j.t1, prevEnd)
        println(f"  job ${j.id}%4d gap=$gap%6.2f s run=$dur%6.2f s  ${j.site}")
      }
    }
    s.stop()
  }
}
