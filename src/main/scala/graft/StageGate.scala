package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Stage-pathology GATE over the full query registry at the sf1 stretch
  * scale — the promotion of the ProfileStages tooling to a per-round
  * artifact the round cannot silently skip (VERDICT r13 #4).
  *
  * Round 13's best find was exactly this class of defect: AQE coalesced a
  * byte-tiny shuffle to ONE partition ahead of a ~70x row-exploding band
  * join, so d05's sf1 leg ran 96M match-iterations in a single task —
  * invisible to correctness (answers were right), invisible to sf0.1
  * wall-clock (the collapse only dominates once partitions get heavy),
  * fatal on a 1000-executor cluster. The stage metrics are the only
  * witness that generalizes, so they gate.
  *
  * Flags, per completed stage of each query at sf1:
  *  - COLLAPSE: <=2 tasks consuming >3 s of executor runtime — work that
  *    should fan out across the cluster serialized onto one core
  *    (the d05 pathology);
  *  - STRAGGLER: >5 s of stage wall with <4x average parallelism on a
  *    32-core session — a skew/straggler wall where one long task holds
  *    the stage (salting/AQE-skew material).
  *
  * Output: one JSON line (+ /tmp/graft_stagegate.json) with per-query
  * wall, stage count and any flagged stages; exit code 1 when ANY query
  * flags, so a round script cannot record a green gate over a flagged
  * sweep. The sf1 corpus is the same semantics-preserving 10x replication
  * StretchBench derives (and is reused/regenerated via its content
  * stamp). */
object StageGate {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRETCH_FACTOR", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_STRETCH_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft_stretch_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.localSession(cpus)
    StretchBench.generate(spark, src, out, factor)

    val stages = mutable.Map.empty[Int, (Long, Long, Int)]
    // shuffle WRITE bytes per query, summed across its stages: the
    // scale-killer class StageGate's runtime flags cannot see is "right
    // answer, needless exchange" — a query whose shuffle volume is a
    // multiple of its input will saturate the fabric at 100 TB long
    // before any single stage straggles. Stamped per query (informational
    // ranking, not a flag: legitimate shuffle volume is query-shaped).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          stages(si.stageId) = (
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.taskMetrics.executorRunTime, si.numTasks)
        }
        shuffleBytes.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    def s3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // construction pass: cachedDir materializations (gpx layouts,
      // index sidecars) build untimed and OUTSIDE the listener window —
      // a one-time table build is not a query-plan pathology
      try { fn(spark, out); () } catch { case _: Throwable => () }
      CacheScope.release(blocking = true)
      // stage-completed events are delivered ASYNC: a construction-pass
      // stage landing after the clear would be mis-attributed to the
      // gated window and flag spuriously — give the bus the same 200 ms
      // settle the post-run read uses before clearing
      Thread.sleep(200)
      stages.synchronized(stages.clear())
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, out).count(); true }
        catch { case _: Throwable => false }
      val wall = (System.nanoTime() - t0) / 1e9
      CacheScope.release(blocking = true)
      // the listener is async: give the last stage-completed event a
      // beat to land before reading the map
      Thread.sleep(200)
      val shufMb = shuffleBytes.get / (1024.0 * 1024.0)
      val snap = stages.synchronized(stages.toSeq)
      // straggler flag requires rt >= w: a real straggler's one long task
      // alone spans the stage wall (runSum >= wall), while a near-idle
      // stage QUEUED behind a core-hogging sibling (AQE runs independent
      // stages concurrently; observed: 14 ms of work, 5.4 s of wall
      // waiting out d08's band join) has rt << w and is scheduler wait,
      // not skew
      val flagged = snap.filter { case (_, (w, rt, nt)) =>
        (nt <= 2 && rt > 3000) ||
          (w > 5000 && rt >= w && rt.toDouble / math.max(w, 1) < 4)
      }
      val short = name.takeWhile(_ != '_')
      flagged.foreach { case (id, (w, rt, nt)) =>
        System.err.println(f"STAGEGATE FLAG $name stage=$id " +
          f"wall=${w / 1000.0}%.2fs runSum=${rt / 1000.0}%.2fs tasks=$nt")
      }
      (short, wall, ok, snap.size, flagged.map { case (id, (w, rt, nt)) =>
        s"""{"stage":$id,"wallMs":$w,"runMs":$rt,"tasks":$nt}""" }, shufMb)
    }
    val flaggedTotal = rows.map(_._5.size).sum
    val errTotal = rows.count(!_._3)
    val qs = rows.map { case (short, wall, ok, nStages, flags, shufMb) =>
      val f = if (flags.isEmpty) ""
        else flags.mkString(""","flags":[""", ",", "]")
      if (ok) s""""$short":{"sec":${s3(wall)},"stages":$nStages,""" +
        s""""shufMB":${s3(shufMb)}$f}"""
      else s""""$short":{"err":true}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"stagegate","flagged":$flaggedTotal,"errs":$errTotal,""" +
      s""""cpus":$cpus,"factor":$factor,"queries":$qs,"sf":"$out"}"""
    println(line)
    try { java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_stagegate.json"),
      (line + "\n").getBytes("UTF-8")); () }
    catch { case _: Throwable => () }
    // the gate: a flagged stage (or an erroring query) fails the run
    println(s"STAGEGATE ${if (flaggedTotal == 0 && errTotal == 0) "PASS"
      else "FAIL"} flagged=$flaggedTotal errs=$errTotal " +
      s"queries=${rows.size}")
    spark.stop()
    if (flaggedTotal > 0 || errTotal > 0) sys.exit(1)
  }
}
