package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** phase timer for d05 at any sf dir: fingerprint pass, banded candidate
  * join, hamming filter, member expansion — run ad hoc to see which
  * stage drives the stretch ratio */
object ProfileD05 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_stretch_sf1")
    val s = Tables.localSession(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = SparkEntry.queries("d05_simhash_pairs")
    time("full (cold)")(q(s, d).count())
    CacheScope.release(blocking = true)
    time("full (warm)")(q(s, d).count())
    val fpCand = operators.Dedup.candidatePlan("d05").get
    time("candidates only")(println("  candidates=" + fpCand.count()))
    time("candidates+filter")(println("  pairs=" +
      fpCand.filter(col("hamming") <= 6).count()))
    CacheScope.release(blocking = true)
    s.stop()
  }
}
