package graft

/** Interleaved tier A/B for the d03x straddle corpus: forces each verify
  * tier in one JVM, alternating, so host drift cannot masquerade as a
  * tier difference. Ad hoc:
  *   sbt 'Test/runMain graft.ProfileD03X /tmp/graft_stretch_sf1_straddle27'
  */
object ProfileD03X {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_stretch_sf1_straddle27")
    val s = Tables.localSession(32)
    val fn = SparkEntry.queries("d03_ngram_jaccard")
    try { fn(s, d); () } catch { case _: Throwable => () }
    CacheScope.release(blocking = true)
    (0 until 2).foreach { rep =>
      Seq("mask", "varint").foreach { tier =>
        s.conf.set("spark.graft.dedup.d03VerifyTier", tier)
        val t0 = System.nanoTime()
        val n = fn(s, d).count()
        println(f"TIER $tier rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        CacheScope.release(blocking = true)
      }
    }
    s.conf.unset("spark.graft.dedup.d03VerifyTier")
    s.stop()
  }
}
