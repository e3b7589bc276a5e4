package graft

/** Ad-hoc timer for any registered query at any data dir (construction
  * pass untimed, like Bench):
  *   sbt 'Test/runMain graft.ProfileQuery d08_incremental_dedup /root/testdata/sf0.1'
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val s = Tables.localSession(32)
    val fn = SparkEntry.queries(name)
    try { fn(s, d); () } catch { case _: Throwable => () }
    CacheScope.release(blocking = true)
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(s, d).count()
      println(f"TIMED $name $d rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      CacheScope.release(blocking = true)
    }
    s.stop()
  }
}
