package graft
/** ad-hoc single-query timer for local tuning (not part of the suite) */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sp = Tables.localSession(32)
    for (name <- args.drop(1)) {
      // warm once at tiny scale to JIT
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(sp, sf).count()
      println(f"BENCHONE $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    sp.stop()
  }
}
