package graft

/** Driver-contract smoke: entry() must return >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(4)
    val df = SparkEntry.entry(spark)
    df.show(5, false)
    println(s"SMOKE entry rows=${df.count()}")
    spark.stop()
  }
}
