package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Ad-hoc probe: is a `.tracked` (persist()) frame actually REUSED across
  * the sequential driver actions of a dedup pipeline, or does every action
  * recompute the tokenization lineage? Prints wall times for repeated
  * actions over the same persisted frame.
  *   sbt 'Test/runMain graft.ProbeCache /root/testdata/sf0.1'
  */
object ProbeCache {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    import CacheScope.Trackable
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val tokens = array_distinct(split(col("text"), " "))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), array_sort(tokens).as("toks"))
      .withColumn("fp", md5(concat_ws(" ", col("toks")).cast(BinaryType)))
    val groups = docs.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep_id"),
        first(col("toks")).as("toks"),
        collect_list(col("doc_id")).as("members"))
      .tracked
    // EXACT d08 order: vocab agg runs FIRST (inside tokenSignatures),
    // the groups gate agg second — does the vocab build populate the
    // groups cache, or does the gate agg re-tokenize?
    val reps = groups.select(col("rep_id"), col("toks"))
    val exploded = reps.select(col("rep_id"), explode(col("toks")).as("tok"))
    val vocab = exploded.select(col("tok")).distinct().tracked
    time("vocab agg FIRST (materializes vocab)")(vocab
      .agg(count(lit(1)), count_distinct(xxhash64(col("tok")))).head())
    time("groups gate agg after vocab")(groups.agg(count(lit(1)),
      count_distinct(xxhash64(col("fp")))).head())
    time("groups.count")(groups.count())
    time("second vocab agg")(vocab
      .agg(count(lit(1)), count_distinct(xxhash64(col("tok")))).head())
    println("cached frames: " + s.sharedState.cacheManager.isEmpty)
    CacheScope.release(blocking = true)
    s.stop()
  }
}
