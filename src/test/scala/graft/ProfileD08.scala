package graft

import org.apache.spark.sql.functions._

/** Phase timer + candidate-count instrumentation for d08 as SHIPPED
  * (VERDICT r9 wrong #3: the 1.395 sf1 stretch ratio needs either a
  * bound or a measured explanation). Mirrors the registered pipeline:
  * fp groupBy -> signatures/banding -> asymmetric band join ->
  * exact verify; prints per-phase seconds and the candidate-pair count
  * so sf0.1 vs sf1 runs expose whether band-collision growth or plain
  * shuffle pressure drives the superlinearity. Run ad hoc:
  *   sbt 'Test/runMain graft.ProfileD08 /root/testdata/sf0.1'
  *   sbt 'Test/runMain graft.ProfileD08 /tmp/graft_stretch_sf1' */
object ProfileD08 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = 0.8
    val tokens = array_distinct(split(col("text"), " "))
    val tokenFp = md5(concat_ws(" ", col("toks"))
      .cast(org.apache.spark.sql.types.BinaryType))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), array_sort(tokens).as("toks"))
      .withColumn("fp", tokenFp)
      .withColumn("is_new", col("doc_id") % 5 === 0)
    val groups = docs.groupBy(col("fp"))
      .agg(first(col("toks")).as("toks"),
        sort_array(collect_list(when(col("is_new"), col("doc_id"))))
          .as("new_members"),
        count(when(!col("is_new"), lit(1))).as("n_old"))
      .persist()
    val nGroups = time("groups (fp groupBy)")(groups.count())
    // signatures via the same pure-band path the shipped query uses
    val tids = groups.select(col("fp"), explode(col("toks")).as("tok"))
      .select(col("fp"), xxhash64(col("tok")).as("tid"))
      .groupBy("fp")
      .agg(sort_array(collect_list(col("tid"))).as("tids"))
    val mh = tids.select(col("fp"), size(col("tids")).as("nt"),
      graft.functions.VectorFunctions.minhash_sigs(col("tids"), 128).as("mhs"))
      .persist()
    time("signatures (minhash)")(mh.count())
    val bandCols = (0 until 32).map { b =>
      struct(lit(b).as("band") +:
        (0 until 4).map(r => col("mhs").getItem(4 * b + r).as(s"h$r")): _*)
    }
    val bands = mh.select(col("fp"), col("nt"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("fp"), col("nt"), col("bk.band").as("band"),
        col("bk.h0").as("h0"), col("bk.h1").as("h1"),
        col("bk.h2").as("h2"), col("bk.h3").as("h3"))
    val sides = groups.select(col("fp"),
      (size(col("new_members")) > 0).as("is_batch"),
      (col("n_old") > 0).as("is_corpus"))
    val banded = bands.join(sides, "fp").persist()
    val nBandRows = time("banding")(banded.count())
    // band-frequency profile of the corpus side: the superlinearity
    // suspect — a hot band key generates |batch-side| x |corpus-side|
    // candidate rows before the distinct
    val hot = banded.filter(col("is_corpus"))
      .groupBy("band", "h0", "h1", "h2", "h3")
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("max_bucket"),
        sum(when(col("n") > 1, col("n") * col("n"))).as("sq_mass"))
      .head()
    println(s"corpus band buckets: max=${hot.getLong(0)} sqMass=${hot.get(1)}")
    val hEq = (0 until 4).map(r => col(s"x.h$r") === col(s"y.h$r")).reduce(_ && _)
    val candidates = banded.filter(col("is_batch")).as("x")
      .join(banded.filter(col("is_corpus")).as("y"),
        col("x.band") === col("y.band") && hEq &&
          col("x.fp") =!= col("y.fp") &&
          col("x.nt") >= col("y.nt") * t - 0.5 &&
          col("y.nt") >= col("x.nt") * t - 0.5)
      .select(col("x.fp").as("fa"), col("y.fp").as("fb"))
    val preDistinct = time("band join (pre-distinct)")(candidates.count())
    val cand = candidates.distinct().persist()
    val nCand = time("candidates (distinct)")(cand.count())
    println(s"groups=$nGroups bandRows=$nBandRows " +
      s"candPre=$preDistinct candidates=$nCand")
    val repsInt = tids
    val verified = cand
      .join(repsInt.select(col("fp").as("fa"), col("tids").as("ta")), "fa")
      .join(repsInt.select(col("fp").as("fb"), col("tids").as("tb")), "fb")
      .withColumn("j", graft.functions.VectorFunctions
        .sorted_jaccard(col("ta"), col("tb")))
      .filter(col("j") >= t)
    time("verify")(verified.count())
    s.stop()
  }
}
