package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** scratch phase profiler for d02 (not part of the suite) */
object ProfileD02 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tokens = array_distinct(split(col("text"), " "))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), array_sort(tokens).as("toks"))
      .withColumn("fp", md5(concat_ws("", col("toks")).cast(BinaryType)))
    val groups = docs.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep_id"),
        first(col("toks")).as("toks"),
        collect_list(col("doc_id")).as("members"))
      .persist()
    time("groups")(groups.count())
    val reps = groups.select(col("rep_id"), col("toks"))
    val exploded = reps.select(col("rep_id"), explode(col("toks")).as("tok"))
    val hashed = exploded.withColumn("tid", xxhash64(col("tok")))
    val vocab = exploded.select(col("tok")).distinct().persist()
    val vocabSize = time("vocab")(vocab.count())
    time("vocabHash")(vocab.select(xxhash64(col("tok"))).distinct().count())
    val expInt = hashed.select(col("rep_id"), col("tid")).persist()
    time("expInt")(expInt.count())
    val repsInt = expInt.groupBy("rep_id")
      .agg(collect_list(col("tid")).as("toks"))
      .persist()
    time("repsInt")(repsInt.count())
    val sizes = repsInt.select(col("rep_id"), size(col("toks")).as("nt"))
    val NumHashes = 128; val BandR = 4
    val mh = expInt.groupBy("rep_id").agg(
      min(xxhash64(lit(0), col("tid"))).as("mh0"),
      (1 until NumHashes).map(i => min(xxhash64(lit(i), col("tid"))).as(s"mh$i")): _*)
    val bandCols = (0 until NumHashes / BandR).map { b =>
      struct(lit(b).as("band") +:
        (0 until BandR).map(r => col(s"mh${BandR * b + r}").as(s"h$r")): _*)
    }
    val banded = mh.join(sizes, "rep_id")
      .select(col("rep_id"), col("nt"), explode(array(bandCols: _*)).as("bk"))
      .persist()
    time("banded(mh)")(banded.count())
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.rep_id") < col("y.rep_id") &&
          col("x.nt") >= col("y.nt") * 0.8 - 0.5 &&
          col("y.nt") >= col("x.nt") * 0.8 - 0.5)
      .select(col("x.rep_id").as("ra"), col("y.rep_id").as("rb"))
      .distinct().persist()
    time("candidates")(candidates.count())
    val jaccard = size(array_intersect(col("a_toks"), col("b_toks"))).cast(DoubleType) /
      size(array_union(col("a_toks"), col("b_toks")))
    val verified = candidates
      .join(repsInt.select(col("rep_id").as("ra"), col("toks").as("a_toks")), "ra")
      .join(repsInt.select(col("rep_id").as("rb"), col("toks").as("b_toks")), "rb")
      .filter(size(col("a_toks")) >= size(col("b_toks")) * 0.8 - 0.5 &&
        size(col("b_toks")) >= size(col("a_toks")) * 0.8 - 0.5)
      .withColumn("jaccard", jaccard)
      .filter(col("jaccard") >= 0.8)
      .select(col("ra"), col("rb"), col("jaccard")).persist()
    time("verified")(verified.count())
    val mem = groups.select(col("rep_id"), explode(col("members")).as("m"))
    val crossPairs = verified
      .join(mem.select(col("rep_id").as("ra"), col("m").as("ma")), "ra")
      .join(mem.select(col("rep_id").as("rb"), col("m").as("mb")), "rb")
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col("jaccard"))
    val withinPairs = mem.as("p").join(mem.as("q"),
        col("p.rep_id") === col("q.rep_id") && col("p.m") < col("q.m"))
      .select(col("p.m").as("a_id"), col("q.m").as("b_id"),
        lit(1.0).as("jaccard"))
    time("union+count")(crossPairs.unionByName(withinPairs).count())
    time("union+orderBy+count")(
      crossPairs.unionByName(withinPairs).orderBy("a_id", "b_id").count())
    s.stop()
  }
}
