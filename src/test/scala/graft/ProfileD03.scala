package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Phase timer for the d03 PPJoin as SHIPPED (packed-codepoint trigram
  * ids via the native TrigramIds expression — no dictionary join, no
  * collision check): spread scan -> trigram ids -> df counts -> prefix
  * window -> candidate join -> bitset/array verify. Run ad hoc:
  *   sbt 'Test/runMain graft.ProfileD03 /root/testdata/sf0.1' */
object ProfileD03 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = 0.6
    val g = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        graft.functions.VectorFunctions.trigram_ids(col("text")).as("sids"))
      .withColumn("sz", size(col("sids")))
      .persist()
    time("g (trigram ids)")(g.count())
    val grams = g.select(col("doc_id"), col("lang"), col("sz"),
      explode(col("sids")).as("gid"))
    val freq = grams.groupBy("gid").agg(count(lit(1)).as("df")).persist()
    val vocabV = time("freq/vocab")(freq.count())
    val gidGrams = grams.join(freq, "gid")
      .select(col("doc_id"), col("lang"), col("sz"), col("gid"), col("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gid"))
    val prefix = gidGrams
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * t - 1e-9) + 1)
      .select(col("doc_id"), col("lang"), col("sz"), col("gid"), col("rn"))
      .persist()
    time("prefix")(prefix.count())
    val candidates = prefix.as("x").join(prefix.as("y"),
        col("x.gid") === col("y.gid") && col("x.lang") === col("y.lang") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("x.sz") >= col("y.sz") * t - 0.5 &&
          col("y.sz") >= col("x.sz") * t - 0.5 &&
          lit(1) + least(col("x.sz") - col("x.rn"), col("y.sz") - col("y.rn")) >=
            (col("x.sz") + col("y.sz")) * (t / (1 + t)) - 0.5)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct().persist()
    val nCand = time("candidates")(candidates.count())
    println(s"vocab=$vocabV candidates=$nCand")
    val gInt = g.select(col("doc_id").as("gd"), col("sids"))
    val verify = candidates
      .join(gInt.select(col("gd").as("a_id"), col("sids").as("a_s")), "a_id")
      .join(gInt.select(col("gd").as("b_id"), col("sids").as("b_s")), "b_id")
      .withColumn("jaccard", graft.functions.VectorFunctions
        .sorted_jaccard(col("a_s"), col("b_s")))
      .filter(col("jaccard") >= t)
    time("verify (sorted-merge)")(verify.count())
    s.stop()
  }
}
