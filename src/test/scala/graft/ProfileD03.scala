package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** scratch phase profiler for d03 (not part of the suite) */
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
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        array_distinct(expr(
          "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")).as("s"))
      .withColumn("sz", size(col("s")))
      .persist()
    time("g")(g.count())
    val grams = g.select(col("doc_id"), col("lang"), col("sz"), explode(col("s")).as("gram"))
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val hashedGrams = grams.join(freq, "gram")
      .withColumn("gid", xxhash64(col("gram")))
      .persist()
    time("hashedGrams")(hashedGrams.count())
    val gvocab = freq.select(col("gram")).persist()
    val vocabV = time("vocab")(gvocab.count())
    time("vocabHash")(gvocab.select(xxhash64(col("gram"))).distinct().count())
    val gidGrams = hashedGrams.select(col("doc_id"), col("lang"), col("sz"), col("gid"), col("df"))
    val gInt = gidGrams.groupBy(col("doc_id").as("gd"), col("lang"), col("sz"))
      .agg(collect_list(col("gid")).as("sids"))
      .persist()
    time("gInt")(gInt.count())
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
    val jaccard = size(array_intersect(col("a_s"), col("b_s"))).cast(DoubleType) /
      size(array_union(col("a_s"), col("b_s")))
    val verify = candidates
      .join(gInt.select(col("gd").as("a_id"), col("sids").as("a_s")), "a_id")
      .join(gInt.select(col("gd").as("b_id"), col("sids").as("b_s")), "b_id")
      .withColumn("jaccard", jaccard)
      .filter(col("jaccard") >= t)
    time("verify")(verify.count())
    s.stop()
  }
}
