package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** scratch phase profiler for v05 (not part of the suite) */
object ProfileV05 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val Tables_ = 16; val Dim = 64
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", sqrt(expr(
        "aggregate(v, cast(0 as double), (acc, x) -> acc + x * x)")))
      .persist()
    val n = time("count")(e.count())
    println(s"n=$n")
    val Bits = math.min(24, math.max(8,
      1 + math.ceil(math.log(math.max(1.0, n / 4.0)) / math.log(2)).toInt))
    println(s"Bits=$Bits keysPerRow=${Tables_ * Bits}")
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(Tables_, Bits, Dim)(rnd.nextGaussian())
    val sigCols = (0 until Tables_).flatMap { t =>
      val sig = (0 until Bits).map { b =>
        val h = typedlit(planes(t)(b).toSeq)
        when(graft.functions.VectorFunctions.cos_sim(col("v"), h) > 0,
          1 << b).otherwise(0)
      }.reduce(_ + _)
      (0 until Bits).map { i =>
        struct(lit(t * Bits + i).as("t"),
          bitwiseNOT(lit(1 << i)).bitwiseAND(sig).as("sig"))
      }
    }
    val banded = e.select(col("vec_id"),
      explode(array(sigCols: _*)).as("bk")).persist()
    time("banded")(banded.count())
    // variant: materialize one sig column per table behind a persist
    // barrier, then derive the Bits masked keys from the stored ints
    val sigOnly = (0 until Tables_).map { t =>
      (0 until Bits).map { b =>
        val h = typedlit(planes(t)(b).toSeq)
        when(graft.functions.VectorFunctions.dot_product(col("v"), h) > 0,
          1 << b).otherwise(0)
      }.reduce(_ + _).as(s"s$t")
    }
    val sigs = e.select(col("vec_id") +: sigOnly: _*).persist()
    time("sigs2")(sigs.count())
    val keyCols = (0 until Tables_).flatMap { t =>
      (0 until Bits).map { i =>
        struct(lit(t * Bits + i).as("t"),
          bitwiseNOT(lit(1 << i)).bitwiseAND(col(s"s$t")).as("sig"))
      }
    }
    val banded2 = sigs.select(col("vec_id"),
      explode(array(keyCols: _*)).as("bk")).persist()
    time("banded2")(banded2.count())
    val cand2 = banded2.as("a").join(banded2.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    time("cand2")(cand2.count())
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
    val rawPairs = time("rawJoin")(candidates.count())
    println(s"rawPairs=$rawPairs")
    val dist = candidates.distinct().persist()
    val nd = time("distinct")(dist.count())
    println(s"distinctPairs=$nd")
    val verified = dist
      .join(e.select(col("vec_id").as("a_id"), col("v").as("av")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("v").as("bv")), "b_id")
      .withColumn("cos",
        graft.functions.VectorFunctions.cos_sim(col("av"), col("bv")))
      .filter(col("cos") >= 0.4)
    time("verify")(verified.count())
    time("full_repeat") {
      SparkEntry.queries("v05_cosine_pairs_lsh")(s, d).count()
    }
    s.stop()
  }
}
