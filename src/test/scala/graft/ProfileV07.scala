package graft

import org.apache.spark.sql.functions._

/** scratch phase profiler for v07 (not part of the suite) */
object ProfileV07 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def topk(scored: org.apache.spark.sql.DataFrame,
        score: org.apache.spark.sql.Column,
        id: org.apache.spark.sql.Column, k: Int) =
      scored.groupBy("q_id")
        .agg(graft.functions.VectorFunctions.topk_by_score(score, id, k).as("tk"))
        .select(col("q_id"), posexplode(col("tk")))
        .select(col("q_id"), (col("pos") + 1).as("rank"),
          col("col.id").as("n_id"), col("col.score").as("sc"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", sqrt(expr(
        "aggregate(v, cast(0 as double), (acc, x) -> acc + x * x)")))
    time("read_count")(e.count())
    val data = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("nv"))
    val q8 = data
      .withColumn("lo", array_min(col("nv")))
      .withColumn("hi", array_max(col("nv")))
      .withColumn("scale",
        when(col("hi") > col("lo"), (col("hi") - col("lo")) / 255.0)
          .otherwise(lit(1.0)))
      .withColumn("qv", expr(
        "transform(nv, x -> cast(round((x - lo) / scale) as int))"))
      .withColumn("rnorm", sqrt(expr(
        "aggregate(qv, cast(0 as double), (acc, b) -> acc + (lo + b * scale) * (lo + b * scale))")))
      .select(col("n_id"), col("qv"), col("lo"), col("scale"), col("rnorm"))
      .filter(col("rnorm") > 0)
      .persist()
    time("q8")(q8.count())
    val planStr = q8.queryExecution.executedPlan.toString
    println("PLANSTAT array_min=" + "array_min".r.findAllIn(planStr).size +
      " transform=" + "transform".r.findAllIn(planStr).size +
      " aggregate=" + "aggregate".r.findAllIn(planStr).size +
      " len=" + planStr.length)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv_full"),
        col("norm").as("qnorm"))
      .filter(col("qnorm") > 0)
    val approx = q.crossJoin(q8)
      .withColumn("rdot", expr(
        "aggregate(zip_with(qv_full, qv, (a, b) -> a * (lo + b * scale)), cast(0 as double), (acc, x) -> acc + x)"))
      .withColumn("acos", col("rdot") / (col("qnorm") * col("rnorm")))
    time("approx")(approx.count())
    val cand = topk(approx, col("acos"), col("n_id"), 20)
      .select(col("q_id"), col("n_id"))
      .join(broadcast(q.select(col("q_id"), col("qv_full"), col("qnorm"))), "q_id")
    time("cand")(cand.count())
    val full = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("nv"),
        col("norm").as("nnorm"))
    val reranked = cand.join(full, "n_id")
      .withColumn("cos", graft.functions.VectorFunctions.cos_sim(col("qv_full"), col("nv")))
    time("rerank")(reranked.count())
    val fin = topk(reranked, col("cos"), col("n_id"), 5)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("sc"), 4).as("cos_sim"))
      .orderBy("q_id", "rank")
    time("final")(fin.count())
    time("v07_warm")(SparkEntry.queries("v07_knn_sq8")(s, d).count())
    println("CGMETRIC compileTime_ms=" + org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum + " generatedSize=" + org.apache.spark.metrics.source.CodegenMetrics.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getSnapshot.getValues.sum)
    s.stop()
  }
}
