package graft.functions

import org.apache.spark.sql.Column

/** Public column API for graft's native Catalyst expressions. */
object VectorFunctions {
  /** Cosine similarity of two array<double> columns — codegen'd native
    * expression (org.apache.spark.sql.graft.CosineSimilarity). */
  def cos_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.cos_sim(a, b)

  /** Exact Jaccard of two sorted distinct array<long> columns — one
    * allocation-free merge pass per pair, codegen'd
    * (org.apache.spark.sql.graft.SortedJaccard). */
  def sorted_jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.sorted_jaccard(a, b)
}
