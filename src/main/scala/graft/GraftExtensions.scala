package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, SortedJaccard}

/** SparkSessionExtensions hook registering graft's native Catalyst
  * expressions as SQL functions:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT cos_sim(a.embedding, b.embedding) FROM ...
  *   SELECT sorted_jaccard(a.toks, b.toks) FROM ...
  *
  * This is the SQL-surface twin of the DataFrame API in
  * [[graft.functions.VectorFunctions]] — same codegen'd expressions, so a
  * SQL-only user of the engine gets the identical plan (the reference's
  * equivalent is registering UDFs with the attached engine's catalog;
  * here the functions run inside WholeStageCodegen instead).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cos_sim"),
      info(classOf[CosineSimilarity], "cos_sim",
        "cos_sim(a, b) - cosine similarity of two array<double> vectors"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cos_sim takes exactly 2 arguments")
        CosineSimilarity(args.head, args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("sorted_jaccard"),
      info(classOf[SortedJaccard], "sorted_jaccard",
        "sorted_jaccard(a, b) - exact Jaccard of two sorted distinct array<bigint> sets"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_jaccard takes exactly 2 arguments")
        SortedJaccard(args.head, args(1))
      }))
  }
}
