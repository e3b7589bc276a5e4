package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

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
  *
  * Thin delegate over [[org.apache.spark.sql.graft.GraftFunctions.all]]
  * — the ONE builder list both this hook and the richer
  * org.apache.spark.sql.graft.GraftExtensions (functions + SQL command
  * extensions) register from, so the two entry points can never drift
  * apart in function coverage. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graft.GraftFunctions.all.foreach {
      case (name, inf, builder) =>
        e.injectFunction((FunctionIdentifier(name), inf, builder))
    }
}
