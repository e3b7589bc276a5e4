package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native expressions — the library's
  * `spark.sql.extensions` hook (reference analog: the scalar surface the
  * attached engine exposes over pixels data; these are the
  * beyond-reference vector/text additions):
  *
  *   spark.conf: spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *
  * or imperatively on an existing session:
  *
  *   GraftFunctions.registerAll(spark)
  *
  * After either, plain SQL can call
  * `cos_sim(a, b)`, `dot_product(a, b)`, `sorted_jaccard(a, b)`,
  * `trigram_ids(s)`, `simhash32(toks)`, `minhash_sigs(tids, 128)` —
  * all codegen-friendly Catalyst expressions, not UDFs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def two(name: String, f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.length}")
  }

  private def one(name: String, f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.length}")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cos_sim", info("cos_sim", "cos_sim(a, b): cosine similarity of double arrays"),
      two("cos_sim", CosineSimilarity)),
    ("dot_product", info("dot_product", "dot_product(a, b): dot product of double arrays"),
      two("dot_product", DotProduct)),
    ("sorted_jaccard", info("sorted_jaccard",
      "sorted_jaccard(a, b): jaccard of SORTED distinct long arrays"),
      two("sorted_jaccard", SortedJaccard)),
    ("mask_jaccard", info("mask_jaccard",
      "mask_jaccard(a, b): jaccard of fixed-width long bitmasks " +
        "(popcount AND / popcount OR)"),
      two("mask_jaccard", MaskJaccard)),
    ("positions_to_mask", info("positions_to_mask",
      "positions_to_mask(ps, n): n-word long bitmask from 1-based bit " +
        "positions"), {
      case Seq(a, Literal(n: Int, IntegerType)) => PositionsToMask(a, n)
      case other => throw new IllegalArgumentException(
        "positions_to_mask expects (array<int>, <int literal>), got " +
          other.map(_.sql).mkString(", "))
    }),
    ("trigram_ids", info("trigram_ids",
      "trigram_ids(s): distinct character trigrams as packed codepoint ids"),
      one("trigram_ids", TrigramIds)),
    ("simhash32", info("simhash32",
      "simhash32(toks): 32-bit md5-nibble SimHash of a token array"),
      one("simhash32", Simhash32)),
    ("minhash_sigs", info("minhash_sigs",
      "minhash_sigs(tids, n): all n MinHash signatures of a long array"), {
      case Seq(a, Literal(n: Int, IntegerType)) => MinHashSigs(a, n)
      case other => throw new IllegalArgumentException(
        "minhash_sigs expects (array<bigint>, <int literal>), got " +
          other.map(_.sql).mkString(", "))
    }),
    ("topk_by_score", info("topk_by_score",
      "topk_by_score(score, id, k): exact top-k (score,id) pairs per " +
        "group with a bounded map-side partial"), {
      // raw AggregateFunction: the analyzer wraps it in an
      // AggregateExpression exactly as for the built-in aggregates
      case Seq(s, i, Literal(k: Int, IntegerType)) => TopKByScore(s, i, k)
      case other => throw new IllegalArgumentException(
        "topk_by_score expects (double, bigint, <int literal>), got " +
          other.map(_.sql).mkString(", "))
    }))

  /** imperative registration on an existing session (same builders AND
    * the same ExpressionInfo the extensions inject, so DESCRIBE FUNCTION
    * shows usage text on both paths; registerFunction overwrites an
    * existing entry, keeping re-registration idempotent) */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, inf, builder) =>
      reg.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
