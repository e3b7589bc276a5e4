package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full operator registry: each entry is one operator/capability from
  * SURVEY.md §2 (or a beyond-reference LLM-pipeline operator), implemented
  * Spark-first, with a DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  /** Every verifiable operator, grouped by module. */
  val registry: Seq[GQuery] =
    Relational.queries ++
      Tpch.queries ++
      EventOps.queries ++
      TextOps.queries ++
      Pipeline.queries ++
      Dedup.queries ++
      VectorOps.queries ++
      Multimodal.queries ++
      FormatOps.queries ++
      WideOps.queries ++
      WideOps.approxQueries ++
      Offload.queries ++
      ExchangeOps.queries ++
      ServiceOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3 shape: 3-way join + grouped agg + top-k. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_tpch_q3_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate ANN, mapPartitions decode) -> driver rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
