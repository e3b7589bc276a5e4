package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, SubqueryAlias}

/** Cost-based query offloading — the Spark-native analog of the
  * reference's amphi coordinator (pixels-amphi/.../coordinator/
  * Coordinator.java:70-104 `decideInCloud`, analyzer/PlanAnalysis.java,
  * downloader/PeerDownloader.java): an edge/on-prem "peer" holds partial
  * column-subset copies of selected tables, and each query is routed by
  * one metadata-only decision — if the peer's cached columns COVER every
  * column the query references, run it on-prem against the narrow copies;
  * otherwise run it in the cloud against the full base tables.
  *
  * Spark-first re-expression: where the reference parses SQL with Calcite
  * and walks the RelNode tree to collect per-table project columns, here
  * the session's own analyzer does the parsing/resolution and the
  * required-column set falls out of the analyzed plan's attribute
  * references (exprId-exact, so self-joins, subqueries and aliases are
  * handled by Catalyst, not by a re-implementation). The peer's partial
  * copies are plain column-pruned parquet writes — the PeerDownloader's
  * partial-schema download re-expressed as a pruned scan + write job.
  *
  * At 100 TB the point of this coordinator is the same as the
  * reference's: the decision is O(plan) metadata work on the driver —
  * the data never moves to make it. A covered query touches only the
  * peer's narrow copies (its scan I/O is the projection's, not the wide
  * base's); an uncovered query is not half-served from partial columns
  * but routed whole to where all columns live.
  */
object Offload {

  /** An on-prem/edge site: `dir` holds its partial copies,
    * `cached` maps table name -> the column subset it downloaded. */
  final case class Peer(name: String, dir: String,
      cached: Map[String, Seq[String]]) {
    private[graft] lazy val norm: Map[String, Set[String]] =
      cached.map { case (t, cs) =>
        t.toLowerCase -> cs.map(_.toLowerCase).toSet }
  }

  /** Innermost table aliases of the analyzed plan: every catalog/temp-view
    * reference resolves to a SubqueryAlias over the view's plan, so the
    * aliases with no nested alias beneath them are exactly the base-table
    * scans (VALUES/LocalRelation subtrees are not tables and are skipped —
    * they need no peer data). */
  private def baseTables(analyzed: LogicalPlan): Seq[SubqueryAlias] =
    analyzed.collectWithSubqueries {
      case a: SubqueryAlias
          if !a.child.exists(_.isInstanceOf[SubqueryAlias]) &&
            a.child.collectLeaves().exists(!_.isInstanceOf[LocalRelation]) =>
        a
    }

  /** Per-table columns the query actually references (the reference's
    * PlanAnalysis.getProjectColumns): the union of every plan node's
    * expression references — filter, join, group, sort and project columns
    * all count; unreferenced table columns do not. Subquery plans are
    * included. Self-joins union by table name across occurrences. */
  def requiredColumns(spark: SparkSession, sql: String): Map[String, Set[String]] = {
    val analyzed = spark.sql(sql).queryExecution.analyzed
    val referenced = analyzed
      .collectWithSubqueries { case p => p.references }
      .foldLeft(AttributeSet.empty)(_ ++ _)
    baseTables(analyzed)
      .groupBy(_.identifier.name.toLowerCase)
      .map { case (name, occurrences) =>
        name -> occurrences
          .flatMap(a => a.output.filter(referenced.contains))
          .map(_.name.toLowerCase).toSet
      }
  }

  /** The coordinator decision (Coordinator.java:70-104): true = execute
    * in-cloud, false = the peer covers every required column of every
    * referenced table and the query runs on-prem. A table absent from the
    * peer entirely forces cloud even when the query needs none of its
    * columns (the scan itself still needs rows). */
  def decideInCloud(required: Map[String, Set[String]], peer: Peer): Boolean =
    required.exists { case (t, cols) =>
      !peer.norm.get(t).exists(have => cols.subsetOf(have))
    }

  def decideInCloud(spark: SparkSession, sql: String, peer: Peer): Boolean =
    decideInCloud(requiredColumns(spark, sql), peer)

  /** PeerDownloader analog: materialize the peer's partial-schema copies —
    * one column-pruned scan + write per table (the scan reads ONLY the
    * downloaded columns; at scale this is the narrow projection's I/O,
    * not the wide base's). */
  def download(spark: SparkSession, baseDir: String, peer: Peer): Unit =
    peer.cached.foreach { case (t, cols) =>
      spark.read.parquet(s"$baseDir/$t.parquet")
        .selectExpr(cols: _*)
        .write.mode("overwrite").parquet(s"${peer.dir}/$t.parquet")
    }

  /** Register every base table under `baseDir` as a temp view so the SQL
    * front-end resolves plain table names. */
  def registerBase(spark: SparkSession, baseDir: String): Unit =
    Tables.names.foreach { n =>
      if (new java.io.File(s"$baseDir/$n.parquet").exists())
        spark.read.parquet(s"$baseDir/$n.parquet").createOrReplaceTempView(n)
    }

  /** Decide and run: returns (result, inCloud). On-prem queries have their
    * referenced tables re-pointed at the peer's partial copies before
    * resolution, so the executed plan scans the narrow parquet — the
    * routed DataFrame's inputFiles live under `peer.dir`. */
  def execute(spark: SparkSession, sql: String, baseDir: String,
      peer: Peer): (DataFrame, Boolean) = {
    registerBase(spark, baseDir)
    val required = requiredColumns(spark, sql)
    val inCloud = decideInCloud(required, peer)
    if (!inCloud) required.keys.foreach { t =>
      spark.read.parquet(s"${peer.dir}/$t.parquet").createOrReplaceTempView(t)
    }
    val df = spark.sql(sql)
    if (!inCloud) registerBase(spark, baseDir) // restore for later callers
    (df, inCloud)
  }

  // -------------------------------------------------------------------
  // Registered gate queries (DuckDB oracle runs the same SQL on the full
  // base tables — a routed on-prem answer must be value-identical to the
  // cloud answer, or the partial copies / routing are wrong).

  /** The fixture peer: narrow orders + customer column subsets. */
  private val edgeCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"),
    "customer" -> Seq("c_custkey", "c_mktsegment"))

  private def edgePeer(spark: SparkSession, d: String): Peer = {
    val dir = operators.FormatOps.cachedDir(d, "amphi_peer") { dir =>
      download(spark, d, Peer("edge", dir, edgeCols))
    }
    Peer("edge", dir, edgeCols)
  }

  private val a01Sql =
    """SELECT o_orderpriority, count(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_totalprice > 1000.0
      |GROUP BY o_orderpriority""".stripMargin

  private val a02Sql =
    """SELECT o_orderstatus, count(*) AS cnt
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  private val a03Sql =
    """SELECT c_mktsegment, count(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment""".stripMargin

  private def routed(spark: SparkSession, d: String, sql: String,
      wantCloud: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (df, inCloud) = execute(spark, sql, d, edgePeer(spark, d))
    require(inCloud == wantCloud,
      s"offload decision $inCloud, expected $wantCloud for: $sql")
    df.withColumn("in_cloud", lit(inCloud))
  }

  val queries: Seq[GQuery] = Seq(
    // covered single-table agg: coordinator must route on-prem, and the
    // narrow-copy answer must hash-match the cloud (base-table) oracle
    GQuery("a01_offload_onprem",
      (s, d) => routed(s, d, a01Sql, wantCloud = false),
      Some(
        """SELECT o_orderpriority, count(*) AS cnt,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          |  false AS in_cloud
          |FROM orders WHERE o_totalprice > 1000.0
          |GROUP BY o_orderpriority""".stripMargin)),
    // o_orderstatus is NOT in the peer's subset: must route to cloud
    GQuery("a02_offload_cloud",
      (s, d) => routed(s, d, a02Sql, wantCloud = true),
      Some(
        """SELECT o_orderstatus, count(*) AS cnt, true AS in_cloud
          |FROM orders GROUP BY o_orderstatus""".stripMargin)),
    // covered two-table join: routed on-prem, both scans narrow
    GQuery("a03_offload_join_onprem",
      (s, d) => routed(s, d, a03Sql, wantCloud = false),
      Some(
        """SELECT c_mktsegment, count(*) AS cnt,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          |  false AS in_cloud
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_mktsegment""".stripMargin)))
}
