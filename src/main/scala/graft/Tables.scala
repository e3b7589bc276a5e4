package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-provided parquet test data.
  *
  * Mirrors the reference's metadata-catalog role (pixels-common metadata
  * domain, `proto/metadata.proto:33-45`): a name -> storage-path mapping
  * that the scan layer resolves. Here the "catalog" is the sfDir layout;
  * the production path would be a Spark catalog plugin.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table. Filters/projections on the result are pushed into the
    * parquet scan by Catalyst (PushedFilters / ReadSchema), which is the
    * Spark-native equivalent of the reference's scan pushdown
    * (pixels-executor scan/Scanner.java:36-93). */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Local test/bench session defaults tuned for local[32] single-JVM mode;
    * on a real cluster these come from spark-submit conf. */
  def localSession(cores: Int = 4): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned joins over bucketed gpx layouts plan with
      // zero Exchange only when v2 bucketing is on — the right default
      // for an engine whose co-located-join story is the bucket layout
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** One verifiable operator: a Spark implementation plus (when SQL-
  * expressible) a DuckDB oracle over the same parquet tables. The driver
  * hash-compares both sides, so column NAMES and deterministic VALUES and
  * row order must match exactly (see Determinism notes in each module). */
final case class GQuery(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Registry for caches a query pins while its (lazy) result is computed.
  * Queries whose OUTPUT is unbounded at scale (e.g. dedup pair sets)
  * cannot eagerly materialize-and-unpersist like the bounded-top-k vector
  * ops do — the consumer must drive the action. So: operators mark their
  * reused intermediates with `.tracked`, and the consumer (Verify/Bench,
  * or any embedding application) calls [[release]] after materializing
  * each result. Executor storage is never pinned past the query that
  * needed it — on a shared cluster, leaked persists are a session-lifetime
  * memory leak (this repo's LEAKCHECK class).
  *
  * SCOPE: the registry is process-global, sized for the one-query-at-a-
  * time harness contract (Bench/Verify run queries sequentially). An
  * embedder running tracked graft operators CONCURRENTLY on one session
  * must serialize release() with query completion — releasing from one
  * query's consumer unpersists frames a concurrent query still reuses
  * (correct results, but its multi-consumer intermediates recompute). */
object CacheScope {
  private val frames =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val rdds =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
  implicit class Trackable(private val df: DataFrame) extends AnyVal {
    /** persist + register for release after the consuming action */
    def tracked: DataFrame =
      CacheScope.synchronized { frames += df; df.persist() }
  }
  /** register an already-persisted RDD (iterative operators' plan-barrier
    * frames) for release after the consuming action */
  def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    synchronized { rdds += rdd }
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach(_.unpersist(blocking)); frames.clear()
    rdds.foreach(_.unpersist(blocking)); rdds.clear()
  }
}
