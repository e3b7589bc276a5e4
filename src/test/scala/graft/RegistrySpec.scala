package graft

/** Registry-wide safety net: every registered query must ANALYZE cleanly
  * against the real test data. DataFrame construction runs Catalyst
  * analysis eagerly, so schema drift in the inputs (the round-7 incident:
  * the driver regenerated events.parquet with a different timestamp unit
  * and 29 queries started failing analysis) surfaces HERE, in `sbt test`,
  * instead of only in the driver's correctness artifact. Construction also
  * touches the cachedDir materializations at sf0.001, which keeps the
  * check cheap (no query execution on the large side).
  */
class RegistrySpec extends GraftSpec {

  test("every registered query constructs and analyzes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).schema; None }
        catch { case e: Throwable =>
          Some(name -> Option(e.getMessage).getOrElse(e.toString).take(200)) }
    }
    CacheScope.release(blocking = true)
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n" +
        failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
  }

  test("registry names are unique and every oracle belongs to a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct)}")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles: ${o -- q}")
  }

  test("the driver smoke contract holds: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
