package graft

import org.apache.spark.sql.functions._

/** Ad-hoc selectivity probe for the q31/q42/q43 pre-filter work. */
object ProbeTpch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def ts(x: String) = lit(x).cast("timestamp_ntz")
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    println("lineitem " + li.count() + " orders " + o.count() +
      " suppliers " + Tables.supplier(s, d).count() +
      " parts " + Tables.part(s, d).count())
    println("q31 filtered orders: " + o.filter(col("o_orderdate") >= ts("1996-07-01") &&
      col("o_orderdate") < ts("1996-10-01")).count())
    val late = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    println("q42 lateLines: " + late.count() +
      " distinct late orders: " + late.select("l_orderkey").distinct().count())
    println("q43 ASIA suppliers: " + Tables.supplier(s, d)
      .join(Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey")),
        col("s_nationkey") === col("n_nationkey")).count())
    println("q43 size-5 parts: " + Tables.part(s, d)
      .filter(col("p_size") === 5).count())
    s.stop()
  }
}
