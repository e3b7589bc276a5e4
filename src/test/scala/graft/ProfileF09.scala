package graft

import org.apache.hadoop.conf.Configuration

/** scratch phase profiler for the f09 lookup path (not part of the suite) */
object ProfileF09 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.localSession(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val key = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gpx" +
      s"/v${graft.format.GpxFormat.FormatVersion}/ptidx_orders_$key"
    if (!new java.io.File(s"$dir/_done").exists()) {
      time("write") {
        Tables.orders(s, sf).repartition(8).write.format("gpx")
          .mode("overwrite").option("rowGroupRows", "2048").save(dir)
      }
      time("index")(graft.format.GpxPointIndex.build(s, dir, "o_orderkey", numBuckets = 8))
      new java.io.File(s"$dir/_done").createNewFile()
    }
    val conf = new Configuration()
    val keys = Set(42L, 4242L, 9999L, 12345L)
    time("valid")(graft.format.GpxPointIndex.valid(dir, "o_orderkey", conf))
    time("entriesFor")(graft.format.GpxPointIndex.entriesFor(dir, "o_orderkey", keys, conf))
    time("entriesFor2")(graft.format.GpxPointIndex.entriesFor(dir, "o_orderkey", keys, conf))
    val df = time("lookup")(graft.format.GpxPointIndex.lookup(s, dir, "o_orderkey",
      keys, Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")))
    time("collect")(df.count())
    val df2 = time("lookup2")(graft.format.GpxPointIndex.lookup(s, dir, "o_orderkey",
      keys, Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")))
    time("collect2")(df2.count())
    s.stop()
  }
}
