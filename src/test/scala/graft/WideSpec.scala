package graft

import graft.format.{GpxFileReader, GpxTable}
import graft.operators.WideOps
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

/** ClickBench-style wide table: 43-column hits derived from events, stored
  * in gpx. The value of a wide corpus is the projection economics — a
  * 2-column query must read 2 columns' bytes, not 43. */
class WideSpec extends GraftSpec {
  private val sp = TestSpark.spark
  private val conf = new Configuration()

  test("hits survives the gpx round trip with its full wide schema") {
    val direct = WideOps.hitsDf(sp, sf)
    val viaGpx = WideOps.hitsGpx(sp, sf)
    assert(direct.schema.length >= 40, s"hits is ${direct.schema.length} cols")
    assert(viaGpx.schema.map(f => (f.name, f.dataType)) ==
      direct.schema.map(f => (f.name, f.dataType)))
    assert(viaGpx.count() == direct.count())
    // spot-check content equality despite the sort-for-storage
    val a = direct.orderBy("watch_id").limit(50).collect().map(_.toSeq)
    val b = viaGpx.orderBy("watch_id").limit(50).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  /** test-local hits gpx with tiny row groups so pruning is observable at
    * sf0.001 (1000 rows -> ~8 row groups x 4 pixels) */
  private lazy val smallDir: String = {
    val d = java.nio.file.Files.createTempDirectory("gpx_hits").toString
    WideOps.hitsDf(sp, sf).orderBy("counter_id", "event_sec")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "128").option("pixelRows", "32").save(d)
    d
  }

  test("narrow projection over the wide schema decodes only requested chunks") {
    val hits = sp.read.format("gpx").load(smallDir)
    val nCols = hits.schema.length
    // per-column pixel counts from the footers
    val files = GpxTable.listFiles(Seq(smallDir), conf)
    assert(files.nonEmpty)
    val footers = files.map(GpxFileReader.FooterCache.get(_, conf))
    def pixelsOf(col: String): Long = footers.map { f =>
      val i = f.schema.fieldNames.indexOf(col)
      f.rowGroups.map(_.chunks(i).pixels.length.toLong).sum
    }.sum
    val twoColPixels = pixelsOf("counter_class") + pixelsOf("price_cents")
    val allPixels = footers.map(f =>
      f.rowGroups.map(_.chunks.map(_.pixels.length.toLong).sum).sum).sum
    val before = GpxFileReader.pixelsDecoded.get()
    val n = hits.select("counter_class", "price_cents").collect().length
    val decoded = GpxFileReader.pixelsDecoded.get() - before
    assert(n > 0)
    assert(decoded == twoColPixels,
      s"2-col projection decoded $decoded pixels, expected $twoColPixels " +
        s"(full width would be $allPixels)")
    assert(twoColPixels * (nCols / 4) < allPixels,
      "wide schema premise: 2 columns are a small fraction of total chunks")
  }

  test("regex extraction query still prunes to its referenced columns") {
    // w12's shape: regexp_extract over url + distinct user_id — the regex
    // runs ABOVE the scan, so the scan must decode exactly the url and
    // user_id chunks, not the wide row
    val hits = sp.read.format("gpx").load(smallDir)
    val files = GpxTable.listFiles(Seq(smallDir), conf)
    val footers = files.map(GpxFileReader.FooterCache.get(_, conf))
    def pixelsOf(col: String): Long = footers.map { f =>
      val i = f.schema.fieldNames.indexOf(col)
      f.rowGroups.map(_.chunks(i).pixels.length.toLong).sum
    }.sum
    hits.createOrReplaceTempView("hits_prune")
    val before = GpxFileReader.pixelsDecoded.get()
    val rows = sp.sql(
      """SELECT regexp_extract(url, 'https://[^/]+/(s[0-9]+)/', 1) AS section,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM hits_prune
        |GROUP BY regexp_extract(url, 'https://[^/]+/(s[0-9]+)/', 1)""".stripMargin)
      .collect()
    val decoded = GpxFileReader.pixelsDecoded.get() - before
    val expected = pixelsOf("url") + pixelsOf("user_id")
    assert(rows.nonEmpty)
    assert(decoded == expected,
      s"regex query decoded $decoded pixels, expected url+user_id = $expected")
  }

  // The w20-w22 registered queries are self-auditing (approx vs exact in
  // the same query, only group keys/counts plus pass bits reach the
  // driver). The specs assert every audit bit is 1 — a sketch regression
  // (wrong column, broken merge, blown error) flips a bit — plus the
  // shape/measure facts the audit doesn't cover.

  test("approx quantile audit: every os group passes its rank-window gate") {
    val got = SparkEntry.queries("w20_wide_approx_quantiles")(sp, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    assert(got.length == 5) // five os values
    got.foreach { case (os, n, p50ok, p90ok, p99ok) =>
      assert(n > 0)
      assert(p50ok == 1 && p90ok == 1 && p99ok == 1,
        s"$os quantile audit bits: p50=$p50ok p90=$p90ok p99=$p99ok")
    }
  }

  test("approx distinct audit: every country within 5% of exact") {
    val got = SparkEntry.queries("w21_wide_approx_distinct_users")(sp, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 6) // six countries
    got.foreach { case (country, hits, ok) =>
      assert(hits > 0)
      assert(ok == 1, s"$country HLL++ estimate outside the 5% gate")
    }
  }

  test("sketch rollup audit: merged estimate within 5%, hits sum exactly") {
    val got = SparkEntry.queries("w22_wide_sketch_rollup")(sp, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 6)
    WideOps.hitsGpx(sp, sf).createOrReplaceTempView("hits_w22")
    val exactN = sp.sql(
      """SELECT country, COUNT(*) AS n
        |FROM hits_w22 GROUP BY country""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (country, hits, ok) =>
      // the additive measure must survive the rollup exactly
      assert(hits == exactN(country), s"$country rollup hits $hits")
      // lgK=14 DataSketches HLL is ~1.6% rsd; the 5% audit gate catches
      // wrong-column or a merge that double-counts, not sketch internals
      assert(ok == 1, s"$country sketch-merge audit failed")
    }
  }

  test("w36 SUM fan-out decodes a single column's pixels, not the wide row") {
    // 30 parallel SUM(resolution_w + k) aggregates reference ONE column:
    // the scan must decode exactly resolution_w's chunks of the 43-col row
    val hits = sp.read.format("gpx").load(smallDir)
    val files = GpxTable.listFiles(Seq(smallDir), conf)
    val footers = files.map(GpxFileReader.FooterCache.get(_, conf))
    val oneCol = footers.map { f =>
      val i = f.schema.fieldNames.indexOf("resolution_w")
      f.rowGroups.map(_.chunks(i).pixels.length.toLong).sum
    }.sum
    hits.createOrReplaceTempView("hits_fanout")
    val before = GpxFileReader.pixelsDecoded.get()
    val row = sp.sql("SELECT " + (0 until 30).map(k =>
      s"CAST(SUM(resolution_w + $k) AS BIGINT) AS s$k").mkString(", ") +
      " FROM hits_fanout").collect()
    val decoded = GpxFileReader.pixelsDecoded.get() - before
    assert(row.length == 1)
    assert(decoded == oneCol,
      s"fan-out decoded $decoded pixels, expected resolution_w only = $oneCol")
  }

  test("selective wide query prunes row groups via the storage sort") {
    // hits is stored sorted by (counter_id, event_sec): an equality on
    // counter_id must zone-map-skip most row groups
    val hits = sp.read.format("gpx").load(smallDir)
    val before = GpxFileReader.pixelsDecoded.get()
    val one = hits.filter(col("counter_id") === 7)
      .select("counter_id", "url").collect()
    val selective = GpxFileReader.pixelsDecoded.get() - before
    val before2 = GpxFileReader.pixelsDecoded.get()
    val all = hits.select("counter_id", "url").collect()
    val full = GpxFileReader.pixelsDecoded.get() - before2
    assert(one.nonEmpty && all.length > one.length)
    assert(selective < full,
      s"selective scan decoded $selective pixels vs full $full")
  }
}
