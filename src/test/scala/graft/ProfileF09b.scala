package graft

import graft.format.{GpxFileReader, GpxPointIndex, GpxTable}
import graft.format.GpxFileReader.PixelSlice
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources.In
import org.apache.spark.sql.types.StructType

/** deeper scratch profiler for the index lookup internals */
object ProfileF09b {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val key = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gpx" +
      s"/v${graft.format.GpxFormat.FormatVersion}/ptidx_orders_$key"
    val conf = new Configuration()
    val idx = GpxPointIndex.indexDir(dir, "o_orderkey")
    for (round <- 1 to 2) {
      time(s"r$round listFiles(table)")(GpxTable.listFiles(Seq(dir), conf).size)
      val files = time(s"r$round listFiles(idx)")(GpxTable.listFiles(Seq(idx), conf))
      time(s"r$round statuses") {
        val fs = new Path(dir).getFileSystem(conf)
        GpxTable.listFiles(Seq(dir), conf).foreach(f => fs.getFileStatus(new Path(f)).getLen)
      }
      time(s"r$round footers")(files.foreach(f => GpxFileReader.FooterCache.get(f, conf)))
      val keyFilter = In("key", Array(42L, 4242L, 9999L, 12345L).map(_.asInstanceOf[Any]))
      time(s"r$round readAllBuckets") {
        var rows = 0L
        files.foreach { f =>
          val footer = GpxFileReader.FooterCache.get(f, conf)
          val schema = footer.schema
          footer.rowGroups.foreach { rg =>
            if (GpxFileReader.mayMatch(keyFilter, schema, rg)) {
              val keptPix = rg.chunks.head.pixels.indices.filter(p =>
                GpxFileReader.mayMatchPixel(keyFilter, schema, rg, p)).toArray
              if (keptPix.nonEmpty) {
                val numRows = keptPix.map(rg.chunks.head.pixels(_).rows).sum
                val cols = schema.fields.indices.toArray.map { ci =>
                  val ch = rg.chunks(ci)
                  keptPix.map(p => PixelSlice(
                    ch.offset + ch.pixels(p).relOffset, ch.pixelLength(p),
                    ch.pixels(p).rows))
                }
                val batch = GpxFileReader.readSlices(f, conf, schema, cols, numRows, -1L)
                val it = batch.rowIterator()
                while (it.hasNext) { it.next(); rows += 1 }
                batch.close()
              }
            }
          }
        }
        println(s"  rows=$rows")
      }
    }
  }
}
