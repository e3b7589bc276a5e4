package graft

import graft.format.{GpxFileReader, GpxTable}
import org.apache.hadoop.conf.Configuration

/** Command-line driver — the analog of pixels-cli's LOAD / COMPACT / STAT /
  * QUERY commands (pixels-cli, docs/TPC-H.md:38-115), spark-submit-able.
  *
  *   LOAD <parquetPathOrDir> <gpxDir> [rowGroupRows]   parquet -> gpx
  *   COMPACT <inDir> <outDir> [targetMB]               ordered -> compact
  *   INDEX <gpxDir> <column> [numBuckets]              build point index
  *   VACUUM <gpxDir> [ttlMinutes]                      sweep orphaned staging
  *   STAT <gpxDirOrFile>                               footer/zone-map dump
  *   QUERY <sql> [warehouseDir]                        SQL via graft catalog
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Cli LOAD|COMPACT|INDEX|VACUUM|STAT|QUERY ...")
    args(0).toUpperCase match {
      case "LOAD" =>
        val spark = Tables.localSession(8)
        val rg = if (args.length > 3) args(3).toInt else format.GpxFormat.DefaultRowGroupRows
        spark.read.parquet(args(1)).write.format("gpx")
          .option("rowGroupRows", rg.toString).mode("overwrite").save(args(2))
        val n = spark.read.format("gpx").load(args(2)).count()
        println(s"LOADED $n rows -> ${args(2)}")
        spark.stop()

      case "COMPACT" =>
        val spark = Tables.localSession(8)
        val target = if (args.length > 3) args(3).toLong * 1024 * 1024 else 128L * 1024 * 1024
        val res = Compactor.compact(spark, args(1), args(2), target)
        println(s"COMPACTED ${res.inputFiles} files -> ${res.outputFiles} (${res.rows} rows)")
        spark.stop()

      case "INDEX" =>
        // INDEX <gpxDir> <column> [numBuckets] — build the S20 point index
        val spark = Tables.localSession(8)
        val n = if (args.length > 3) args(3).toInt else 16
        val entries = format.GpxPointIndex.build(spark, args(1), args(2), n)
        println(s"INDEXED $entries entries on ${args(2)} -> ${args(1)}/_index/${args(2)}")
        spark.stop()

      case "VACUUM" =>
        // VACUUM <gpxDir> [ttlMinutes] — sweep orphaned write-staging dirs
        val ttl = (if (args.length > 2) args(2).toLong else 60L) * 60 * 1000
        val swept = format.GpxMaintenance.vacuum(args(1), ttl)
        println(s"VACUUMED ${swept.length} staging dirs under ${args(1)}")
        swept.foreach(p => println(s"  $p"))

      case "STAT" =>
        val conf = new Configuration()
        GpxTable.listFiles(Seq(args(1)), conf).foreach { f =>
          val footer = GpxFileReader.readFooter(f, conf)
          val rows = footer.rowGroups.map(_.numRows.toLong).sum
          println(s"$f: ${footer.rowGroups.length} row groups, $rows rows")
          println(s"  schema: ${footer.schema.toDDL}")
          footer.rowGroups.zipWithIndex.take(3).foreach { case (rg, i) =>
            val encs = rg.chunks.zipWithIndex.map { case (c, ci) =>
              val name = footer.schema(ci).name
              val enc = c.encoding match {
                case 0 => "plain"; case 1 => "rle"; case 2 => "dict"
                case 3 => "for"; case 4 => "sdec"; case 5 => "xor64"
                case 6 => "xor32"; case 7 => "delta"; case e => s"enc$e"
              }
              s"$name=$enc"
            }.mkString(" ")
            println(s"  rg$i (${rg.numRows} rows): $encs")
          }
        }

      case "QUERY" =>
        val spark = Tables.localSession(8)
        if (args.length > 2) {
          spark.conf.set("spark.sql.catalog.graft", "graft.format.GpxCatalog")
          spark.conf.set("spark.sql.catalog.graft.warehouse", args(2))
        }
        spark.sql(args(1)).show(50, false)
        spark.stop()

      case other => sys.error(s"unknown command $other")
    }
  }
}
