package graft

import org.apache.spark.sql.SparkSession

/** Operational CLI — the reference's pixels-cli workflow (LOAD → COMPACT →
  * STAT → QUERY, docs/TPC-H.md:38-143; commands in pixels-cli/.../executor/)
  * re-expressed as one spark-submit driver over the engine's public APIs:
  *
  *   LOAD    <parquet-src> <gpx-dest> [--sortBy c[,c2]] [--bucketBy c
  *           --numBuckets n] [--rangeBy c --rangeBounds b1,b2,...]
  *           [--rowGroupRows n] [--overwrite]
  *   IMPORT  <gpx-file[,f2..]|dir> <gpx-table>  register pre-existing gpx
  *                                         files into a table (footer
  *                                         validation + schema-union
  *                                         check; manifest append on log
  *                                         tables, adoption + token bump
  *                                         on plain tables) — no row
  *                                         re-read through Spark
  *   COMPACT <gpx-src> <gpx-dest>          ordered → compact layout merge
  *   COMPACT <gpx-log-table> [--rewrite]   IN-PLACE (commit-log tables:
  *                                         one atomic manifest swap);
  *                                         --rewrite re-encodes through
  *                                         the union schema so evolved
  *                                         tables converge to one shape
  *   STAT    <gpx-table>                   ANALYZE: NDV sidecar for CBO
  *   INDEX   <gpx-table> <col[,col2]>      build a point index (compound
  *                                         when 2+ columns)
  *   VACUUM  <gpx-table> [ttlMs]           sweep crash-orphaned staging;
  *                                         on commit-log tables also
  *                                         reclaims retired data files
  *   LOG     <gpx-table>                   opt the table into the
  *                                         object-store-safe commit log
  *                                         (GpxCommitLog manifests)
  *   QUERY   <sql> --table name=path ...   each path (gpx dir or .parquet)
  *                                         is registered as a temp view
  *
  * Everything here is a thin shell: the heavy lifting is the same DSv2
  * write/scan paths every API user gets, so the CLI adds no second code
  * path to keep correct.
  */
object Cli {

  private def opt(args: Seq[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Seq(`name`, v) => v } match {
      // a flag present with NO value (end of line, or the next token is
      // another flag) must be a usage error — silently dropping it writes
      // an unsorted/appended table the user asked to sort/overwrite, and
      // consuming the next flag as the value corrupts both options
      case Some(v) if v.startsWith("--") => usage()
      case None if args.contains(name) => usage()
      case other => other
    }

  /** every command-line shape error routes here; main() prints the
    * usage text and exits 2, in-JVM callers (tests) catch it */
  final class UsageException extends RuntimeException("bad command line")

  private def usage(): Nothing = throw new UsageException

  val usageText: String =
    """usage: Cli <command> ...
      |  LOAD    <parquet-src> <gpx-dest> [--sortBy c] [--bucketBy c
      |          --numBuckets n] [--rangeBy c --rangeBounds b1,b2,...]
      |          [--rowGroupRows n] [--overwrite]
      |  IMPORT  <gpx-file[,f2..]|dir> <gpx-table>
      |  COMPACT <gpx-src> <gpx-dest>   (or: COMPACT <gpx-log-table>
      |          [--rewrite] in place; --rewrite converges evolved tables)
      |  STAT    <gpx-table>
      |  INDEX   <gpx-table> <col[,col2]>
      |  VACUUM  <gpx-table> [ttlMs]
      |  LOG     <gpx-table>
      |  QUERY   <sql> --table name=path [--table name=path ...]""".stripMargin

  /** exactly n positional operands after the command, or usage() */
  private def operands(args: Seq[String], n: Int): Seq[String] = {
    val got = args.drop(1).take(n)
    if (got.size < n || got.exists(_.startsWith("--"))) usage() else got
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usageText); sys.exit(2) }
    val spark = SparkSession.builder()
      .appName(s"graft-cli-${args.head.toLowerCase}")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args.toSeq)
    catch {
      case _: UsageException =>
        System.err.println(usageText)
        spark.stop()
        sys.exit(2)
    } finally spark.stop()
  }

  /** separated from main for in-JVM tests (no sys.exit) */
  def run(spark: SparkSession, args: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    args.head.toUpperCase match {
      case "LOAD" =>
        val Seq(src, dest) = operands(args, 2)
        var w = spark.read.parquet(src).write.format("gpx")
          .mode(if (args.contains("--overwrite")) "overwrite" else "append")
        opt(args, "--sortBy").foreach(v => w = w.option("sortBy", v))
        opt(args, "--bucketBy").foreach(v => w = w.option("bucketBy", v))
        opt(args, "--numBuckets").foreach(v => w = w.option("numBuckets", v))
        opt(args, "--rangeBy").foreach(v => w = w.option("rangeBy", v))
        opt(args, "--rangeBounds").foreach(v => w = w.option("rangeBounds", v))
        opt(args, "--rowGroupRows").foreach(v => w = w.option("rowGroupRows", v))
        w.save(dest)
        println(s"LOAD ok: $src -> $dest")
      case "IMPORT" =>
        val Seq(src, table) = operands(args, 2)
        // src: one gpx file, a comma list, or a directory of gpx files
        val srcP = new org.apache.hadoop.fs.Path(src)
        val fs = srcP.getFileSystem(conf)
        val files =
          if (fs.exists(srcP) && fs.getFileStatus(srcP).isDirectory)
            // a directory source is read as a TABLE, not a raw listing:
            // on a commit-log source only the head's live files are the
            // table — the dir also holds retired/staged/orphaned files
            // by design (compaction retires in place), and adopting
            // those would resurrect compacted-away rows twice.
            // (Delete-sidecar refusal happens per file inside
            // importFiles, covering every entry point at any depth.)
            graft.format.GpxTable.listFiles(Seq(src), conf).sorted
          else src.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        if (files.isEmpty) usage()
        val (n, rows) = graft.format.GpxMaintenance.importFiles(table, files, conf)
        println(s"IMPORT ok: $n file(s), $rows rows -> $table")
      case "COMPACT" =>
        // two operands: copy-compact into a new dir; one operand: in-place
        // atomic compaction of a commit-log table (--rewrite re-encodes
        // through the union schema so evolved tables converge to 1 shape)
        val ops = args.drop(1).takeWhile(!_.startsWith("--"))
        ops match {
          case Seq(src, dest) =>
            graft.format.GpxCompactor.compact(src, dest, conf)
            println(s"COMPACT ok: $src -> $dest")
          case Seq(table) =>
            val r =
              if (args.contains("--rewrite"))
                graft.format.GpxCompactor.compactRewrite(spark, table, conf)
              else graft.format.GpxCompactor.compactInPlace(table, conf)
            println(s"COMPACT ok: $table in place " +
              s"(${r.inputFiles} -> ${r.outputFiles} files, ${r.rows} rows)")
          case _ => usage()
        }
      case "STAT" =>
        val Seq(table) = operands(args, 1)
        val ndv = graft.format.GpxMaintenance.analyze(spark, table, conf)
        ndv.toSeq.sortBy(_._1).foreach { case (c, v) => println(s"STAT $c ndv=$v") }
        // read-path observability (this JVM's counters — in local mode
        // the ANALYZE pass above just exercised them): cache efficacy is
        // invisible in query output, so STAT is where a regression in the
        // chunk-cache path (validation, purge, byte accounting) surfaces
        val r = graft.format.GpxFileReader
        println(s"STAT cache chunkHits=${r.ChunkCache.hits.get} " +
          s"chunkMisses=${r.ChunkCache.misses.get} " +
          s"chunkRetainedBytes=${r.ChunkCache.retainedBytes} " +
          s"dataBytesRead=${r.dataBytesRead.get} " +
          s"footerReads=${r.footerReads.get} " +
          s"pixelsDecoded=${r.pixelsDecoded.get}")
        val mi = graft.format.GpxPointIndex.MemoryMirror
        println(s"STAT index memoryMirrors=${mi.mirrorCount} " +
          s"mirrorEntries=${mi.entryCount} mirrorHits=${mi.hits.get} " +
          s"mirrorLoads=${mi.loads.get} mirrorRefusals=${mi.refusals.get}")
        // effective liveness-boundary config + its validation verdict: an
        // operator tuning graft.gpx.{vacuumGraceMs,tombstoneGraceMs} or
        // the lock TTL needs to SEE what a table actually runs with — the
        // cross-validation (grace >= lock TTL) otherwise only surfaces
        // when a vacuum or commit first reads the knob, i.e. too late.
        // Misconfigured values print the refusal instead of crashing STAT.
        val lockTtl = graft.format.GpxMutationLock.ttlMs
        def grace(name: String, read: () => Long): String =
          try s"$name=${read()}ms" catch {
            case e: IllegalArgumentException =>
              s"$name=INVALID(${e.getMessage})"
          }
        val vg = grace("vacuumGraceMs",
          () => graft.format.GpxCommitLog.vacuumGraceMs(conf))
        val tg = grace("tombstoneGraceMs",
          () => graft.format.GpxCommitLog.tombstoneGraceMs(conf))
        val verdict =
          if (vg.contains("INVALID") || tg.contains("INVALID")) "INVALID"
          else "OK"
        println(s"STAT liveness mutationLockTtlMs=${lockTtl}ms $vg $tg " +
          s"validation=$verdict")
      case "INDEX" =>
        val Seq(table, cols) = operands(args, 2)
        val parts = cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        if (parts.isEmpty) usage()
        val n = if (parts.size == 1)
          graft.format.GpxPointIndex.build(spark, table, parts.head)
        else
          graft.format.GpxPointIndex.buildCompound(spark, table, parts)
        println(s"INDEX ok: $table(${parts.mkString(",")}) $n keys")
      case "VACUUM" =>
        val Seq(table) = operands(args, 1)
        val ttl = args.lift(2).map(a =>
          try a.toLong catch { case _: NumberFormatException => usage() })
          .getOrElse(24L * 3600 * 1000)
        val swept = graft.format.GpxMaintenance.vacuum(table, ttl, conf)
        swept.foreach(p => println(s"VACUUM swept $p"))
        // commit-log tables: also reclaim data files retired from the
        // manifest (keeping the head + one version for pinned readers)
        if (graft.format.GpxCommitLog.isLogTable(table, conf)) {
          val (dataGone, mfGone) =
            graft.format.GpxCommitLog.vacuum(table, conf, keepVersions = 2)
          println(s"VACUUM log: $dataGone retired data file(s), " +
            s"$mfGone old manifest(s)")
        }
        println(s"VACUUM ok: ${swept.size} paths")
      case "LOG" =>
        val Seq(table) = operands(args, 1)
        val v = graft.format.GpxCommitLog.enable(table, conf)
        println(s"LOG ok: $table at manifest version $v")
      case "QUERY" =>
        val sql = operands(args, 1).head
        // non-overlapping pairs: a dangling --table (or any stray
        // operand) is a shape error, not silently dropped
        args.drop(2).grouped(2).foreach {
          case Seq("--table", nv) => nv.split("=", 2) match {
            case Array(n, p) =>
              val df =
                if (p.endsWith(".parquet")) spark.read.parquet(p)
                else spark.read.format("gpx").load(p)
              df.createOrReplaceTempView(n)
            case _ => usage()
          }
          case _ => usage()
        }
        spark.sql(sql).show(100, truncate = false)
      case _ => usage()
    }
  }
}
