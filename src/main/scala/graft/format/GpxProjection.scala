package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Projection layouts — the reference's materialized column-subset copies
  * (pixels-common metadata/domain/Projections.java,
  * OriginProjectionPattern.java: per-table narrow layouts that scans are
  * routed to when they cover the query) as gpx sub-tables:
  *
  *   <table>/_proj/<name>/          the projection's own gpx files
  *   <table>/_proj/<name>/_manifest the column list + the exact base
  *                                  listing (data files AND delete
  *                                  sidecars) the copy reflects
  *
  * Routing ([[GpxScanBuilder.build]]): a CURRENT read whose required +
  * filter columns are covered by a VALID projection scans the projection's
  * files instead of the wide base — on a 100-column table where every
  * query touches 6, that is the difference between seeking 6 chunks per
  * row group of a wide layout and streaming a purpose-built narrow one
  * (fewer, larger, better-clustered chunks; its own zone maps). The
  * NARROWEST covering projection wins.
  *
  * Validity is exact: the manifest records the base's (relpath, len,
  * mtime) listing including `_del` sidecars; ANY divergence (insert,
  * delete, rewrite, new bitmap) invalidates, and scans silently fall back
  * to the base — never a stale answer. [[refresh]] re-validates: a pure
  * append diff copies ONLY the new files' columns (maintenance cost is
  * O(inserted data), the reference's projection-maintenance economics);
  * anything else rebuilds.
  *
  * Time-travel reads are NEVER routed: a projection folds the base's
  * delete bitmaps at build time, so only the current snapshot is
  * reproducible from it. Snapshot scans read the base (documented).
  */
object GpxProjection {

  val ProjDir = "_proj"

  /** `token`: the base's [[GpxVersion]] layout token read BEFORE the
    * listing/copy was captured — the O(1) validity check. None on
    * legacy manifests (validity then falls back to the exact listing
    * comparison). */
  final case class Manifest(columns: Seq[String], covered: Seq[String],
      token: Option[String] = None)

  def projPath(table: String, name: String): Path =
    new Path(new Path(table, ProjDir), name)

  /** base listing lines "rel|len|mtime" over data files AND delete
    * sidecars, sorted — the exact-coverage token */
  def baseListing(table: String, conf: Configuration): Seq[String] = {
    val qroot = GpxTable.qualifiedRoot(table, conf)
    def rel(full: String): String =
      if (full.startsWith(qroot)) full.drop(qroot.length).stripPrefix("/") else full
    val data = GpxTable.listFiles(Seq(table), conf)
    val sidecars = GpxFs.listRecursive(table, conf).collect {
      case (full, isFile) if isFile && full.endsWith(".del") &&
        !full.substring(full.lastIndexOf('/') + 1).startsWith(".") &&
        rel(full).split('/').contains(GpxDeleteBitmap.DelDir) => full
    }
    (data ++ sidecars).map { f =>
      val st = GpxFs.stat(f, conf)
      s"${rel(f)}|${st.map(_.len).getOrElse(-1L)}|${st.map(_.mtime).getOrElse(-1L)}"
    }.sorted
  }

  private def manifestPath(table: String, name: String): Path =
    new Path(projPath(table, name), "_manifest")

  private def writeManifest(table: String, name: String, m: Manifest,
      conf: Configuration): Unit = {
    val p = manifestPath(table, name)
    val out = p.getFileSystem(conf).create(p, true)
    val tokLine = m.token.map(t => s"token:$t\n").getOrElse("")
    try out.write((m.columns.mkString(",") + "\n" + tokLine +
      m.covered.mkString("\n")).getBytes("UTF-8"))
    finally out.close()
  }

  def readManifest(table: String, name: String,
      conf: Configuration): Option[Manifest] = {
    val p = manifestPath(table, name)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val lines = txt.split("\n").toSeq
      val tok = lines.lift(1).filter(_.startsWith("token:"))
        .map(_.stripPrefix("token:"))
      val rest = if (tok.isDefined) lines.drop(2) else lines.tail
      Some(Manifest(lines.head.split(",").toSeq.filter(_.nonEmpty),
        rest.filter(_.nonEmpty), tok))
    }
  }

  def listProjections(table: String, conf: Configuration): Seq[String] = {
    val d = new Path(table, ProjDir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  def drop(table: String, name: String, conf: Configuration): Unit = {
    val p = projPath(table, name)
    p.getFileSystem(conf).delete(p, true)
  }

  /** carry the base's physical-layout hints that the projection can keep:
    * bucket spec if the bucket column survives, sort columns restricted
    * to the projected set */
  private def layoutOptions(table: String, columns: Seq[String],
      conf: Configuration): (Option[GpxTable.BucketSpec], Seq[String]) = {
    val bucket = GpxTable.readBucketSpec(table, conf)
      .filter(b => columns.contains(b.column))
    val sort = GpxTable.readSortSpec(table, conf).filter(columns.contains)
    (bucket, sort)
  }

  /** create or fully (re)build the projection: one Spark job reading only
    * the projected columns of the base (masks applied, pruned scan) */
  def build(spark: SparkSession, table: String, name: String,
      columns: Seq[String]): Unit = {
    val conf = new Configuration()
    columns.foreach(c => require(spark.read.format("gpx").load(table)
      .schema.fieldNames.contains(c),
      s"projection column $c not in table schema"))
    // token read BEFORE the listing/copy: a commit racing this build
    // changes the current token away from the recorded one, so the
    // manifest conservatively invalidates instead of serving stale
    val tok = GpxVersion.current(table, conf)
    val listing = baseListing(table, conf)
    // the copy reads the CAPTURED listing's data files explicitly, never
    // the live table path: a scan of the live dir lists at EXECUTION
    // time, so a file committed mid-build would be copied in while
    // absent from `covered` — the next refresh would take the
    // pure-append path and copy it AGAIN, after which the manifest
    // validates and the projection serves its rows twice (the
    // token-invalidation above cannot catch that: the refresh re-stamps
    // the current token over the doubled contents). Same discipline as
    // GpxPointIndex.buildCols.
    val qroot = GpxTable.qualifiedRoot(table, conf)
    val dataFiles = listing.map(_.split('|').head)
      .filterNot(_.split('/').contains(GpxDeleteBitmap.DelDir))
      .map(r => s"$qroot/$r")
    val base =
      if (dataFiles.nonEmpty) spark.read.format("gpx").load(dataFiles: _*)
      else spark.read.format("gpx").load(table) // empty table: nothing to race
    val dir = projPath(table, name)
    val (bucket, sort) = layoutOptions(table, columns, conf)
    var w = base.selectExpr(columns: _*)
      .write.format("gpx").mode("overwrite")
    bucket.foreach(b => w = w.option("bucketBy", b.column)
      .option("numBuckets", b.numBuckets.toString))
    if (sort.nonEmpty) w = w.option("sortBy", sort.mkString(","))
    w.save(dir.toString)
    writeManifest(table, name, Manifest(columns, listing, tok), conf)
  }

  /** bring the projection up to date: no-op when current, O(new data)
    * append for pure inserts, full rebuild otherwise.
    *
    * Serialized per projection (a mutation lock scoped to the projection
    * dir, NOT the table — refreshes must never contend with table DML):
    * two concurrent refreshes after two lock-free appends would BOTH read
    * the pre-refresh manifest, both take the pure-append path, and each
    * append the same new files — a projection that serves every new row
    * twice while its manifest validates. The loser of this lock simply
    * skips: the winner re-reads the manifest inside the lock and covers
    * the same commits, and a skipped refresh only leaves the projection
    * stale (coverage check then falls back to the base scan — never
    * wrong). */
  def refresh(spark: SparkSession, table: String, name: String): Unit = {
    val conf = new Configuration()
    // refresh-scoped lock path (NOT the projection dir itself: the full-
    // rebuild branch runs an INSERT OVERWRITE into that dir, whose commit
    // takes the dir's own mutation lock — same-scope locking would make
    // every rebuild refuse against its own refresh)
    val scope = new Path(projPath(table, name), "_refreshscope").toString
    try GpxMutationLock.withLock(scope, conf,
      s"projection refresh $name") { refreshLocked(spark, table, name, conf) }
    catch { case _: java.util.ConcurrentModificationException => () }
  }

  private def refreshLocked(spark: SparkSession, table: String, name: String,
      conf: Configuration): Unit = {
    val m = readManifest(table, name, conf).getOrElse(
      throw new IllegalArgumentException(s"no projection $name on $table"))
    // O(1) fast path: unchanged token = nothing to do, no listing walk
    val tok = GpxVersion.current(table, conf)
    if (tok.isDefined && m.token == tok) return
    val current = baseListing(table, conf)
    if (current == m.covered) {
      // bytes unchanged, token moved (or legacy manifest): revalidate
      writeManifest(table, name, Manifest(m.columns, current, tok), conf)
      return
    }
    val covered = m.covered.toSet
    val added = current.filterNot(covered)
    val pureAppend = covered.subsetOf(current.toSet) &&
      added.forall(l => !l.contains(s"${GpxDeleteBitmap.DelDir}/"))
    if (pureAppend) {
      val qroot = GpxTable.qualifiedRoot(table, conf)
      val newFiles = added.map(l => s"$qroot/${l.split('|').head}")
      val (bucket, sort) = layoutOptions(table, m.columns, conf)
      var w = spark.read.format("gpx").load(newFiles: _*)
        .selectExpr(m.columns: _*)
        .write.format("gpx").mode("append")
      bucket.foreach(b => w = w.option("bucketBy", b.column)
        .option("numBuckets", b.numBuckets.toString))
      if (sort.nonEmpty) w = w.option("sortBy", sort.mkString(","))
      w.save(projPath(table, name).toString)
      writeManifest(table, name, Manifest(m.columns, current, tok), conf)
    } else build(spark, table, name, m.columns)
  }

  /** the narrowest VALID projection covering `needed`, as
    * (projection dir, its columns) — None falls back to the base scan.
    *
    * Validity at scan-build time is ONE tiny read: the current
    * [[GpxVersion]] token must equal the token the manifest recorded
    * (every commit path bumps it). Only legacy manifests/tables without
    * tokens pay the exact O(files) listing comparison — the planning-time
    * walk this token exists to retire. */
  def covering(table: String, needed: Set[String],
      conf: Configuration): Option[(String, Seq[String])] = {
    val names = listProjections(table, conf)
    if (names.isEmpty) return None
    val curTok = GpxVersion.current(table, conf)
    lazy val current = baseListing(table, conf) // only walked sans tokens
    names.flatMap { n =>
      readManifest(table, n, conf) match {
        case Some(m) if needed.subsetOf(m.columns.toSet) && {
          if (m.token.isDefined && curTok.isDefined) m.token == curTok
          else m.covered == current
        } => Some((projPath(table, n).toString, m.columns))
        case _ => None
      }
    }.sortBy(_._2.length).headOption
  }
}
