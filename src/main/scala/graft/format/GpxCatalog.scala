package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.jdk.CollectionConverters._

/** Filesystem-backed catalog for gpx tables — the Spark-native replacement
  * of the reference's metadata service (proto/metadata.proto:33-45:
  * CreateSchema/CreateTable/table->paths mapping). Layout:
  * `<warehouse>/<namespace>/<table>/` holds the gpx files plus a
  * `_schema.ddl` sidecar (the catalog record). Registration:
  *
  *   spark.sql.catalog.graft = graft.format.GpxCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *
  * then `CREATE TABLE graft.db.t (...) USING gpx`, `INSERT INTO`,
  * `SELECT`, `ANALYZE TABLE ... COMPUTE STATISTICS` (CBO stats) all work
  * through plain Spark SQL.
  */
class GpxCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _
  private val conf = new Configuration()
  private def fs = warehouse.getFileSystem(conf)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = Option(options.get("warehouse"))
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/gpx_warehouse")
    warehouse = new Path(w)
    fs.mkdirs(warehouse)
  }

  override def name(): String = catalogName

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, n) => new Path(p, n))
  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), ident.name())

  // ---- namespaces ----
  override def defaultNamespace(): Array[String] = Array("default")

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(warehouse).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) listNamespaces()
    else if (namespaceExists(ns)) Array.empty
    else throw new NoSuchNamespaceException(ns)
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    fs.exists(nsPath(ns))

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Map.empty[String, String].asJava
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit =
    fs.mkdirs(nsPath(ns))

  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    fs.delete(nsPath(ns), cascade)

  // ---- tables ----
  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(nsPath(ns)).filter(_.isDirectory)
      .map(s => Identifier.of(ns, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(new Path(tablePath(ident), "_schema.ddl"))

  override def loadTable(ident: Identifier): Table =
    loadTableAt(ident, None)

  /** SQL time travel: `SELECT ... FROM t FOR TIMESTAMP AS OF ts` — Spark
    * hands the timestamp in epoch MICROS, which is exactly the commitTs
    * unit catalog INSERTs stamp (MVCC snapshot read, S19). */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadTableAt(ident, Some(timestamp))

  /** `FOR VERSION AS OF v`: v is a raw commitTs long (writer-stamped). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val ts =
      try java.lang.Long.parseLong(version)
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"gpx: FOR VERSION AS OF expects a numeric commitTs, got '$version'")
      }
    loadTableAt(ident, Some(ts))
  }

  private def loadTableAt(ident: Identifier, snapshotTs: Option[Long]): Table = {
    val dir = tablePath(ident)
    val ddlFile = new Path(dir, "_schema.ddl")
    if (!fs.exists(ddlFile)) throw new NoSuchTableException(ident)
    val in = fs.open(ddlFile)
    val ddl = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    new GpxTable(StructType.fromDDL(ddl), Seq(dir.toString),
      catalogManaged = true, defaultSnapshotTs = snapshotTs)
  }

  /** `PARTITIONED BY (bucket(n, col))` -> the gpx hash-bucketed layout
    * (the reference's partitioned-table metadata, proto/pixels.proto:
    * 130-138); any other transform is rejected. */
  private def bucketSpecOf(partitions: Array[Transform],
      schema: StructType): Option[GpxTable.BucketSpec] = partitions match {
    case Array() => None
    case Array(t) if t.name().equalsIgnoreCase("bucket") =>
      val n = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Number] =>
          l.value().asInstanceOf[Number].intValue()
      }.getOrElse(throw new IllegalArgumentException(
        s"bucket transform needs a literal bucket count: $t"))
      val col = t.references().headOption.map(_.fieldNames().mkString("."))
        .getOrElse(throw new IllegalArgumentException(
          s"bucket transform needs a column: $t"))
      val i = schema.fieldNames.indexOf(col)
      require(i >= 0, s"bucket column $col not in schema")
      require(GpxTable.bucketableType(schema(i).dataType),
        s"bucket column $col must be integer-family, got ${schema(i).dataType}")
      require(n > 0, s"numBuckets must be positive, got $n")
      Some(GpxTable.BucketSpec(col, n))
    case other =>
      throw new UnsupportedOperationException(
        s"gpx supports only a single bucket(n, col) transform, got ${other.mkString(",")}")
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // ---- validate EVERYTHING before the first byte is written: a
    // failed require after _schema.ddl landed would leave a half-created
    // table (tableExists=true), making the corrected retry throw
    // TableAlreadyExists until the user hand-deletes warehouse files ----
    val bucket = bucketSpecOf(partitions, schema)
    val provider = Option(properties.get(TableCatalog.PROP_PROVIDER))
    require(provider.forall(_.equalsIgnoreCase("gpx")),
      s"graft catalog only stores gpx tables, got $provider")
    require(schema.fields.forall(f => GpxFormat.supported(f.dataType)),
      s"unsupported gpx schema: $schema")
    // TBLPROPERTIES('sort_by'='c1,c2') -> ordered layout: INSERTs sort
    // within partitions on these columns so zone maps stay selective
    // (the reference's ordered table path, proto/pixels.proto layouts)
    val sortCols: Option[Seq[String]] =
      Option(properties.get("sort_by")).map { sb =>
        val cols = sb.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        cols.foreach(c => require(schema.fieldNames.contains(c),
          s"sort_by column $c not in schema"))
        cols
      }
    // TBLPROPERTIES('range_by'='col:b1,b2,...') -> range-partitioned
    // layout: INSERTs route rows to per-range files by the declared split
    // points, scans prune by range id from file names alone (reference
    // Range.java / RangeIndex.java catalog-level range assignment)
    val rangeSpec: Option[(String, Seq[Long])] =
      Option(properties.get("range_by")).map { rb =>
        require(rb.contains(":"),
          s"range_by must be 'col:b1,b2,...', got '$rb'")
        val Array(c, bs) = rb.split(":", 2)
        val col = c.trim
        val i = schema.fieldNames.indexOf(col)
        require(i >= 0, s"range_by column $col not in schema")
        require(GpxTable.bucketableType(schema(i).dataType),
          s"range_by column $col must be integer-family, got ${schema(i).dataType}")
        require(bucket.isEmpty,
          "range_by and PARTITIONED BY bucket(...) are mutually exclusive")
        val bounds = bs.split(",").toSeq.map { b =>
          try b.trim.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"range_by bound '$b' is not a long")
          }
        }
        require(bounds.nonEmpty && bounds == bounds.sorted &&
          bounds.distinct == bounds,
          s"range_by bounds must be ascending distinct longs, got $bounds")
        (col, bounds)
      }
    val explicitProtoV = Option(properties.get("commit_protocol"))
    explicitProtoV.foreach(p => require(p == "manifest" || p == "rename",
      s"commit_protocol must be 'manifest' or 'rename', got '$p'"))
    // ---- all inputs validated: persist ----
    val dir = tablePath(ident)
    fs.mkdirs(dir)
    // bind to the warehouse commit-timestamp oracle: every table of this
    // catalog stamps from ONE monotone counter, so a single GpxTxn token
    // is a consistent cross-table snapshot (transaction.proto:33-48 analog)
    GpxTxn.bind(dir.toString, warehouse.toString, conf)
    bucket.foreach { b =>
      val bout = fs.create(new Path(dir, "_bucketspec"), true)
      try bout.write(s"${b.column}\n${b.numBuckets}".getBytes("UTF-8"))
      finally bout.close()
    }
    sortCols.foreach { cols =>
      val sout = fs.create(new Path(dir, "_sortspec"), true)
      try sout.write(cols.mkString("\n").getBytes("UTF-8"))
      finally sout.close()
    }
    rangeSpec.foreach { case (col, bounds) =>
      val rout = fs.create(new Path(dir, "_rangespec"), true)
      try rout.write(s"$col\n${bounds.mkString(",")}".getBytes("UTF-8"))
      finally rout.close()
    }
    // TBLPROPERTIES('commit_protocol'='manifest') -> the object-store-safe
    // conditional-put commit log (GpxCommitLog): v1 seeds from the (empty)
    // table, embedding the layout specs written above; every later write
    // commits through the log and readers resolve it instead of listing.
    // With no explicit property, the protocol routes by filesystem
    // capability: a warehouse on a scheme without atomic rename (s3a, gs,
    // abfs, wasb, hostile...) gets the manifest log by DEFAULT — the same
    // safe-by-default rule as path-based writes (GpxCommitLog.routeWantLog).
    if (GpxCommitLog.routeWantLog(dir.toString, conf, explicitProtoV))
      GpxCommitLog.enable(dir.toString, conf)
    // _schema.ddl LAST, via tmp + rename: its presence IS tableExists, so
    // publishing it after every other metadata file makes table creation
    // atomic at the catalog level — a crash anywhere above leaves
    // tableExists=false and a clean retry (the partial sidecars are
    // overwritten), instead of a half-initialized record that throws
    // TableAlreadyExistsException on retry and breaks loadTable
    publishSmallFile(new Path(dir, "_schema.ddl"), schema.toDDL)
    new GpxTable(schema, Seq(dir.toString), catalogManaged = true)
  }

  /** Atomic small-file publish: write a temp sibling, then rename ONTO
    * the destination with FileContext's OVERWRITE rename (atomic on
    * posix/HDFS). Falls back to delete+rename only where FileContext is
    * unsupported — still never a torn in-place write. */
  private def publishSmallFile(dest: Path, content: String): Unit = {
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val fc =
      try Some(org.apache.hadoop.fs.FileContext.getFileContext(
        dest.toUri, conf))
      catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        None }
    fc match {
      case Some(c) =>
        c.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      case None =>
        if (fs.exists(dest)) fs.delete(dest, false)
        if (!fs.rename(tmp, dest))
          throw new java.io.IOException(s"publish failed: $tmp -> $dest")
    }
  }

  /** Schema evolution: ADD COLUMN appends a nullable column to the catalog
    * record; existing gpx files stay untouched and read as nulls for the
    * new column (tolerantSchemaEvolution, PixelsReaderOption.java:34,126). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tablePath(ident)
    val ddlFile = new Path(dir, "_schema.ddl")
    if (!fs.exists(ddlFile)) throw new NoSuchTableException(ident)
    // serialized against DML and other ALTERs: spec rewrites + _renames +
    // artifact drops + the ddl write are several files — a concurrent
    // INSERT reading specs mid-alter would see a half-applied layout.
    // (A crash mid-alter can still leave sidecars ahead of the ddl — the
    // lock bounds live interleavings, not crash atomicity.)
    GpxMutationLock.withLock(dir.toString, conf, s"ALTER TABLE $ident") {
    val in = fs.open(ddlFile)
    val ddl = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    var schema = StructType.fromDDL(ddl)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "gpx supports only top-level ADD COLUMN")
        require(add.isNullable,
          "added columns must be nullable (existing files read them as null)")
        require(GpxFormat.supported(add.dataType()),
          s"unsupported gpx type ${add.dataType()}")
        // a re-added name would resurface stale bytes from files that
        // still physically carry it — either a DROPPED column's bytes or
        // a RENAMED-AWAY physical alias (physNameOf resolves by the
        // file's own names, so pre-rename files would serve the old
        // column's data under the re-added name) — refuse both
        val addName = add.fieldNames().head
        require(!droppedNames(dir).contains(addName),
          s"column name $addName was previously dropped; " +
            "existing files still carry its old data — use a fresh name")
        require(!GpxTable.readRenames(dir.toString, conf)
            .values.flatten.toSet.contains(addName),
          s"column name $addName is a renamed-away physical name; " +
            "existing files still carry the renamed column's data under " +
            "it — use a fresh name")
        schema = schema.add(addName, add.dataType(), nullable = true)
      // DROP COLUMN: catalog-record-only (tolerant evolution) — existing
      // files keep the bytes, scans simply never request the name again.
      // Refused while a layout/index references the column: silently
      // breaking the table's routing metadata would brick later INSERTs.
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "gpx supports only top-level DROP COLUMN")
        val name = del.fieldNames().head
        require(schema.fieldNames.contains(name), s"no column $name")
        val refs = layoutRefs(dir)
        require(!refs.contains(name),
          s"column $name is referenced by a sort/bucket/range layout or " +
            "index; drop that first")
        schema = StructType(schema.filterNot(_.name == name))
        // tombstone the CURRENT name and every physical alias it rode
        // under (a rename-then-drop leaves files carrying the old
        // physical name — re-adding that alias would resurrect them)
        val aliasChain = GpxTable.readRenames(dir.toString, conf)
        val tombstones = (droppedNames(dir) + name ++
          aliasChain.getOrElse(name, Seq.empty)).toSeq.sorted
        val dout = fs.create(new Path(dir, "_dropped"), true)
        try dout.write(tombstones.mkString("\n").getBytes("UTF-8"))
        finally dout.close()
        // the alias entry served the dropped name; retire it
        if (aliasChain.contains(name))
          GpxTable.writeRenames(dir.toString, aliasChain - name, conf)
        // projections storing the dropped column can never be rebuilt
        // (their selectExpr would reference a gone column — autoRefresh
        // would then swallow the failure and leak a permanently-stale
        // copy) — drop them now, mirroring the RENAME branch
        GpxProjection.listProjections(dir.toString, conf).foreach { pn =>
          if (GpxProjection.readManifest(dir.toString, pn, conf)
              .exists(_.columns.contains(name)))
            GpxProjection.drop(dir.toString, pn, conf)
        }
      // RENAME COLUMN: the catalog record renames; existing FILES keep the
      // old physical name, so the table's `_renames` sidecar records the
      // alias chain and scans resolve requested names through it
      // (per-file, planning time). Layout spec files referencing the old
      // name are rewritten; point indexes keyed by the old name are
      // dropped (their dir name no longer matches any lookup).
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames().length == 1,
          "gpx supports only top-level RENAME COLUMN")
        val from = ren.fieldNames().head
        val to = ren.newName()
        require(schema.fieldNames.contains(from), s"no column $from")
        require(!schema.fieldNames.contains(to), s"column $to already exists")
        val aliases = GpxTable.readRenames(dir.toString, conf)
        // the new name must not collide with any HISTORICAL physical name
        // (dropped or renamed-away): files still carrying it would serve
        // their stale bytes under the new catalog name
        val historical = droppedNames(dir) ++ aliases.values.flatten
        require(!historical.contains(to),
          s"column name $to was used before (dropped or renamed away); " +
            "existing files still carry its old data — use a fresh name")
        schema = StructType(schema.map(f =>
          if (f.name == from) f.copy(name = to) else f))
        val chain = to +: (from +: aliases.getOrElse(from, Seq.empty))
        val updated = (aliases - from) + (to -> chain.tail)
        GpxTable.writeRenames(dir.toString, updated, conf)
        renameInSpec(dir, "_sortspec", from, to)
        renameInSpec(dir, "_bucketspec", from, to)
        renameInSpec(dir, "_rangespec", from, to)
        val idxRoot = new Path(dir, "_index")
        if (fs.exists(idxRoot))
          fs.listStatus(idxRoot).map(_.getPath)
            .filter(_.getName.split("__").contains(from))
            .foreach(p => fs.delete(p, true))
        // projections storing the old column name can never cover a query
        // again (covering() matches requested names) — drop, don't leak
        GpxProjection.listProjections(dir.toString, conf).foreach { pn =>
          if (GpxProjection.readManifest(dir.toString, pn, conf)
              .exists(_.columns.contains(from)))
            GpxProjection.drop(dir.toString, pn, conf)
        }
      // ALTER TABLE ... SET TBLPROPERTIES('sort_by'='c1,c2'): turn on (or
      // change) the ordered layout for an EXISTING table — existing files
      // keep their order; subsequent INSERTs sort. UNSET removes it.
      case set: TableChange.SetProperty if set.property == "sort_by" =>
        val cols = set.value.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        cols.foreach(c => require(schema.fieldNames.contains(c),
          s"sort_by column $c not in schema"))
        val sout = fs.create(new Path(dir, "_sortspec"), true)
        try sout.write(cols.mkString("\n").getBytes("UTF-8"))
        finally sout.close()
      case unset: TableChange.RemoveProperty if unset.property == "sort_by" =>
        fs.delete(new Path(dir, "_sortspec"), false)
      // ALTER TABLE t SET TBLPROPERTIES('projection.<name>'='c1,c2'):
      // materialize a column-subset projection layout (reference
      // Projections.java) and route covered scans to it; UNSET drops it.
      // The build runs as a Spark job on the active session.
      case set: TableChange.SetProperty
          if set.property.startsWith("projection.") =>
        val pname = set.property.stripPrefix("projection.")
        require(pname.nonEmpty && pname.matches("[A-Za-z0-9_]+"),
          s"bad projection name '$pname'")
        val cols = set.value.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        GpxProjection.build(org.apache.spark.sql.SparkSession.active,
          dir.toString, pname, cols)
      case unset: TableChange.RemoveProperty
          if unset.property.startsWith("projection.") =>
        GpxProjection.drop(dir.toString,
          unset.property.stripPrefix("projection."), conf)
      // ALTER TABLE t SET TBLPROPERTIES('index'='c1[,c2]'): build (or
      // rebuild) the point index on the given key column(s) — the DDL
      // face of GpxPointIndex (reference: index as first-class catalog
      // metadata, KeyColumns.java). Staleness is self-managed: validity
      // is the table's layout-version token (GpxVersion) and lookups
      // fall back to scans when it moved; GpxPointIndex.refresh (or
      // spark.graft.gpx.indexAutoRefresh=true) re-serves after appends
      // by indexing only the new files.
      case set: TableChange.SetProperty if set.property == "index" =>
        val cols = set.value.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        require(cols.nonEmpty, "index needs at least one column")
        cols.foreach(c => require(schema.fieldNames.contains(c),
          s"index column $c not in schema"))
        val sp = org.apache.spark.sql.SparkSession.active
        if (cols.length == 1)
          GpxPointIndex.build(sp, dir.toString, cols.head)
        else GpxPointIndex.buildCompound(sp, dir.toString, cols)
      case unset: TableChange.RemoveProperty if unset.property == "index" =>
        // drops EVERY index of the table (single and compound live under
        // _index/<cols>)
        fs.delete(new Path(dir, "_index"), true)
      case other =>
        throw new UnsupportedOperationException(s"alterTable: $other")
    }
    // atomic ddl publish: OVERWRITE rename onto the live record — the
    // previous delete-then-rename left a window (crash between the two)
    // with NO _schema.ddl at all, i.e. a destroyed catalog record and
    // spurious NoSuchTableException for concurrent readers
    publishSmallFile(ddlFile, schema.toDDL)
    new GpxTable(schema, Seq(dir.toString), catalogManaged = true)
    } // mutation lock
  }

  /** names of previously dropped columns (ADD COLUMN tombstones) */
  private def droppedNames(dir: Path): Set[String] = {
    val p = new Path(dir, "_dropped")
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** every column name referenced by the table's layout metadata */
  private def layoutRefs(dir: Path): Set[String] = {
    def firstLine(name: String): Option[String] = {
      val p = new Path(dir, name)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().nextOption()
        finally in.close()
      }
    }
    val specs = Seq("_bucketspec", "_rangespec").flatMap(firstLine).toSet
    val sorts: Set[String] = {
      val p = new Path(dir, "_sortspec")
      if (!fs.exists(p)) Set.empty
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toSet
        finally in.close()
      }
    }
    val idx: Set[String] = {
      val p = new Path(dir, "_index")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).flatMap(_.getPath.getName.split("__")).toSet
    }
    specs ++ sorts ++ idx
  }

  /** rewrite `from` -> `to` wherever a spec file names the column */
  private def renameInSpec(dir: Path, name: String, from: String, to: String): Unit = {
    val p = new Path(dir, name)
    if (!fs.exists(p)) return
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = txt.split("\n", -1)
    val out = lines.map(l => if (l.trim == from) l.replace(from, to) else l)
    if (!out.sameElements(lines)) {
      val o = fs.create(p, true)
      try o.write(out.mkString("\n").getBytes("UTF-8")) finally o.close()
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    // txn fates this table hosts must outlive its dir: re-home them to
    // each member first, or a committed cross-table txn would later be
    // abort-claimed at the dangling fate URI
    GpxCommitLog.sealHostedFates(tablePath(ident).toString, conf)
    // a table recreated at this path must re-probe its protocol/manifests,
    // and a buffered MemTable tail must not outlive its table
    GpxCommitLog.invalidateCaches(tablePath(ident).toString)
    GpxMemTable.clear(tablePath(ident).toString)
    tableExists(ident) && fs.delete(tablePath(ident), true)
  }

  override def renameTable(old: Identifier, next: Identifier): Unit = {
    if (!tableExists(old)) throw new NoSuchTableException(old)
    if (tableExists(next)) throw new TableAlreadyExistsException(next)
    fs.mkdirs(nsPath(next.namespace()))
    // same fate re-homing as dropTable (the URI records the OLD path),
    // and a buffered MemTable tail must not leak into a table later
    // created at the vacated path
    GpxCommitLog.sealHostedFates(tablePath(old).toString, conf)
    GpxMemTable.clear(tablePath(old).toString)
    GpxCommitLog.invalidateCaches(tablePath(old).toString)
    GpxCommitLog.invalidateCaches(tablePath(next).toString)
    if (!fs.rename(tablePath(old), tablePath(next)))
      throw new java.io.IOException(
        s"ALTER TABLE RENAME: filesystem refused ${tablePath(old)} -> " +
          s"${tablePath(next)} — the table still lives at the old path")
  }

  // ---- functions (storage-partitioned joins need the bucket function
  // resolvable from the table's catalog) ----
  override def listFunctions(ns: Array[String]): Array[Identifier] =
    Array(Identifier.of(ns, "bucket"))

  override def loadFunction(ident: Identifier): functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GpxBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def functionExists(ident: Identifier): Boolean =
    ident.name().equalsIgnoreCase("bucket")
}
