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
    val bucket = bucketSpecOf(partitions, schema)
    val provider = Option(properties.get(TableCatalog.PROP_PROVIDER))
    require(provider.forall(_.equalsIgnoreCase("gpx")),
      s"graft catalog only stores gpx tables, got $provider")
    require(schema.fields.forall(f => GpxFormat.supported(f.dataType)),
      s"unsupported gpx schema: $schema")
    val dir = tablePath(ident)
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, "_schema.ddl"), true)
    try out.write(schema.toDDL.getBytes("UTF-8")) finally out.close()
    // bind to the warehouse commit-timestamp oracle: every table of this
    // catalog stamps from ONE monotone counter, so a single GpxTxn token
    // is a consistent cross-table snapshot (transaction.proto:33-48 analog)
    GpxTxn.bind(dir.toString, warehouse.toString, conf)
    bucket.foreach { b =>
      val bout = fs.create(new Path(dir, "_bucketspec"), true)
      try bout.write(s"${b.column}\n${b.numBuckets}".getBytes("UTF-8"))
      finally bout.close()
    }
    // TBLPROPERTIES('sort_by'='c1,c2') -> ordered layout: INSERTs sort
    // within partitions on these columns so zone maps stay selective
    // (the reference's ordered table path, proto/pixels.proto layouts)
    Option(properties.get("sort_by")).foreach { sb =>
      val cols = sb.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      cols.foreach(c => require(schema.fieldNames.contains(c),
        s"sort_by column $c not in schema"))
      val sout = fs.create(new Path(dir, "_sortspec"), true)
      try sout.write(cols.mkString("\n").getBytes("UTF-8"))
      finally sout.close()
    }
    // TBLPROPERTIES('range_by'='col:b1,b2,...') -> range-partitioned
    // layout: INSERTs route rows to per-range files by the declared split
    // points, scans prune by range id from file names alone (reference
    // Range.java / RangeIndex.java catalog-level range assignment)
    Option(properties.get("range_by")).foreach { rb =>
      // validate EVERYTHING here — a bad spec persisted verbatim would
      // brick every later scan/INSERT of an otherwise-created table
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
      val rout = fs.create(new Path(dir, "_rangespec"), true)
      try rout.write(s"$col\n${bounds.mkString(",")}".getBytes("UTF-8"))
      finally rout.close()
    }
    new GpxTable(schema, Seq(dir.toString), catalogManaged = true)
  }

  /** Schema evolution: ADD COLUMN appends a nullable column to the catalog
    * record; existing gpx files stay untouched and read as nulls for the
    * new column (tolerantSchemaEvolution, PixelsReaderOption.java:34,126). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tablePath(ident)
    val ddlFile = new Path(dir, "_schema.ddl")
    if (!fs.exists(ddlFile)) throw new NoSuchTableException(ident)
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
        schema = schema.add(add.fieldNames().head, add.dataType(), nullable = true)
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
    val out = fs.create(ddlFile, true)
    try out.write(schema.toDDL.getBytes("UTF-8")) finally out.close()
    new GpxTable(schema, Seq(dir.toString), catalogManaged = true)
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(tablePath(ident), true)

  override def renameTable(old: Identifier, next: Identifier): Unit = {
    if (!tableExists(old)) throw new NoSuchTableException(old)
    if (tableExists(next)) throw new TableAlreadyExistsException(next)
    fs.mkdirs(nsPath(next.namespace()))
    fs.rename(tablePath(old), tablePath(next))
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
