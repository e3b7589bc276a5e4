package graft.format

import GpxFormat._
import GpxFileReader.PixelSlice
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import java.util
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** DataSource V2 for the gpx columnar format:
  * `spark.read.format("gpx").load(dir)` / `df.write.format("gpx").save(dir)`.
  *
  * Read path: one SELF-CONTAINED input partition per (file, row group) that
  * survives zone-map pruning — the split carries the byte ranges of every
  * kept pixel segment, so executors seek straight to data and NEVER read a
  * footer (footers are parsed once on the driver through a (len, mtime)-
  * validated cache — the metadata-service role, proto/metadata.proto:33-45).
  * Pruning happens at three granularities: bucket (file), row group (chunk
  * stats), pixel (sub-row-group stats, proto/pixels.proto:30-34), with
  * column pruning (SupportsPushDownRequiredColumns) and filter pushdown
  * (SupportsPushDownFilters). Filters are RE-APPLIED by Spark above the
  * scan (we never claim them as fully handled), so pushdown is purely an
  * I/O reduction — exactly the reference's scan/filter split
  * (Scanner.java:36-93).
  *
  * MVCC: row groups carry the writer's `option("commitTs", t)`;
  * `option("snapshotTs", t)` reads only row groups committed at or before
  * t, and `option("exposeCommitTs", true)` surfaces the hidden `_commit_ts`
  * column (PixelsReaderOption.java:37-39 analog).
  */
class GpxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gpx"

  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    // DataFrameReader.load(p1, p2, ...) JSON-encodes the list under
    // "paths"; a comma list is also accepted for hand-built options
    def parse(s: String): Seq[String] =
      if (s.trim.startsWith("[")) {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        m.readValue(s, classOf[Array[String]]).toSeq
      } else s.split(",").toSeq
    Option(options.get("path")).toSeq ++
      Option(options.get("paths")).toSeq.flatMap(parse)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = new Configuration()
    // commit-log tables: the manifest carries the committed union schema —
    // schema resolution is one (cached) manifest read, not an O(files)
    // footer walk
    val logSchema = paths(options) match {
      case Seq(r) if GpxCommitLog.isLogTable(r, conf) =>
        GpxCommitLog.head(r, conf).flatMap(_.schema)
      case _ => None
    }
    // a just-enabled table can hold queryable rows ONLY in its memtable
    // tail (no committed schema, no files yet) — its bound schema is the
    // table schema then
    val memSchema = logSchema.orElse(paths(options) match {
      case Seq(r) => GpxMemTable.boundSchema(r)
      case _ => None
    })
    val base = memSchema.getOrElse {
      val files = GpxTable.listFiles(paths(options), conf)
      require(files.nonEmpty, s"no gpx files under ${paths(options)}")
      // tolerant schema evolution (PixelsReaderOption.tolerantSchemaEvolution
      // analog): the table schema is the by-name union across files in sorted
      // order — see GpxTable.unionSchemas for the widening/nullability rules.
      val footers = files.sorted.map(GpxFileReader.FooterCache.get(_, conf))
      val union = footers.map(_.schema).reduce(GpxTable.unionSchemas)
      // footer-proven element non-nullness: when EVERY file claims a
      // VECTOR column holds no null elements, report containsNull=false —
      // the vector kernels' static null-gate (VectorKernels.elemsNullable)
      // then elides the per-element scan on the serve paths. Intersection
      // across files, so one file with (or predating) no claim keeps the
      // column conservatively nullable. Log/memtable tables skip this
      // (their schema comes from the manifest, not an O(files) footer walk).
      val claims = footers.map(_.noNullElemCols.toSet).reduce(_ intersect _)
      if (claims.isEmpty) union
      else StructType(union.map {
        case f @ StructField(_, ArrayType(et, true), _, _)
            if claims.contains(f.name) =>
          f.copy(dataType = ArrayType(et, containsNull = false))
        case f => f
      }.toArray)
    }
    if (options.getBoolean("exposeCommitTs", false))
      base.add(StructField(GpxTable.CommitTsCol, LongType, nullable = false))
    else base
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GpxTable(schema,
      paths(new CaseInsensitiveStringMap(properties)))
}

object GpxTable {
  /** hidden MVCC column exposed via option("exposeCommitTs", true) */
  val CommitTsCol = "_commit_ts"

  /** source-file metadata column (split-constant, zero I/O) */
  val FileCol = "_file"

  /** absolute row position within the source file (0-based over every row
    * of every row group in footer order) — the row half of the (file, pos)
    * row id that merge-on-read delete bitmaps and delta writes key on;
    * enumerated from split metadata, zero I/O */
  val PosCol = "_pos"

  /** synthetic columns never present in file footers */
  def isSynthetic(name: String): Boolean =
    name == CommitTsCol || name == FileCol || name == PosCol

  def listFiles(roots: Seq[String], conf: Configuration): Seq[String] =
    roots.flatMap { r =>
      // commit-log tables: the manifest head — NOT the listing — is the
      // table (GpxCommitLog). Staged, orphaned and retired files share the
      // directory with live ones by design; only the log says which is
      // which. EXPLICIT-FILE roots bypass the manifest on purpose: the
      // internal mutation reads (COW delete re-reading exactly its
      // affected files) pick their file sets from an already-resolved
      // table listing and must read those files, not the whole table.
      if (!r.endsWith(".gpx") && GpxCommitLog.isLogTable(r, conf))
        GpxCommitLog.liveFiles(r, conf)
      else GpxFs.stat(r, conf) match {
        case None => Seq.empty
        case Some(st) if st.isFile => Seq(new Path(r).toString)
        case Some(_) =>
          // recursive: nested layouts (e.g. per-day subdirs) must not
          // silently read empty. Hadoop-convention hidden entries (path
          // segments under the root starting with '_' or '.') are metadata
          // sidecars — e.g. the _index point-index tables — never data.
          val qroot = qualifiedRoot(r, conf)
          GpxFs.listRecursive(r, conf).collect {
            case (full, isFile)
                if isFile && full.endsWith(".gpx") && {
                  val rel =
                    if (full.startsWith(qroot)) full.drop(qroot.length).stripPrefix("/")
                    else full
                  !rel.split('/').exists(seg =>
                    seg.startsWith("_") || seg.startsWith("."))
                } =>
              full
          }
      }
    }

  /** root qualified with its filesystem scheme — the canonical prefix that
    * index entries' relative paths are resolved against */
  def qualifiedRoot(root: String, conf: Configuration): String = {
    val p = new Path(root)
    p.getFileSystem(conf).makeQualified(p).toString
  }

  /** Bucket layout sidecar (reference: hash-partitioned files,
    * PixelsWriterImpl.addRowBatch(batch, hashValue) + partitioned flag in
    * the PostScript). Format: "<column>\n<numBuckets>". */
  case class BucketSpec(column: String, numBuckets: Int)

  def readBucketSpec(root: String, conf: Configuration): Option[BucketSpec] = {
    // commit-log tables carry their layout specs IN the manifest: spec and
    // file set always change together atomically (a sidecar updated apart
    // from its files could mis-prune during an overwrite on a store with
    // non-atomic replace)
    if (GpxCommitLog.isLogTable(root, conf))
      return GpxCommitLog.head(root, conf).flatMap(_.bucket)
    val p = new Path(root, "_bucketspec")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val Array(c, n) = txt.trim.split("\n")
      Some(BucketSpec(c, n.toInt))
    }
  }

  /** Sort-clustering sidecar (reference: the ORDERED layout path —
    * pixels keeps an ordered and a compact path per table and its layout
    * optimizer picks the write order; proto/pixels.proto layout fields).
    * Data written under this spec is sorted WITHIN each task partition
    * (no extra shuffle), which is what makes the per-row-group and
    * per-pixel zone maps selective on the sort column at any scale.
    * Format: one column name per line. */
  def readSortSpec(root: String, conf: Configuration): Seq[String] = {
    if (GpxCommitLog.isLogTable(root, conf))
      return GpxCommitLog.head(root, conf).map(_.sort).getOrElse(Seq.empty)
    val p = new Path(root, "_sortspec")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.trim.split("\n").toSeq.filter(_.nonEmpty)
    }
  }

  /** Column-cardinality sidecar written by [[GpxMaintenance.analyze]]
    * (the reference's STAT command path: collected cardinalities land in
    * metadata and feed PlanOptimizer selectivity). Served ONLY while the
    * stamped validity proof still holds — a version token match for
    * token-disciplined tables, an exact listing-digest match
    * (`listing:<sha>`) for token-less ones — so stats that went stale
    * under a mutation are dropped, never silently wrong. A corrupt or
    * hand-edited sidecar degrades to no stats (planning must never crash
    * on a malformed sidecar). Format: stamp line, row-count line, then
    * "<urlenc-name>\t<ndv>". */
  def readColStats(root: String, conf: Configuration): Map[String, Long] = {
    val p = new Path(root, "_colstats")
    try {
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return Map.empty
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.split("\n").toSeq.filter(_.nonEmpty) match {
        case stamp +: _ +: cols if statsStampValid(root, stamp.trim, conf) =>
          cols.flatMap { line =>
            line.split("\t", 2) match {
              case Array(n, v) =>
                try Some(java.net.URLDecoder.decode(n, "UTF-8") -> v.trim.toLong)
                catch { case scala.util.control.NonFatal(_) => None }
              case _ => None
            }
          }.toMap
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** `listing:`-prefixed stamps revalidate by recomputing the exact
    * listing digest (token-less tables must not be opted into token-gated
    * validity — an external writer never bumps tokens, so a seeded token
    * would serve stale stats forever). Plain stamps compare to the
    * current version token. */
  private def statsStampValid(root: String, stamp: String,
      conf: Configuration): Boolean =
    if (stamp.startsWith("listing:"))
      stamp.stripPrefix("listing:") == GpxVersion.listingDigest(root, conf)
    else GpxVersion.current(root, conf).contains(stamp)

  /** Range-layout sidecar (reference: catalog-level key-range assignment
    * per file set, pixels-common metadata/domain/Range.java +
    * RangeIndex.java — ingest-time routing by key range, not just
    * post-hoc zone maps). `bounds` are ascending split points over the
    * long-backed key: range id = number of bounds <= key, so N bounds
    * define N+1 ranges. Format: "<column>\n<b1>,<b2>,...". */
  case class RangeSpec(column: String, bounds: Seq[Long]) {
    require(bounds.nonEmpty && bounds == bounds.sorted, s"bad bounds $bounds")
  }

  def readRangeSpec(root: String, conf: Configuration): Option[RangeSpec] = {
    if (GpxCommitLog.isLogTable(root, conf))
      return GpxCommitLog.head(root, conf).flatMap(_.range)
    val p = new Path(root, "_rangespec")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val Array(c, bs) = txt.trim.split("\n")
      Some(RangeSpec(c, bs.split(",").toSeq.map(_.trim.toLong)))
    }
  }

  /** Rename-alias sidecar (tolerant schema evolution, the RENAME COLUMN
    * half: PixelsReaderOption.java:34,126 analog): existing files keep
    * the old PHYSICAL column name; `_renames` maps each current catalog
    * name to its older aliases (newest first), and scan planning resolves
    * a requested name to whichever alias the file actually carries.
    * Format: one line per renamed column, "current|older1|older2". */
  def readRenames(root: String, conf: Configuration): Map[String, Seq[String]] = {
    val dir = { val p = new Path(root)
      if (root.endsWith(".gpx")) p.getParent else p }
    val p = new Path(dir, "_renames")
    try {
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Map.empty
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        txt.split("\n").toSeq.map(_.trim).filter(_.contains('|')).map { l =>
          val parts = l.split('|').toSeq
          parts.head -> parts.tail.filter(_.nonEmpty)
        }.toMap
      }
    } catch { case _: Throwable => Map.empty }
  }

  def writeRenames(root: String, m: Map[String, Seq[String]],
      conf: Configuration): Unit = {
    val p = new Path(root, "_renames")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(m.toSeq.sortBy(_._1)
      .map { case (cur, olds) => (cur +: olds).mkString("|") }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** resolve a requested catalog column to the name `phys` (a file's own
    * schema) actually carries: itself, or the newest alias present */
  def physNameOf(phys: StructType, name: String,
      renames: Map[String, Seq[String]]): String =
    if (renames.isEmpty || phys.fieldNames.contains(name)) name
    else renames.getOrElse(name, Seq.empty)
      .find(phys.fieldNames.contains).getOrElse(name)

  /** range id for a key: first range whose upper bound exceeds it (nulls
    * route to range 0 — value predicates never prune them incorrectly
    * because IsNull filters claim no range pruning) */
  def rangeOf(key: Long, bounds: Seq[Long]): Int = {
    var i = 0
    while (i < bounds.length && key >= bounds(i)) i += 1
    i
  }

  /** range id extracted from a range-routed file name part-*-rN.gpx */
  def rangeOfFile(path: String): Option[Int] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    "-r(\\d+)\\.gpx$".r.findFirstMatchIn(name).map(_.group(1).toInt)
  }

  /** engine-portable bucket id for a long key (documented hash; the same
    * function routes writes and prunes reads) */
  def bucketOf(key: Long, n: Int): Int = {
    val h = java.lang.Long.hashCode(key * -7046029254386353131L)
    ((h % n) + n) % n
  }

  /** Route id of one row under the table's bucket-or-range layout
    * (-1 = unrouted): THE single row→route function — every writing path
    * (INSERT, delta insert, COW replace) must route through here or the
    * layouts silently drift apart (null keys route to 0L in both
    * layouts, matching the read-side pruning contract). `keyIdx`/`keyDt`
    * are the pre-resolved routing column's ordinal and type in the
    * record layout. */
  def routeOfRow(record: org.apache.spark.sql.catalyst.InternalRow,
      keyIdx: Option[Int], keyDt: Option[DataType],
      bucket: Option[BucketSpec], range: Option[RangeSpec]): Int =
    keyIdx match {
      case None => -1
      case Some(ki) =>
        val key: Long =
          if (record.isNullAt(ki)) 0L
          else keyDt.get match {
            case LongType => record.getLong(ki)
            case IntegerType | DateType => record.getInt(ki).toLong
            case ShortType => record.getShort(ki).toLong
            case ByteType => record.getByte(ki).toLong
            case other =>
              throw new IllegalArgumentException(s"bucketBy $other unsupported")
          }
        range match {
          case Some(r) => rangeOf(key, r.bounds)
          case None => bucketOf(key, bucket.get.numBuckets)
        }
    }

  /** bucket id extracted from a bucketed file name part-*-bN.gpx */
  def bucketOfFile(path: String): Option[Int] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val m = "-b(\\d+)\\.gpx$".r.findFirstMatchIn(name)
    m.map(_.group(1).toInt)
  }

  /** types the bucketed writer can route on (integer family) */
  def bucketableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | ShortType | ByteType => true
    case _ => false
  }

  /** By-name union of two evolved file schemas. A column absent from
    * either side is null-filled at read time, so it must come out nullable
    * no matter which file contributed it — otherwise Catalyst could
    * eliminate IsNotNull filters against rows that are in fact null.
    * Type widening (tolerantSchemaEvolution's compatible-widening half,
    * PixelsReaderOption.java:34,126) is safe exactly within the
    * long-backed integer family (and same-scale narrow decimals) because
    * gpx stores every such value as a long — the physical bytes are
    * identical whichever logical width the footer declares. Associative,
    * so folding over any file order yields the same table schema. */
  def unionSchemas(a: StructType, b: StructType): StructType = {
    def rank(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 3; case LongType => 4
      case _ => 0
    }
    def widen(x: DataType, y: DataType): Option[DataType] =
      if (x == y) Some(x)
      else (x, y) match {
        case _ if rank(x) > 0 && rank(y) > 0 =>
          Some(if (rank(x) >= rank(y)) x else y)
        case (p: DecimalType, q: DecimalType)
            if p.scale == q.scale && p.precision <= 18 && q.precision <= 18 =>
          Some(if (p.precision >= q.precision) p else q)
        // arrays differing only in element nullability: a file with null
        // elements forces containsNull on the union (OR semantics)
        case (ArrayType(e1, n1), ArrayType(e2, n2)) if e1 == e2 =>
          Some(ArrayType(e1, n1 || n2))
        case _ => None
      }
    val aNames = a.fieldNames.toSet
    val fromA = a.map { f =>
      b.find(_.name == f.name) match {
        case None => f.copy(nullable = true)
        case Some(g) =>
          val w = widen(f.dataType, g.dataType).getOrElse(throw
            new IllegalArgumentException(
              s"column ${f.name} has incompatible types: ${f.dataType} vs ${g.dataType}"))
          f.copy(dataType = w, nullable = f.nullable || g.nullable)
      }
    }
    val fromB = b.filterNot(f => aNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType((fromA ++ fromB).toArray)
  }
}

class GpxTable(schema: StructType, roots: Seq[String],
    catalogManaged: Boolean = false,
    defaultSnapshotTs: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite
  with SupportsMetadataColumns with SupportsDelete
  with SupportsRowLevelOperations {

  override def name(): String = s"gpx:${roots.mkString(",")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava

  /** `_commit_ts` / `_file` as DSv2 metadata columns: they resolve in SQL
    * without read options (the option form stays for path-based reads).
    * `_commit_ts` is the reference's hidden version column analog
    * (proto/pixels.proto:66-69); `_file` is the group column that lets
    * Spark runtime-group-filter copy-on-write UPDATE/MERGE scans down to
    * the files that actually contain matches. Both are served as
    * per-split constants — zero I/O. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    // nullable: in a MERGE's NOT-MATCHED insert branch the metadata
    // attributes are null-filled (the inserted row has no source file)
    new MetadataColumn {
      override def name(): String = GpxTable.CommitTsCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = true
      override def comment(): String = "MVCC commit timestamp of the row group"
    },
    // _file/_pos are declared NON-nullable: they are the delta operations'
    // row id, and Spark refuses nullable row-id attributes. The COW MERGE
    // insert branch still null-FILLS them at runtime (physical rows can
    // carry null regardless of the declaration); every consumer checks
    // isNullAt before reading, and DML plans never filter on them, so the
    // declaration is safe there.
    new MetadataColumn {
      override def name(): String = GpxTable.FileCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "gpx file the row came from"
    },
    new MetadataColumn {
      override def name(): String = GpxTable.PosCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "absolute row position within the source file"
    })

  /** SQL DELETE (retina delete path, proto/retina.proto:34-50 analog):
    * zone maps pick the files that MAY hold matching rows; only those are
    * rewritten without the matching rows (the reference applies deletes by
    * rewriting visibility; gpx compacts the history instead — a deleted
    * row is gone from earlier snapshots too, which is the documented
    * difference). Untouched files keep their bytes and their commitTs. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(GpxDelete.translatable)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    // a buffered memtable tail is invisible to the file-granular delete:
    // flush it into committed files first so the predicate applies to
    // those rows too (they are queryable, so they must be deletable)
    roots.foreach { r =>
      if (GpxMemTable.buffered(r) > 0)
        GpxMemTable.flush(r, new Configuration())
    }
    GpxDelete.run(schema, roots, filters, catalogManaged)
  }

  /** SQL UPDATE / MERGE INTO (and subquery deletes): group-based
    * copy-on-write by default ([[GpxRowLevelOperation]] — rewrite the
    * touched files), or the DELTA merge-on-read path
    * ([[GpxDeltaOperation]] — bitmap-delete + append, the reference's
    * retina model) with `spark.graft.gpx.rowLevelMode=mor`. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    // same contract as deleteWhere: queryable tail rows must be visible
    // to UPDATE/MERGE/DELETE — flush them into files the operation scans
    roots.foreach { r =>
      if (GpxMemTable.buffered(r) > 0)
        GpxMemTable.flush(r, new Configuration())
    }
    val dataSchema =
      StructType(schema.filterNot(f => GpxTable.isSynthetic(f.name)))
    // UPDATE/MERGE over a multi-path load has no defined home for
    // rewritten or inserted rows (the replace write would migrate every
    // survivor into the first root, under the first root's layout specs,
    // and the sidecar fingerprint would cover only the first root) —
    // refuse rather than silently relocate rows between roots
    require(roots.size == 1,
      "gpx: UPDATE/MERGE require a single-root table; a multi-path load " +
        s"is a read-only view (got ${roots.size} roots)")
    val mode = org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.gpx.rowLevelMode").getOrElse("cow")
    // commit-log tables always take the copy-on-write path: the delta
    // (bitmap + append) publish is listing-visible per file, which the
    // log protocol's atomicity story explicitly excludes (GpxDelete doc)
    if (mode == "mor" &&
      !roots.headOption.exists(GpxCommitLog.isLogTable(_, new Configuration())))
      () => new GpxDeltaOperation(dataSchema, roots, catalogManaged, info.command())
    else
      new GpxRowLevelOperationBuilder(dataSchema, roots, catalogManaged, info)
  }

  /** Bucketed layouts advertise their bucket transform; with GpxCatalog's
    * FunctionCatalog resolving `bucket`, equi-joins on the bucket key
    * become storage-partitioned joins — zero Exchange. */
  override def partitioning(): Array[Transform] =
    roots.headOption
      .flatMap(GpxTable.readBucketSpec(_, new Configuration()))
      .map(b => Array[Transform](
        org.apache.spark.sql.connector.expressions.Expressions.bucket(
          b.numBuckets, b.column)))
      .getOrElse(Array.empty)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Snapshot precedence: explicit per-read snapshotTs, then the
    // cross-table asOfToken (per-read option or session conf — one
    // GpxTxn.currentToken value pins EVERY gpx table of a query to the
    // same warehouse-consistent snapshot, the analog of the reference's
    // per-query transaction timestamp, proto/transaction.proto:33-48),
    // then SQL time travel (FOR TIMESTAMP/VERSION AS OF).
    val sessionToken =
      try org.apache.spark.sql.SparkSession.active.conf
        .getOption("spark.graft.gpx.asOfToken").map(_.toLong)
      catch { case _: Throwable => None }
    val snapshotTs = Option(options.get("snapshotTs")).map(_.toLong)
      .orElse(Option(options.get("asOfToken")).map(_.toLong))
      .orElse(defaultSnapshotTs)
      .orElse(sessionToken)
    // commit-log version pin: read exactly the file set manifest version N
    // named (time travel by manifest version — retired files must still be
    // on disk, i.e. not vacuumed past N)
    val logVersion = Option(options.get("atVersion")).map(_.toLong)
    new GpxScanBuilder(schema, roots, snapshotTs, logVersion = logVersion)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val rgRows = Option(info.options.get("rowGroupRows"))
      .map(_.toInt).getOrElse(GpxFormat.DefaultRowGroupRows)
    val pxRows = Option(info.options.get("pixelRows"))
      .map(_.toInt).getOrElse(GpxFormat.DefaultPixelRows)
    // catalog tables auto-stamp commits in epoch micros so SQL time travel
    // (FOR TIMESTAMP AS OF) works without writer options; path-based
    // writes keep the explicit-option contract (-1 = always visible)
    val commitTs = Option(info.options.get("commitTs"))
      .map(_.toLong)
      .getOrElse(if (catalogManaged)
        GpxTxn.stamp(roots.head, new Configuration()) else -1L)
    val optBucket = for {
      c <- Option(info.options.get("bucketBy"))
      n <- Option(info.options.get("numBuckets"))
    } yield GpxTable.BucketSpec(c, n.toInt)
    // catalog tables created PARTITIONED BY (bucket(n, col)) keep their
    // layout across INSERTs: the _bucketspec sidecar is the table's
    // metadata, not a per-write option (path-based writes stay opt-in)
    val bucket = optBucket.orElse {
      if (catalogManaged)
        roots.headOption.flatMap(
          GpxTable.readBucketSpec(_, new Configuration()))
      else None
    }
    // sort clustering: per-write option, or the table's persisted layout
    val sortBy = Option(info.options.get("sortBy"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(roots.headOption
        .map(GpxTable.readSortSpec(_, new Configuration()))
        .getOrElse(Seq.empty))
    // range layout: per-write option, or (catalog tables) the persisted
    // _rangespec — ingest-time key-range routing (Range.java analog)
    val optRange = for {
      c <- Option(info.options.get("rangeBy"))
      bs <- Option(info.options.get("rangeBounds"))
    } yield GpxTable.RangeSpec(c, bs.split(",").toSeq.map(_.trim.toLong))
    val range = optRange.orElse {
      if (catalogManaged)
        roots.headOption.flatMap(GpxTable.readRangeSpec(_, new Configuration()))
      else None
    }
    require(bucket.isEmpty || range.isEmpty,
      "gpx: bucketBy and rangeBy are mutually exclusive layouts")
    // per-row commit timestamps (multi-version rewrites): the named column
    // must ride LAST in the written schema; files store the data fields
    val tsColumn = Option(info.options.get("commitTsColumn"))
    // commit-log protocol routing: explicit option("commitProtocol",...)
    // wins; otherwise schemes without atomic rename (s3a/gs/abfs/wasb and
    // the hostile test shim) default to the conditional-put log — the
    // rename protocol is silently unsafe there — and rename-atomic stores
    // (local/HDFS) keep the rename default. "logDefer" makes a compound
    // operation's inner append register its files instead of committing
    // (see GpxCommitLog.deferAdd).
    val wantLog = GpxCommitLog.routeWantLog(roots.head, new Configuration(),
      Option(info.options.get("commitProtocol")))
    val logDefer = Option(info.options.get("logDefer"))
    new GpxWriteBuilder(info.schema(), roots.head, rgRows, pxRows, commitTs,
      bucket, sortBy, tsColumn, range, wantLog, logDefer)
  }
}

/** `fileGranular`: set by row-level operations (UPDATE/MERGE copy-on-write)
  * — pruning then works at FILE granularity only (a file with ANY possibly-
  * matching row group is read in full, no row-group/pixel skipping, because
  * the scan's rows are REWRITTEN, not re-filtered: a skipped row would be a
  * lost row), and every planned file path is recorded into the given set so
  * the replace-commit knows exactly which files the written data supersedes. */
class GpxScanBuilder(tableSchema: StructType, roots: Seq[String],
    snapshotTs: Option[Long],
    fileGranular: Option[java.util.Set[String]] = None,
    logVersion: Option[Long] = None)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit
  with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  /** schema of what's physically in the files (no synthetic columns) */
  private val fileSchema =
    StructType(tableSchema.filterNot(f => GpxTable.isSynthetic(f.name)))

  private var required: StructType = tableSchema
  private var filters: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None
  private var limit: Option[Int] = None
  private var topN: Option[GpxScan.TopN] = None

  /** Limit pushdown: `SELECT ... LIMIT n` on a bare scan plans only
    * enough row groups to cover n rows instead of the whole table — the
    * difference between an interactive peek and a 100 TB scan. Spark
    * only pushes when Limit sits directly on the scan (our filters stay
    * above as Spark-evaluated), and `isPartiallyPushed` keeps Spark's
    * exact Limit on top, so row-group-granular truncation is safe.
    * COW row-level scans must never truncate (a skipped row would be a
    * lost row). */
  override def pushLimit(l: Int): Boolean = {
    if (fileGranular.isDefined || filters.nonEmpty) return false
    // merge-on-read masks drop rows AFTER planning counts them: planned
    // row groups may cover fewer live rows than the limit — never truncate
    if (hasDeleteSidecars) return false
    limit = Some(l)
    true
  }

  /** any delete-bitmap sidecar under the table roots (one recursive
    * listing, computed at most once per builder) */
  private lazy val hasDeleteSidecars: Boolean =
    GpxDeleteBitmap.anyDeletes(roots, new Configuration())
  override def isPartiallyPushed(): Boolean = true

  /** Top-N pushdown (`ORDER BY col LIMIT n` directly over the scan):
    * planning keeps only the row groups that can contribute to the first
    * n rows, bounding the n-th value from the zone maps (GpxScan.topNKeep).
    * Purely stats-based — NO sorted layout is assumed; a sorted layout
    * just makes the zone maps disjoint so the prune converges to
    * ~ceil(n/rowGroupRows) groups instead of a full scan. Partial by
    * contract (isPartiallyPushed=true): Spark's TakeOrderedAndProject
    * still runs above, so pruning only ever has to keep a SUPERSET of the
    * top-n rows. Only the default direction/null pairings are pruned
    * (ASC NULLS FIRST / DESC NULLS LAST — the two whose null placement
    * the zone-map argument covers); merge-on-read deletes and COW row
    * scans never truncate (same reasoning as pushLimit). */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    if (fileGranular.isDefined || filters.nonEmpty || n <= 0) return false
    if (hasDeleteSidecars) return false
    if (orders.isEmpty) return false
    // pruning by the FIRST key alone is sound regardless of tie-breaking
    // keys: with >= n rows at first-key values <= T, any row whose first
    // key sorts strictly after T is out of the top n under ANY tie-break
    val first = orders.head
    val col = first.expression() match {
      case nr: NamedReference if nr.fieldNames.length == 1 &&
        fileSchema.fieldNames.contains(nr.fieldNames.head) =>
        nr.fieldNames.head
      case _ => return false
    }
    val dt = fileSchema(fileSchema.fieldIndex(col)).dataType
    val isFloat = dt == DoubleType || dt == FloatType
    if (!GpxFormat.isLongBacked(dt) && !isFloat) return false
    import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection}
    val desc = (first.direction, first.nullOrdering) match {
      case (SortDirection.ASCENDING, NullOrdering.NULLS_FIRST) => false
      case (SortDirection.DESCENDING, NullOrdering.NULLS_LAST) => true
      case _ => return false
    }
    topN = Some(GpxScan.TopN(col, desc, n, isFloat))
    true
  }

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    // keep every filter for zone-map skipping, but report none as fully
    // handled: Spark re-evaluates them above the scan (correctness first;
    // the skip is an I/O optimization).
    filters = fs
    fs
  }
  override def pushedFilters(): Array[Filter] = filters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Partial aggregate pushdown (reference S12 — partial aggregation in
    * the scan worker, ScanInput.partialAggregationPresent): ungrouped,
    * unfiltered MIN/MAX/COUNT are answered straight from footer stats —
    * one row per row group, ZERO data pages read. Spark runs the final
    * aggregation over the per-row-group partials. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (fileGranular.isDefined) return false
    // a manifest-version-pinned read must not take the stats scan: it
    // resolves files via listFiles (the HEAD), not the pinned snapshot
    if (logVersion.isDefined) return false
    // an active MemTable tail has rows no footer stat covers
    if (roots.size == 1 && GpxMemTable.buffered(roots.head) > 0) return false
    if (filters.nonEmpty || agg.groupByExpressions().nonEmpty) return false
    // footer stats count/bound rows the merge-on-read masks have deleted
    if (hasDeleteSidecars) return false
    val conf = new Configuration()
    // Commit-log tables answer the WHOLE aggregate from the manifest's
    // per-file stats: one cached manifest read merged to a single partial
    // row at planning — zero footer reads, zero data pages, O(1) RPCs at
    // any table size (the footer path below costs O(table files) cold
    // footer reads, defeating the manifest's O(matching files) planning
    // contract on exactly the high-latency stores it targets). Manifest
    // entries record each file's OWN columns, so schema evolution is
    // handled exactly: a file without the column contributes count 0 and
    // no min/max (its values are all-null in the union view). Pinned at a
    // timestamp: file-level minTs/maxTs cannot split a mixed-visibility
    // file, so snapshot reads keep the per-row-group footer path.
    val manifestEntries: Option[Vector[GpxCommitLog.FileEntry]] =
      if (roots.size == 1 && snapshotTs.isEmpty &&
          GpxCommitLog.isLogTable(roots.head, conf))
        GpxCommitLog.head(roots.head, conf).map(_.live)
      else None
    // evolved tables (files with differing schemas) answer from the normal
    // scan's null-filling path — footer column ordinals differ per file
    val uniform = manifestEntries.isDefined ||
      GpxTable.listFiles(roots, conf).forall(f =>
        GpxFileReader.FooterCache.get(f, conf).schema == fileSchema)
    if (!uniform) return false
    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 &&
          fileSchema.fieldNames.contains(f.fieldNames.head) =>
          Some(f.fieldNames.head)
        case _ => None
      }
    def statsUsable(name: String): Boolean = {
      val i = fileSchema.fieldIndex(name)
      val dt = fileSchema(i).dataType
      // integer family only: always NaN-free and exact. Strings are
      // truncated; float/double chunks may carry NaN (stats then marked
      // unreliable, which planning time can't see) — not pushed.
      GpxFormat.isLongBacked(dt) &&
        // manifest path: every entry carrying the column must have
        // reliable file-level stats (in-memory check over the already-
        // read manifest, no RPC)
        manifestEntries.forall(_.forall(
          _.stats.get(name).forall(_.reliable)))
    }
    val ok = agg.aggregateExpressions().forall {
      case _: CountStar => true
      case c: Count if !c.isDistinct => colName(c.column).isDefined
      case m: Min => colName(m.column).exists(statsUsable)
      case m: Max => colName(m.column).exists(statsUsable)
      case _ => false
    }
    if (ok) { pushedAgg = Some(agg); manifestAggEntries = manifestEntries }
    ok
  }

  private var manifestAggEntries: Option[Vector[GpxCommitLog.FileEntry]] = None

  override def build(): Scan = pushedAgg match {
    case Some(agg) => manifestAggEntries match {
      case Some(entries) =>
        new GpxManifestStatsScan(fileSchema, agg, entries)
      case None => new GpxStatsScan(fileSchema, agg, roots, snapshotTs)
    }
    case None =>
      // projection-layout routing (reference Projections.java /
      // OriginProjectionPattern.java): a CURRENT read covered by a valid
      // materialized column-subset copy scans that narrow layout instead
      // of the wide base. Synthetic columns pin the scan to the base
      // (_file/_pos are base-file identities; _commit_ts values are not
      // reproduced in the copy), as do time travel and COW row scans.
      // MemTable serve tail (CURRENT reads only — snapshot/version pins
      // and COW row scans serve committed state): capture the buffered
      // rows and the manifest head version ATOMICALLY; the file side then
      // pins that version so flush races can't double- or zero-count
      val memCap: Option[(Array[Array[Byte]], Long)] =
        if (fileGranular.isEmpty && snapshotTs.isEmpty &&
            logVersion.isEmpty && roots.size == 1 &&
            GpxMemTable.buffered(roots.head) > 0)
          GpxMemTable.capture(roots.head, required, new Configuration())
        else None
      val routed: Option[Seq[String]] =
        if (fileGranular.isDefined || snapshotTs.isDefined ||
            roots.size != 1 || memCap.isDefined)
          None
        else {
          val needed = required.fieldNames.toSet ++ filters.flatMap(_.references)
          if (needed.exists(GpxTable.isSynthetic)) None
          else if (needed.isEmpty) None
          else GpxProjection.covering(roots.head, needed, new Configuration())
            .map { case (dir, _) => Seq(dir) }
        }
      new GpxScan(fileSchema, required, filters, routed.getOrElse(roots),
        snapshotTs, fileGranular, limit, topN,
        memCap.map(_._2).orElse(logVersion), memCap.map(_._1))
  }
}

/** Stats-only scan for pushed-down aggregates: emits one row of partial
  * aggregates per row group, computed on the executor from row-group
  * metadata EMBEDDED in the split (no footer access at execution). */
class GpxStatsScan(fileSchema: StructType, agg: Aggregation, roots: Seq[String],
    snapshotTs: Option[Long])
  extends Scan with Batch {

  override def readSchema(): StructType =
    GpxStatsScan.outputSchema(fileSchema, agg)

  override def toBatch: Batch = this
  override def description(): String =
    s"GpxStatsScan[${agg.aggregateExpressions().mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    GpxTable.listFiles(roots, conf).flatMap { f =>
      GpxFileReader.FooterCache.get(f, conf).rowGroups
        .filter(rg => GpxScan.visibleAt(rg, snapshotTs))
        .map(rg => GpxStatsPartition(f, rg): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GpxStatsReaderFactory(fileSchema, agg)
}

object GpxStatsScan {
  /** partial-aggregate output schema shared by the footer-stats and
    * manifest-stats scans (Spark final-aggregates over these rows) */
  def outputSchema(fileSchema: StructType, agg: Aggregation): StructType = {
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): StructField =
      fileSchema(fileSchema.fieldIndex(
        e.asInstanceOf[NamedReference].fieldNames.head))
    StructType(agg.aggregateExpressions().zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"count_star_$i", LongType, nullable = false)
      case (_: Count, i) => StructField(s"count_$i", LongType, nullable = false)
      case (m: Min, i) => StructField(s"min_$i", fieldOf(m.column).dataType)
      case (m: Max, i) => StructField(s"max_$i", fieldOf(m.column).dataType)
      case (other, _) => throw new IllegalStateException(other.toString)
    })
  }
}

/** Pushed-aggregate scan for commit-log tables: the partials come from the
  * head manifest's per-file stats, merged to ONE row at PLANNING time — no
  * footer access, no data pages, O(1) metadata RPCs at any table size
  * (reference S12 economics with the metadata-service stats standing in
  * for footers). Evolution-exact: each entry records its file's OWN
  * columns, so a file predating a column contributes count 0 and no bound
  * (its values are all-null in the union view). */
class GpxManifestStatsScan(fileSchema: StructType, agg: Aggregation,
    entries: Vector[GpxCommitLog.FileEntry])
  extends Scan with Batch {

  override def readSchema(): StructType =
    GpxStatsScan.outputSchema(fileSchema, agg)
  override def toBatch: Batch = this
  override def description(): String =
    s"GpxManifestStatsScan[${agg.aggregateExpressions().mkString(",")}; " +
      s"files=${entries.size}]"

  private def nameOf(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames.head

  // long-backed types only reach here (statsUsable gates the pushdown)
  private def longToTyped(v: Long, dt: DataType): Any = dt match {
    case BooleanType => v != 0L
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType | DateType => v.toInt
    case LongType | TimestampType | TimestampNTZType => v
    case dec: DecimalType =>
      org.apache.spark.sql.types.Decimal.createUnsafe(v, dec.precision, dec.scale)
    case other => throw new IllegalStateException(other.toString)
  }

  private def merged(): Array[Any] = agg.aggregateExpressions().map {
    case _: CountStar =>
      entries.iterator.map(_.numRows).sum: java.lang.Long
    case c: Count =>
      val n = nameOf(c.column)
      (entries.iterator.map(e =>
        e.stats.get(n).map(st => e.numRows - st.nullCount).getOrElse(0L))
        .sum): java.lang.Long
    case m: Min =>
      val n = nameOf(m.column)
      val dt = fileSchema(fileSchema.fieldIndex(n)).dataType
      val vals = entries.iterator.flatMap(_.stats.get(n))
        .filter(_.hasValues).map(_.minLong).toSeq
      if (vals.isEmpty) null else longToTyped(vals.min, dt)
    case m: Max =>
      val n = nameOf(m.column)
      val dt = fileSchema(fileSchema.fieldIndex(n)).dataType
      val vals = entries.iterator.flatMap(_.stats.get(n))
        .filter(_.hasValues).map(_.maxLong).toSeq
      if (vals.isEmpty) null else longToTyped(vals.max, dt)
    case other => throw new IllegalStateException(other.toString)
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(GpxPrecomputedAggPartition(merged()))

  override def createReaderFactory(): PartitionReaderFactory =
    GpxPrecomputedAggReaderFactory
}

/** the single pre-merged partial row travels with the split */
final case class GpxPrecomputedAggPartition(values: Array[Any])
  extends InputPartition

object GpxPrecomputedAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val vals = p.asInstanceOf[GpxPrecomputedAggPartition].values
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      override def close(): Unit = ()
    }
  }
}

/** Stats split: the row-group metadata travels with the partition. */
final case class GpxStatsPartition(path: String, rg: RowGroupMeta)
  extends InputPartition

class GpxStatsReaderFactory(fileSchema: StructType, agg: Aggregation)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GpxStatsPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (done) return false
        val rg = part.rg
        def statOf(e: org.apache.spark.sql.connector.expressions.Expression) = {
          val name = e.asInstanceOf[NamedReference].fieldNames.head
          val i = fileSchema.fieldIndex(name)
          (rg.chunks(i).stats, fileSchema(i).dataType)
        }
        def minMax(e: org.apache.spark.sql.connector.expressions.Expression, isMin: Boolean): Any = {
          val (s, dt) = statOf(e)
          if (!s.hasValues) null
          else dt match {
            case DoubleType => if (isMin) s.minDouble else s.maxDouble
            case FloatType => (if (isMin) s.minDouble else s.maxDouble).toFloat
            case BooleanType => (if (isMin) s.minLong else s.maxLong) != 0L
            case ByteType => (if (isMin) s.minLong else s.maxLong).toByte
            case ShortType => (if (isMin) s.minLong else s.maxLong).toShort
            case IntegerType | DateType => (if (isMin) s.minLong else s.maxLong).toInt
            case LongType | TimestampType | TimestampNTZType =>
              if (isMin) s.minLong else s.maxLong
            case dec: DecimalType =>
              org.apache.spark.sql.types.Decimal.createUnsafe(
                if (isMin) s.minLong else s.maxLong, dec.precision, dec.scale)
            case other => throw new IllegalStateException(other.toString)
          }
        }
        val values: Array[Any] = agg.aggregateExpressions().map {
          case _: CountStar => rg.numRows.toLong
          case c: Count => rg.numRows.toLong - statOf(c.column)._1.nullCount
          case m: Min => minMax(m.column, isMin = true)
          case m: Max => minMax(m.column, isMin = false)
          case other => throw new IllegalStateException(other.toString)
        }
        row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
        done = true
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** One self-contained split per (file, row group) that survives pruning:
  * `cols` holds, per output column, the kept pixel slices in row order —
  * or null for the synthetic `_commit_ts` column (filled from commitTs).
  * `bucketId` (file-name bucket, -1 if unbucketed) is the partition key
  * for storage-partitioned joins over the bucketed layout. */
final case class GpxInputPartition(
    path: String, numRows: Int, commitTs: Long,
    cols: Array[Array[PixelSlice]], bucketId: Int = -1,
    synth: Array[Byte] = null,
    pixelStarts: Array[Long] = null,
    pixelCounts: Array[Int] = null,
    delWords: Array[Long] = null,
    constStr: String = null)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucketId))
}

class GpxScan(
    fileSchema: StructType,
    required: StructType,
    planningFilters: Array[Filter],
    roots: Seq[String],
    snapshotTs: Option[Long],
    fileGranular: Option[java.util.Set[String]] = None,
    limit: Option[Int] = None,
    topN: Option[GpxScan.TopN] = None,
    logVersion: Option[Long] = None,
    memRows: Option[Array[Array[Byte]]] = None) extends Scan with Batch
  with SupportsReportStatistics with SupportsRuntimeFiltering
  with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  /** planning-time filters plus any runtime (DPP-style) filters Spark
    * injects after build sides materialize — the v2 analog of dynamic
    * partition pruning; zone maps re-prune with the runtime IN-sets. */
  @volatile private var filters: Array[Filter] = planningFilters

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GpxScan[${required.fieldNames.mkString(",")}] filters=${filters.mkString(";")}" +
      topN.map(t => s" topN=${t.n} by ${t.column}" +
        (if (t.desc) " desc" else "")).getOrElse("")

  override def filterAttributes(): Array[NamedReference] =
    // must reference only the scan's OUTPUT columns (Spark resolves these
    // against readSchema, not the file schema). The copy-on-write scan
    // advertises ONLY `_file`: runtime group filtering then arrives as a
    // convertible `_file IN (files with matches)` instead of an
    // inconvertible struct-IN over every column (which would silently
    // disable group pruning and rewrite the whole table on MERGE).
    if (fileGranular.isDefined)
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(GpxTable.FileCol))
    else required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(runtime: Array[Filter]): Unit = {
    filters = filters ++ runtime
    GpxScan.runtimeFilterCalls.incrementAndGet()
  }

  /** eligible bucket ids when the table is bucketed and the filters pin
    * the bucket column to specific keys (point lookup / IN list). */
  private def eligibleBuckets(conf: Configuration): Option[Set[Int]] =
    roots.headOption.flatMap(GpxTable.readBucketSpec(_, conf)).flatMap { spec =>
      def keysOf(f: Filter): Option[Set[Long]] = f match {
        case org.apache.spark.sql.sources.EqualTo(c, v: Number)
          if c == spec.column => Some(Set(v.longValue()))
        case org.apache.spark.sql.sources.In(c, vs) if c == spec.column &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
          Some(vs.map(_.asInstanceOf[Number].longValue()).toSet)
        case org.apache.spark.sql.sources.And(l, r) =>
          (keysOf(l), keysOf(r)) match {
            case (Some(a), Some(b)) => Some(a.intersect(b))
            case (a, b) => a.orElse(b)
          }
        case _ => None
      }
      filters.flatMap(keysOf).reduceOption(_ intersect _)
        .map(_.map(GpxTable.bucketOf(_, spec.numBuckets)))
    }

  /** eligible range ids when the table has a range layout and the filters
    * bound the range column — file-name-level pruning that never opens a
    * footer (the reference's RangeIndex routing, Range.java analog) */
  private def eligibleRanges(conf: Configuration): Option[Set[Int]] =
    roots.headOption.flatMap(GpxTable.readRangeSpec(_, conf)).flatMap { spec =>
      val all = 0 to spec.bounds.length
      def longOf(v: Any): Option[Long] = v match {
        case n: Number => Some(n.longValue())
        case _ => None
      }
      def rangesOf(f: Filter): Option[Set[Int]] = f match {
        case org.apache.spark.sql.sources.EqualTo(c, v) if c == spec.column =>
          longOf(v).map(k => Set(GpxTable.rangeOf(k, spec.bounds)))
        case org.apache.spark.sql.sources.In(c, vs) if c == spec.column &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
          Some(vs.map(v => GpxTable.rangeOf(
            v.asInstanceOf[Number].longValue(), spec.bounds)).toSet)
        case org.apache.spark.sql.sources.GreaterThan(c, v) if c == spec.column =>
          longOf(v).map(k => (GpxTable.rangeOf(k, spec.bounds) to spec.bounds.length).toSet)
        case org.apache.spark.sql.sources.GreaterThanOrEqual(c, v) if c == spec.column =>
          longOf(v).map(k => (GpxTable.rangeOf(k, spec.bounds) to spec.bounds.length).toSet)
        case org.apache.spark.sql.sources.LessThan(c, v) if c == spec.column =>
          longOf(v).map(k => (0 to GpxTable.rangeOf(k, spec.bounds)).toSet)
        case org.apache.spark.sql.sources.LessThanOrEqual(c, v) if c == spec.column =>
          longOf(v).map(k => (0 to GpxTable.rangeOf(k, spec.bounds)).toSet)
        case org.apache.spark.sql.sources.And(l, r) =>
          (rangesOf(l), rangesOf(r)) match {
            case (Some(a), Some(b)) => Some(a.intersect(b))
            case (a, b) => a.orElse(b)
          }
        case org.apache.spark.sql.sources.Or(l, r) =>
          for { a <- rangesOf(l); b <- rangesOf(r) } yield a.union(b)
        case _ => None
      }
      val sets = filters.flatMap(rangesOf)
      if (sets.isEmpty) None
      else Some(sets.reduce(_ intersect _)).filter(_ != all.toSet)
    }

  /** Plan splits: bucket/range prune -> snapshot visibility -> row-group
    * zone maps -> pixel zone maps; survivors become self-contained slice
    * lists. Footers come from the driver-side cache — zero footer I/O on
    * warm paths, zero ALWAYS on executors. */
  /** allowed file set when filters pin `_file` (Spark's runtime group
    * filtering for copy-on-write injects `_file IN (matched files)`). */
  private def eligibleFiles: Option[Set[String]] = {
    def filesOf(f: Filter): Option[Set[String]] = f match {
      case org.apache.spark.sql.sources.EqualTo(GpxTable.FileCol, v: String) =>
        Some(Set(v))
      case org.apache.spark.sql.sources.In(GpxTable.FileCol, vs)
          if vs.forall(_.isInstanceOf[String]) =>
        Some(vs.map(_.asInstanceOf[String]).toSet)
      case org.apache.spark.sql.sources.And(l, r) =>
        (filesOf(l), filesOf(r)) match {
          case (Some(a), Some(b)) => Some(a.intersect(b))
          case (a, b) => a.orElse(b)
        }
      case _ => None
    }
    filters.flatMap(filesOf).reduceOption(_ intersect _)
  }

  private def computeKept(): (Array[GpxInputPartition], Long, Long, Array[ChunkStats]) = {
    GpxScan.pruningWalks.incrementAndGet()
    val conf = new Configuration()
    // per-REQUIRED-column stats merged over kept row groups (feeds
    // estimateStatistics().columnStats; null slot = nothing merged yet)
    val colStats = new Array[ChunkStats](required.fields.length)
    val buckets = eligibleBuckets(conf)
    val ranges = eligibleRanges(conf)
    val allowedFiles = eligibleFiles
    // clear-then-record: the LAST walk before execution (after any runtime
    // group filter arrived) defines the replaced-file set — accumulation
    // across walks would over-delete at the replace-commit
    fileGranular.foreach(_.clear())
    // point-index pruning (S20): equality/IN filters on an indexed column
    // resolve to the exact (file -> row groups) containing the keys, so
    // planning skips non-matching files WITHOUT opening their footers
    val idxAllowed: Option[Map[String, Set[Int]]] =
      if (roots.size == 1)
        GpxPointIndex.allowedRowGroups(roots.head, filters, conf)
      else None
    val qroot = roots.headOption.map(GpxTable.qualifiedRoot(_, conf))
    // RENAME COLUMN aliases: files written before a rename keep the old
    // physical name; resolution happens here, per file, at planning time
    val renames = roots.headOption
      .map(GpxTable.readRenames(_, conf)).getOrElse(Map.empty)
    val parts = new ArrayBuffer[GpxInputPartition]
    // sort-column zone map per added part (null = column absent in that
    // file), parallel to `parts` — feeds the top-N post-prune
    val topStats = new ArrayBuffer[ChunkStats]
    var totalRows = 0L
    var totalBytes = 0L
    // pushed LIMIT: stop planning once the kept row groups cover it
    // (only ever set on bare scans — no filters, no COW row recording).
    // iterator: the predicate must see totalRows as the loop advances.
    // filters.isEmpty re-check: limit is only pushed on filterless scans
    // and runtime filters can't inject below a Limit, but if one ever
    // did, truncating pre-filter rows would under-return — never truncate
    // when any filter is present
    def limitReached: Boolean =
      filters.isEmpty && limit.exists(l => totalRows >= l)
    // merge-on-read delete sidecars, listed once per distinct parent dir
    val sidecarsByParent =
      scala.collection.mutable.Map.empty[String, Map[String, Seq[GpxDeleteBitmap.Sidecar]]]
    // commit-log tables: the manifest already carries each live file's
    // row count, commitTs span and FILE-level zone maps — prune whole
    // files from the ONE manifest read and open footers only for
    // survivors. At 100k files a selective predicate plans with O(matching
    // files) metadata reads instead of O(table files) footer walks (the
    // reference's CostBasedSplitsIndex / metadata-stats role).
    val logSnap: Option[GpxCommitLog.Snapshot] =
      if (roots.size == 1 && !roots.head.endsWith(".gpx") &&
          GpxCommitLog.isLogTable(roots.head, conf))
        logVersion match {
          case Some(v) =>
            Some(GpxCommitLog.snapshotAt(roots.head, v, conf).getOrElse(
              throw new IllegalArgumentException(
                s"gpx atVersion=$v: no such manifest version under " +
                s"${roots.head} (never committed, or vacuumed away)")))
          case None => GpxCommitLog.head(roots.head, conf)
        }
      else None
    val logEntries: Map[String, GpxCommitLog.FileEntry] = logSnap.map { sn =>
      val qd = GpxTable.qualifiedRoot(roots.head, conf)
      sn.live.iterator.map(e => (s"$qd/${e.relPath}", e)).toMap
    }.getOrElse(Map.empty)
    def logFileMayMatch(f: String): Boolean = logEntries.get(f) match {
      case None => true // not a log table (or an unlisted path): footer path
      case Some(e) =>
        // file-level snapshot visibility: minTs > ts means every row group
        // is invisible at the snapshot (-1 anywhere makes minTs = -1)
        snapshotTs.forall(ts => e.minTs < 0 || e.minTs <= ts) &&
          filters.forall { fl =>
            GpxFileReader.mayMatchNamed(fl, fileSchema, e.numRows, c =>
              (c +: renames.getOrElse(c, Seq.empty)).iterator
                .flatMap(e.stats.get).nextOption())
          }
    }
    val walkFiles: Seq[String] = logSnap match {
      case Some(sn) =>
        val qd = GpxTable.qualifiedRoot(roots.head, conf)
        sn.live.map(e => s"$qd/${e.relPath}")
      case None => GpxTable.listFiles(roots, conf)
    }
    walkFiles.iterator
      .takeWhile(_ => !limitReached).foreach { f =>
      // bucket/range pruning: skip whole files whose routing id can't
      // hold the keys (files without a routing tag — e.g. compacted —
      // are conservatively kept)
      val bucketOk = ((buckets, GpxTable.bucketOfFile(f)) match {
        case (Some(elig), Some(b)) => elig.contains(b)
        case _ => true
      }) && ((ranges, GpxTable.rangeOfFile(f)) match {
        case (Some(elig), Some(r)) => elig.contains(r)
        case _ => true
      }) && allowedFiles.forall(_.contains(f))
      val allowedRgs: Option[Set[Int]] = idxAllowed.map { m =>
        val rel = qroot.map(q =>
          if (f.startsWith(q)) f.drop(q.length).stripPrefix("/") else f)
          .getOrElse(f)
        m.getOrElse(rel, Set.empty)
      }
      if (bucketOk && allowedRgs.forall(_.nonEmpty) && logFileMayMatch(f)) {
        // log tables: the manifest pins the immutable file's length, so a
        // warm cache serves the footer with zero filesystem calls
        val footer = logEntries.get(f) match {
          case Some(e) => GpxFileReader.FooterCache.getImmutable(f, e.len, conf)
          case None => GpxFileReader.FooterCache.get(f, conf)
        }
        val phys = footer.schema
        // union of the delete bitmaps applying at this snapshot, or null
        val fPath = new Path(f)
        val mask: java.util.BitSet = {
          val byFile = sidecarsByParent.getOrElseUpdate(
            fPath.getParent.toString,
            GpxDeleteBitmap.sidecarsIn(fPath.getParent, conf))
          byFile.get(fPath.getName) match {
            case Some(scs) => GpxDeleteBitmap.maskFor(f, scs, snapshotTs, conf)
            case None => null
          }
        }
        // synthetic-kind per required column; physIdx >= 0 = data column.
        // Requested names resolve through the rename-alias chain, so a
        // file predating RENAME COLUMN still serves its old physical name.
        val synthKinds: Array[Byte] = required.fields.map { fd =>
          fd.name match {
            case GpxTable.CommitTsCol => GpxFileReader.SynthCommitTs
            case GpxTable.FileCol => GpxFileReader.SynthFile
            case GpxTable.PosCol => GpxFileReader.SynthPos
            case n if phys.fieldNames.contains(
              GpxTable.physNameOf(phys, n, renames)) => GpxFileReader.SynthData
            case _ => GpxFileReader.SynthAbsent // evolved file: null-fill
          }
        }
        val physIdx: Array[Int] = required.fields.map { fd =>
          if (GpxTable.isSynthetic(fd.name)) -1
          else phys.fieldNames.indexOf(
            GpxTable.physNameOf(phys, fd.name, renames))
        }
        // this file's physical ordinal of the pushed top-N sort column
        // (-1 = absent in this evolved file -> all rows null)
        val topCi: Int = topN.map(t => phys.fieldNames.indexOf(
          GpxTable.physNameOf(phys, t.column, renames))).getOrElse(-1)
        // file-granular mode (copy-on-write rewrite): if ANY row group may
        // match, read the WHOLE file — skipped rows would be lost rows —
        // and record the path as superseded by the replace-commit
        val keepWholeFile = fileGranular.isDefined && {
          val any = footer.rowGroups.exists(rg =>
            GpxScan.visibleAt(rg, snapshotTs) &&
              filters.forall(GpxFileReader.mayMatch(_, phys, rg)))
          if (any) fileGranular.get.add(f)
          any
        }
        // absolute row offset of the current row group within the file —
        // accumulated over ALL row groups (pruned ones included): delete
        // bitmaps and _pos address the file's full row space
        var fileRowOffset = 0L
        footer.rowGroups.zipWithIndex.iterator
          .takeWhile(_ => !limitReached).foreach { case (rg, rgIdx) =>
          val rgStart = fileRowOffset
          fileRowOffset += rg.numRows
          if (keepWholeFile ||
            (fileGranular.isEmpty && allowedRgs.forall(_.contains(rgIdx)) &&
            GpxScan.visibleAt(rg, snapshotTs) &&
            filters.forall(GpxFileReader.mayMatch(_, phys, rg)))) {
            val nPix = rg.chunks.headOption.map(_.pixels.length).getOrElse(0)
            val keptPix: Array[Int] =
              if (nPix == 0) Array.empty
              else if (fileGranular.isDefined) (0 until nPix).toArray
              else (0 until nPix).filter(p =>
                filters.forall(GpxFileReader.mayMatchPixel(_, phys, rg, p))).toArray
            if (keptPix.nonEmpty) {
              val pixRows = rg.chunks.head.pixels.map(_.rows)
              // global first-row of each pixel in this row group
              val pixStartAll = new Array[Long](nPix)
              var acc = rgStart
              var pi = 0
              while (pi < nPix) { pixStartAll(pi) = acc; acc += pixRows(pi); pi += 1 }
              val numRows = keptPix.map(pixRows(_)).sum
              val pixelStarts = keptPix.map(pixStartAll(_))
              val pixelCounts = keptPix.map(pixRows(_))
              // local-row delete mask over the split's read rows
              val delWords: Array[Long] =
                if (mask == null) null
                else {
                  val words = new Array[Long]((numRows + 63) >> 6)
                  var any = false
                  var lo = 0
                  keptPix.foreach { p =>
                    val s = pixStartAll(p).toInt
                    val r = pixRows(p)
                    var b = mask.nextSetBit(s)
                    while (b >= 0 && b < s + r) {
                      val li = lo + (b - s)
                      words(li >> 6) |= 1L << (li & 63)
                      any = true
                      b = mask.nextSetBit(b + 1)
                    }
                    lo += r
                  }
                  if (any) words else null
                }
              val cols: Array[Array[PixelSlice]] = physIdx.zipWithIndex.map {
                case (ci, ri) =>
                  if (synthKinds(ri) != GpxFileReader.SynthData)
                    null // synthetic/absent: filled from the split
                  else {
                    val ch = rg.chunks(ci)
                    keptPix.map(p => PixelSlice(
                      ch.offset + ch.pixels(p).relOffset, ch.pixelLength(p),
                      ch.pixels(p).rows))
                  }
              }
              parts += GpxInputPartition(f, numRows, rg.commitTs, cols,
                GpxTable.bucketOfFile(f).getOrElse(-1),
                synthKinds, pixelStarts, pixelCounts, delWords)
              if (topN.isDefined)
                topStats += (if (topCi < 0) null else rg.chunks(topCi).stats)
              totalRows += numRows
              cols.foreach { c =>
                totalBytes += (if (c == null) 8L * numRows else c.map(_.length.toLong).sum)
              }
              // row-group-level column stats (conservative vs the pixel
              // pruning above: may cover a few more rows than get read)
              physIdx.zipWithIndex.foreach { case (ci, ri) =>
                val st =
                  if (synthKinds(ri) == GpxFileReader.SynthAbsent)
                    ChunkStats.empty.copy(nullCount = rg.numRows.toLong)
                  else if (ci < 0) ChunkStats.unreliable // synthetic constant
                  else rg.chunks(ci).stats
                colStats(ri) =
                  if (colStats(ri) == null) st
                  else ChunkStats.merge(colStats(ri), st)
              }
            }
          }
        }
      }
    }
    topN match {
      // filters.isEmpty re-check: top-N is only pushed on filterless
      // scans, but a runtime (DPP) filter injected later would make the
      // coverage counting overcount (kept groups' rows may not all pass
      // the filter) and over-prune — never top-N-prune a filtered walk
      case Some(spec) if parts.nonEmpty && filters.isEmpty =>
        // zone-map top-N prune: keep only row groups that can hold one of
        // the first n rows under the pushed order. colStats stay merged
        // over the PRE-prune set — a conservative superset, same contract
        // as the pixel-pruning note above.
        val keepMask = GpxScan.topNKeep(
          topStats.toArray, parts.map(_.numRows).toArray, spec.desc, spec.n,
          spec.isFloat)
        val keptParts = parts.indices.filter(i => keepMask(i)).map(parts).toArray
        val rows = keptParts.map(_.numRows.toLong).sum
        val bytes = keptParts.map(p => p.cols.map(c =>
          if (c == null) 8L * p.numRows else c.map(_.length.toLong).sum).sum).sum
        (keptParts, rows, math.max(bytes, 1L), colStats)
      case _ =>
        (parts.toArray, totalRows, math.max(totalBytes, 1L), colStats)
    }
  }

  // One pruning walk per filter set: estimateStatistics runs on the
  // planning-time filters, planInputPartitions AFTER any runtime (DPP)
  // filters arrive. When none arrived in between, the filter set is
  // unchanged and the cached walk is reused — at 100k files the walk is
  // real driver CPU even with cache-served footers.
  @volatile private var keptCache: (Seq[Filter], (Array[GpxInputPartition], Long, Long, Array[ChunkStats])) = null

  private def kept(): (Array[GpxInputPartition], Long, Long, Array[ChunkStats]) = synchronized {
    val fs = filters.toSeq
    val c = keptCache
    if (c != null && c._1 == fs) c._2
    else {
      val r = computeKept()
      keptCache = (fs, r)
      r
    }
  }

  private def statsSnapshot = kept()

  override def planInputPartitions(): Array[InputPartition] = {
    val base = kept()._1.toArray[InputPartition]
    // the MemTable serve tail rides as one extra partition; the file side
    // is PINNED at the capture's manifest version (logVersion), so every
    // row is served exactly once across the flush boundary (GpxMemTable)
    memRows match {
      case Some(rows) if rows.nonEmpty =>
        base :+ GpxMemPartition(rows, required.length)
      case _ => base
    }
  }

  /** Footer-derived stats AFTER zone-map pruning, sized to the pruned
    * column set — feeds CBO/AQE broadcast decisions with real numbers
    * (the reference's PlanOptimizer does the same from its metadata stats,
    * PlanOptimizer.java:94-204). Per-column min/max/nullCount merged from
    * the kept row groups' zone maps flow into Catalyst's attributeStats
    * (transformV2Stats), so CBO filter/join estimation sees real ranges
    * without an ANALYZE pass — the scan already walked the footers. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(statsSnapshot._3)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(statsSnapshot._2)
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val m = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      // ANALYZE overlay (GpxMaintenance.analyze): per-column NDV served
      // only while its version-token stamp matches — see readColStats.
      // Clamped to the pruned row count (a zone-pruned scan can't have
      // more distinct values than rows).
      val ndvByName: Map[String, Long] = roots.headOption
        .map(GpxTable.readColStats(_, new Configuration()))
        .getOrElse(Map.empty)
      required.fields.zip(statsSnapshot._4).foreach { case (fd, st) =>
        val ndv = ndvByName.get(fd.name).map(v => math.min(v, statsSnapshot._2))
        if (st != null && st.reliable) {
          // min/max must arrive as the column's EXTERNAL Catalyst value
          // class — estimation casts by dataType (EstimationUtils)
          val (mn, mx): (Option[Object], Option[Object]) =
            if (!st.hasValues) (None, None)
            else fd.dataType match {
              case LongType | TimestampType | TimestampNTZType =>
                (Some(Long.box(st.minLong)), Some(Long.box(st.maxLong)))
              case IntegerType | DateType =>
                (Some(Int.box(st.minLong.toInt)), Some(Int.box(st.maxLong.toInt)))
              case ShortType =>
                (Some(Short.box(st.minLong.toShort)), Some(Short.box(st.maxLong.toShort)))
              case ByteType =>
                (Some(Byte.box(st.minLong.toByte)), Some(Byte.box(st.maxLong.toByte)))
              case DoubleType if !st.minDouble.isNaN && !st.maxDouble.isNaN =>
                (Some(Double.box(st.minDouble)), Some(Double.box(st.maxDouble)))
              case FloatType if !st.minDouble.isNaN && !st.maxDouble.isNaN =>
                (Some(Float.box(st.minDouble.toFloat)), Some(Float.box(st.maxDouble.toFloat)))
              case _ => (None, None) // strings/decimals/bool: nullCount only
            }
          m.put(
            org.apache.spark.sql.connector.expressions.Expressions.column(fd.name),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              // clamp: nullCount merges over full row-group stats while
              // numRows() counts only kept pixels — an unclamped value
              // can exceed rowCount and push CBO null-fraction past 1.0
              override def nullCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(math.min(st.nullCount, statsSnapshot._2))
              override def min(): java.util.Optional[Object] =
                mn.map(java.util.Optional.of[Object])
                  .getOrElse(java.util.Optional.empty[Object]())
              override def max(): java.util.Optional[Object] =
                mx.map(java.util.Optional.of[Object])
                  .getOrElse(java.util.Optional.empty[Object]())
              override def distinctCount(): java.util.OptionalLong =
                ndv.map(java.util.OptionalLong.of)
                  .getOrElse(java.util.OptionalLong.empty())
            })
        } else if (ndv.isDefined) {
          // no reliable zone maps (NaN floats, statless types) — the
          // ANALYZE cardinality still stands on its own
          m.put(
            org.apache.spark.sql.connector.expressions.Expressions.column(fd.name),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(ndv.get)
            })
        }
      }
      m
    }
  }

  /** Bucketed layout + bucket column still in the output => key-grouped on
    * bucket(n, col): Spark groups the splits per bucket id and plans
    * equi-joins on the key WITHOUT an Exchange (both sides' `bucket`
    * resolve to GpxBucketFunction through the catalog). */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val spec = roots.headOption
      .flatMap(GpxTable.readBucketSpec(_, new Configuration()))
    spec match {
      case Some(b) if required.fieldNames.contains(b.column) &&
        statsSnapshot._1.forall(_.bucketId >= 0) && statsSnapshot._1.nonEmpty &&
        memRows.forall(_.isEmpty) => // a mem tail is not key-grouped
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
            b.numBuckets, b.column)),
          statsSnapshot._1.map(_.bucketId).distinct.length)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          statsSnapshot._1.length)
    }
  }

  /** Per-partition output ordering (ordered layout, reference
    * Ordered.java / docs/TPC-H.md ordered-vs-compact): each input
    * partition is ONE row group, and a row group from a sort-clustered
    * write is internally sorted — the footer's per-file `sortedBy` claim
    * is writer-enforced truth, so files written BEFORE the table's
    * `_sortspec` existed (empty claim) disable the report rather than
    * corrupt it. The claim survives pixel pruning, merge-on-read masks
    * and fold/compaction rewrites (all order-preserving). Spark then
    * elides per-partition SortExecs above the scan — with a bucketed
    * layout's KeyGroupedPartitioning, an equi-join on (bucket, sort)
    * columns plans with NEITHER Exchange NOR Sort. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    if (fileGranular.isDefined || roots.size != 1) return Array.empty
    if (memRows.exists(_.nonEmpty)) return Array.empty // tail is unsorted
    val parts = kept()._1
    if (parts.isEmpty) return Array.empty
    val conf = new Configuration()
    val spec = GpxTable.readSortSpec(roots.head, conf)
      .takeWhile(required.fieldNames.contains) // must reference scan output
    if (spec.isEmpty) return Array.empty
    val renames = GpxTable.readRenames(roots.head, conf)
    // longest prefix of the table's (logical) sort spec that EVERY kept
    // file's footer vouches for under its own physical names
    val n = parts.map(_.path).distinct.foldLeft(spec.length) { (acc, f) =>
      val footer = GpxFileReader.FooterCache.get(f, conf)
      val phys = footer.schema
      math.min(acc, spec.take(acc).zipWithIndex.takeWhile { case (c, i) =>
        footer.sortedBy.lift(i)
          .contains(GpxTable.physNameOf(phys, c, renames))
      }.length)
    }
    spec.take(n).map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.column(c),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)
    ).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // Spark requires one batch/row mode for the WHOLE scan: any split
    // with a merge-on-read mask forces the row-based path (rows feed a
    // ColumnarToRow anyway; the mask skip rides the same iteration), as
    // does an active MemTable tail (its rows arrive as UnsafeRows).
    // Mask-free scans — the steady state — keep the columnar fast path.
    new GpxReaderFactory(required,
      rowBased = kept()._1.exists(_.delWords != null) ||
        memRows.exists(_.nonEmpty))
}

object GpxScan {
  /** observability hook for tests: counts runtime-filter injections */
  val runtimeFilterCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  /** observability hook for tests: counts full pruning walks (computeKept) */
  val pruningWalks = new java.util.concurrent.atomic.AtomicInteger(0)

  /** MVCC visibility: row groups without a commit ts are always visible. */
  def visibleAt(rg: RowGroupMeta, snapshotTs: Option[Long]): Boolean =
    snapshotTs.forall(ts => rg.commitTs < 0 || rg.commitTs <= ts)

  /** pushed `ORDER BY column [DESC] LIMIT n` (first sort key only).
    * `isFloat`: the column is float/double — zone-map bounds then ride
    * through the IEEE sortable-long map (NaN chunks are `reliable=false`
    * and never participate, so the map is total and monotone). */
  final case class TopN(column: String, desc: Boolean, n: Int,
      isFloat: Boolean = false)

  /** monotone (non-NaN) double -> signed long: positive bit patterns are
    * already value-ordered; negative ones flip their magnitude bits so
    * more-negative values map lower, and every negative long sorts below
    * every positive one. ±0.0 share one code: Spark's SQL ordering treats
    * them as equal, so if they encoded apart a coverage threshold landing
    * on -0.0 could prune a +0.0 group whose rows TIE with the covering
    * rows (wrong under a secondary sort key). */
  private def sortableLong(d: Double): Long = {
    val v = if (d == 0.0) 0.0 else d
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0) b else b ^ 0x7FFFFFFFFFFFFFFFL
  }

  /** observability hook for tests: row groups skipped by top-N pruning */
  val topNSkipped = new java.util.concurrent.atomic.AtomicInteger(0)

  // extended value domain for zone-map bounds: -inf < any long < +inf,
  // encoded as (rank, long) compared lexicographically — a Double proxy
  // would lose precision above 2^53 and could mis-prune
  private final val NegInf = (-1, 0L)
  private final val PosInf = (1, 0L)
  private def le(a: (Int, Long), b: (Int, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)

  /** Which row groups can contribute to the top n?
    *
    * `stats(i)` is group i's sort-column zone map (null = the column is
    * absent in that evolved file, i.e. all rows null); `rows(i)` its row
    * count. Argument, ASC NULLS FIRST (DESC NULLS LAST is the mirror):
    * pick the cheapest set S of reliable groups whose row counts sum to
    * >= n, minimizing T = max over S of the group's upper bound (nulls
    * sort below T by definition; non-null rows are bounded by maxLong).
    * Then >= n rows sort at or below T, so any group whose LOWER bound —
    * -inf if the group holds a null — exceeds T cannot hold a top-n row.
    * Unreliable stats (NaN floats, statless types) are never skipped and
    * never enter S. Returns the keep mask; always a superset of the true
    * top n, for ANY physical row order. */
  def topNKeep(stats: Array[ChunkStats], rows: Array[Int], desc: Boolean,
      n: Int, isFloat: Boolean = false): Array[Boolean] = {
    // typed zone-map bounds in one sortable-long domain; NaN-bearing
    // float chunks never reach these (reliable=false filters them)
    def mnOf(st: ChunkStats): Long =
      if (isFloat) sortableLong(st.minDouble) else st.minLong
    def mxOf(st: ChunkStats): Long =
      if (isFloat) sortableLong(st.maxDouble) else st.maxLong
    val m = stats.length
    val keep = Array.fill(m)(true)
    // (bound used for T-selection, coverage rows, index) of reliable groups
    val eligible = (0 until m).filter(i => stats(i) == null || stats(i).reliable)
    if (!desc) {
      // upper bound of ALL rows in the group (nulls included): all-null
      // groups bound at -inf, otherwise the non-null max
      def upper(i: Int): (Int, Long) = stats(i) match {
        case null => NegInf
        case st if !st.hasValues => NegInf
        case st => (0, mxOf(st))
      }
      val byUpper = eligible.sortBy(upper)(Ordering.Tuple2[Int, Long])
      var covered = 0L
      var t: (Int, Long) = PosInf
      var chosen = false
      val it = byUpper.iterator
      while (it.hasNext && !chosen) {
        val i = it.next()
        covered += rows(i)
        if (covered >= n) { t = upper(i); chosen = true }
      }
      if (chosen) {
        def lower(i: Int): (Int, Long) = stats(i) match {
          case null => NegInf
          case st if !st.hasValues || st.nullCount > 0 => NegInf
          case st => (0, mnOf(st))
        }
        eligible.foreach { i =>
          if (!le(lower(i), t)) { keep(i) = false; topNSkipped.incrementAndGet() }
        }
      }
    } else {
      // DESC NULLS LAST: only non-null rows cover (nulls sort after
      // everything), bounded below by the non-null min
      def lowerNN(i: Int): (Int, Long) = stats(i) match {
        case null => PosInf // no non-null rows
        case st if !st.hasValues => PosInf
        case st => (0, mnOf(st))
      }
      def coverage(i: Int): Long = stats(i) match {
        case null => 0L
        case st if !st.hasValues => 0L
        case st => math.max(0L, rows(i).toLong - st.nullCount)
      }
      val byLower = eligible.sortBy(i => lowerNN(i))(
        Ordering.Tuple2[Int, Long].reverse)
      var covered = 0L
      var t: (Int, Long) = NegInf
      var chosen = false
      val it = byLower.iterator
      while (it.hasNext && !chosen) {
        val i = it.next()
        covered += coverage(i)
        if (covered >= n) { t = lowerNN(i); chosen = true }
      }
      if (chosen) {
        // group's upper bound over non-null rows; all-null groups sort
        // entirely after the covered non-null rows -> skippable
        def upperNN(i: Int): (Int, Long) = stats(i) match {
          case null => NegInf
          case st if !st.hasValues => NegInf
          case st => (0, mxOf(st))
        }
        eligible.foreach { i =>
          if (!le(t, upperNN(i))) { keep(i) = false; topNSkipped.incrementAndGet() }
        }
      }
    }
    keep
  }
}

/** the MemTable serve tail: freshly-ingested rows captured at planning,
  * shipped to the executor as serialized UnsafeRows in the scan's
  * required schema (GpxMemTable.capture — bounded by the memtable cap) */
final case class GpxMemPartition(rows: Array[Array[Byte]], numFields: Int)
  extends InputPartition

class GpxReaderFactory(required: StructType, rowBased: Boolean = false)
  extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean =
    !rowBased && !p.isInstanceOf[GpxMemPartition]

  /** row-based path (only when the scan carries merge-on-read masks):
    * materialize the split's ColumnarBatch once, then iterate it skipping
    * masked rows — the reader-side replay of the reference's visibility
    * bitmaps (RGVisibility.java:34-60) */
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    p match {
      case GpxMemPartition(rows, numFields) =>
        return new PartitionReader[InternalRow] {
          private var i = -1
          private val row =
            new org.apache.spark.sql.catalyst.expressions.UnsafeRow(numFields)
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            row.pointTo(rows(i), rows(i).length)
            row
          }
          override def close(): Unit = ()
        }
      case _ => ()
    }
    val part = p.asInstanceOf[GpxInputPartition]
    new PartitionReader[InternalRow] {
      private var batch: ColumnarBatch = _
      private var it: java.util.Iterator[InternalRow] = _
      private var idx = -1
      private var row: InternalRow = _
      private def masked(i: Int): Boolean = {
        val w = part.delWords
        w != null && (w(i >> 6) & (1L << (i & 63))) != 0L
      }
      override def next(): Boolean = {
        if (it == null) {
          val conf = new Configuration()
          batch = GpxFileReader.readSlices(part.path, conf, required,
            part.cols, part.numRows, part.commitTs,
            part.synth, part.pixelStarts, part.pixelCounts, part.constStr)
          it = batch.rowIterator()
        }
        while (it.hasNext) {
          row = it.next(); idx += 1
          if (!masked(idx)) return true
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = if (batch != null) batch.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[GpxInputPartition]
    new PartitionReader[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      private var consumed = false
      override def next(): Boolean = {
        if (consumed) return false
        val conf = new Configuration()
        batch = GpxFileReader.readSlices(part.path, conf, required,
          part.cols, part.numRows, part.commitTs,
          part.synth, part.pixelStarts, part.pixelCounts, part.constStr)
        consumed = true
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }
}

// ---------------- write path ----------------

class GpxWriteBuilder(schema: StructType, path: String, rgRows: Int,
    pxRows: Int, commitTs: Long, bucket: Option[GpxTable.BucketSpec],
    sortBy: Seq[String] = Seq.empty, tsColumn: Option[String] = None,
    range: Option[GpxTable.RangeSpec] = None,
    wantLog: Boolean = false, logDefer: Option[String] = None)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

    /** Sort clustering (ordered layout): declare the required write order
      * and let SPARK insert the sort — the planner fuses/elides it when
      * the incoming data is already ordered. Within-partition only: zone
      * map selectivity needs local runs, not a global order, so no range
      * shuffle is forced on the write. */
    override def requiredDistribution()
        : org.apache.spark.sql.connector.distributions.Distribution =
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()

    override def requiredOrdering()
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      sortBy.map { c =>
        org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)
      }.toArray

    override def toBatch: BatchWrite =
      new GpxBatchWrite(schema, path, doTruncate, rgRows, pxRows, commitTs,
        bucket, sortBy, tsColumn, range, wantLog, logDefer)

    /** Streaming sink (`writeStream.format("gpx")`): append one gpx file
      * per (epoch, partition) micro-batch slice — the streaming analog of
      * retina's continuous ingestion into pixels files (proto/retina.proto
      * write path). Epoch in the file name makes micro-batch retries
      * overwrite their own partial output instead of duplicating it. */
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      // complete mode arrives as truncate(): per-epoch truncation is not
      // implemented, and silently appending would duplicate every epoch
      require(!doTruncate,
        "gpx streaming sink supports outputMode(\"append\") only")
      new GpxStreamingWrite(schema, path, rgRows, pxRows, commitTs, wantLog)
    }
  }
}

/** Streaming sink write with an epoch-level commit protocol: tasks stage
  * their output under the underscore-hidden `_streaming/` dir with
  * per-ATTEMPT unique names (taskId), so a zombie attempt and its retry
  * can never interleave writes into one file; `commit(epochId)` on the
  * driver then renames the winning attempts' files to their final
  * `part-e<epoch>-<partition>.gpx` names. Readers never see task output
  * that didn't commit, and a crash mid-epoch leaves footer-less partials
  * only in staging (invisible to listFiles). Epoch REPLAY after a
  * restart re-commits the same epoch: the final-name existence check
  * makes that idempotent — the replayed duplicate is dropped, not
  * appended. Aborted/zombie leftovers are swept from staging at each
  * commit (they are never referenced by a commit message, so deleting
  * them is always safe). */
class GpxStreamingWrite(schema: StructType, path: String, rgRows: Int,
    pxRows: Int, commitTs: Long, wantLog: Boolean = false)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val staging = s"$path/_streaming"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    GpxStreamingWriterFactory(schema, staging, rgRows, pxRows, commitTs)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val rootP = new Path(path)
    val fs = rootP.getFileSystem(conf)
    // EPOCH-level idempotency marker (underscore name: invisible to the
    // table listing). Per-partition existence checks are not enough: a
    // replayed epoch can arrive with a DIFFERENT partition count, and the
    // extra partitions' files would publish alongside the originals —
    // duplicated rows. Marker present => the epoch fully committed once;
    // drop the whole replay. Marker absent but epoch files present => a
    // commit crashed mid-publish; delete those partials and re-publish
    // this attempt's complete set.
    val marker = new Path(rootP, s"_e$epochId.committed")
    if (fs.exists(marker)) {
      messages.foreach {
        case GpxStreamCommit(file, _) => fs.delete(new Path(file), false)
        case _ => ()
      }
    } else {
      // protocol routing: honor the routeWantLog decision captured at
      // builder time (explicit commitProtocol option > scheme capability),
      // re-checking isLogTable so a table another writer promoted to the
      // log mid-stream is not written through renames (safe direction
      // only — routeWantLog already refuses an explicit rename demotion)
      val logMode = wantLog || GpxCommitLog.isLogTable(path, conf)
      if (logMode) GpxCommitLog.enable(path, conf)
      if (!logMode && fs.exists(rootP))
        fs.listStatus(rootP).foreach { st =>
          if (st.getPath.getName.startsWith(s"part-e$epochId-"))
            fs.delete(st.getPath, false)
        }
      // log tables publish under ATTEMPT-unique names and NEVER pre-delete:
      // the committed head manifest still references the prior attempt's
      // files, and deleting or rewriting them in place (deterministic
      // names + non-atomic rename) would 404 a concurrent reader or serve
      // half-copied bytes under a cached footer. The epoch's Replace
      // retires the prior attempt's names atomically; vacuum reclaims
      // the bytes.
      val attemptTag =
        if (logMode) s"-a${java.util.UUID.randomUUID().toString.take(8)}"
        else ""
      val dests = scala.collection.mutable.ArrayBuffer.empty[String]
      messages.foreach {
        case GpxStreamCommit(file, partitionId) =>
          val src = new Path(file)
          val dest = new Path(rootP,
            s"part-e$epochId-$partitionId$attemptTag.gpx")
          // a missing staged file is DATA LOSS (external cleanup raced the
          // commit) — fail the epoch so the checkpoint does not advance
          if (!fs.exists(src) || !fs.rename(src, dest))
            throw new java.io.IOException(
              s"gpx streaming commit rename failed: $src -> $dest")
          dests += dest.toString
        case _ => ()
      }
      // commit-log sink table: one manifest commit per epoch, BEFORE the
      // idempotency marker — a crash in between replays the epoch, whose
      // Replace (drop any already-live files of this epoch, add this
      // attempt's set) converges to the same state
      if (logMode) {
        val prevEpoch = GpxCommitLog.head(path, conf).toSeq
          .flatMap(_.live.map(_.relPath))
          .filter(_.startsWith(s"part-e$epochId-")).toSet
        val entries = dests.toSeq.map(GpxCommitLog.entryFor(path, _, conf))
        GpxCommitLog.commit(path, conf,
          GpxCommitLog.Replace(entries, prevEpoch, Some(schema)))
      }
      fs.create(marker, true).close()
    }
    // sweep staged files of this and earlier epochs that no commit message
    // referenced: aborted attempts, zombies, pre-crash leftovers
    val stP = new Path(staging)
    if (fs.exists(stP)) fs.listStatus(stP).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("e")) {
        val ep = n.drop(1).takeWhile(_.isDigit)
        if (ep.nonEmpty && ep.toLong <= epochId) fs.delete(st.getPath, false)
      }
    }
    // markers are only consulted for REPLAYED epochs, which Spark's
    // checkpoint recovery bounds to the most recent batches (at most the
    // last two epochs per the WAL contract; the retention window is two
    // orders of magnitude wider for safety). A replay OLDER than the
    // window finds no marker — it then deletes that epoch's published
    // files first and re-publishes its own complete set, so the outcome
    // is replacement, not duplication; the window bounds marker-file
    // accumulation, not correctness.
    if (fs.exists(rootP)) fs.listStatus(rootP).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("_e") && n.endsWith(".committed")) {
        val ep = n.drop(2).takeWhile(_.isDigit)
        if (ep.nonEmpty &&
          ep.toLong < epochId - GpxStreamingWrite.CommittedMarkerRetentionEpochs)
          fs.delete(st.getPath, false)
      }
    }
    // every epoch is an append commit: invalidate token-gated artifacts
    GpxVersion.bump(path, conf)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = new Path(staging).getFileSystem(conf)
    messages.foreach {
      case GpxStreamCommit(file, _) => fs.delete(new Path(file), false)
      case _ => ()
    }
  }
}

object GpxStreamingWrite {
  /** how many epochs behind the head committed-epoch markers are kept for
    * replay idempotency before being swept (see commit() for why a
    * beyond-window replay is still replacement-safe) */
  val CommittedMarkerRetentionEpochs = 100
}

final case class GpxStreamCommit(file: String, partitionId: Int)
  extends WriterCommitMessage

final case class GpxStreamingWriterFactory(
    schema: StructType, staging: String, rgRows: Int, pxRows: Int, commitTs: Long)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    val conf = new Configuration()
    // taskId is the task ATTEMPT id: concurrent attempts of one partition
    // (speculation, zombie + retry) each write their own staged file
    val file = s"$staging/e$epochId-p$partitionId-t$taskId.gpx"
    val w = new GpxFileWriter(file, schema, conf, rgRows, pxRows, commitTs)
    new DataWriter[InternalRow] {
      override def write(record: InternalRow): Unit = w.addRow(record)
      override def commit(): WriterCommitMessage =
        { w.close(); GpxStreamCommit(file, partitionId) }
      override def abort(): Unit = w.abort()
      override def close(): Unit = ()
    }
  }
}

/** Batch write with a task-commit protocol: every task attempt stages its
  * files under the underscore-hidden `_batch_<opId>/` dir (names carry the
  * attempt's taskId, so a zombie attempt and its retry never touch the
  * same file), and the DRIVER's commit renames exactly the files named by
  * the winning attempts' commit messages into the table dir. Consequences
  * at scale: a multi-file INSERT becomes visible all-or-nothing (readers
  * listing mid-write see none of it), a speculative duplicate attempt can
  * never leave a duplicate row, and a crashed task can never leave a
  * footer-less partial at a visible name. opId in the final file names
  * keeps append batches from different writers/JVMs collision-free. */
class GpxBatchWrite(schema: StructType, path: String, truncate: Boolean,
    rgRows: Int, pxRows: Int, commitTs: Long, bucket: Option[GpxTable.BucketSpec],
    sortBy: Seq[String] = Seq.empty, tsColumn: Option[String] = None,
    range: Option[GpxTable.RangeSpec] = None,
    wantLog: Boolean = false, logDefer: Option[String] = None)
  extends BatchWrite {

  private val opId = java.util.UUID.randomUUID().toString.take(8)
  private val staging = s"$path/_batch_$opId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new Configuration()
    bucket.foreach(b => require(schema.fieldNames.contains(b.column),
      s"bucket column ${b.column}"))
    sortBy.foreach(c => require(schema.fieldNames.contains(c),
      s"sortBy column $c not in schema"))
    tsColumn.foreach(c => require(schema.fields.lastOption.exists(_.name == c) &&
      schema.fields.last.dataType == LongType,
      s"commitTsColumn $c must be the LAST column and LongType, got ${schema.toDDL}"))
    range.foreach(r => require(schema.fieldNames.contains(r.column) &&
      GpxTable.bucketableType(
        schema(schema.fieldIndex(r.column)).dataType),
      s"rangeBy column ${r.column} must be an integer-family schema column"))
    GpxWriterFactory(schema, staging, opId, rgRows, pxRows, commitTs, bucket,
      tsFromLastColumn = tsColumn.isDefined, range = range, sortBy = sortBy)
  }

  private def writeSidecars(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Unit = {
    fs.mkdirs(p)
    bucket.foreach { b =>
      val out = fs.create(new Path(p, "_bucketspec"), true)
      try out.write(s"${b.column}\n${b.numBuckets}".getBytes("UTF-8"))
      finally out.close()
    }
    if (sortBy.nonEmpty) {
      val out = fs.create(new Path(p, "_sortspec"), true)
      try out.write(sortBy.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    range.foreach { r =>
      val out = fs.create(new Path(p, "_rangespec"), true)
      try out.write(s"${r.column}\n${r.bounds.mkString(",")}".getBytes("UTF-8"))
      finally out.close()
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val rootP = new Path(path)
    val fs = rootP.getFileSystem(conf)
    // plain appends are lock-free (op-unique names, commutative); only
    // the destructive OVERWRITE serializes against other mutations
    if (truncate)
      GpxMutationLock.withLock(path, conf, "INSERT OVERWRITE commit") {
        commitInner(messages, conf, rootP, fs)
      }
    else commitInner(messages, conf, rootP, fs)
  }

  private def commitInner(messages: Array[WriterCommitMessage],
      conf: Configuration, rootP: Path, fs: org.apache.hadoop.fs.FileSystem): Unit = {
    // OVERWRITE: move superseded data + stale layout metadata into a
    // per-op trash dir inside staging FIRST (not delete — a publish
    // failure must be non-lossy), then write the new sidecars, then
    // publish: readers never evaluate a fresh bucket/sort spec against
    // the OLD files (which would mis-prune). The trash is deleted only
    // after every publish rename succeeded; the rollback path restores
    // it. The brief empty window is overwrite semantics; a JVM crash
    // mid-commit leaves the old files recoverable under _batch_<opId>/_old
    // instead of destroyed.
    // commit-log mode: visibility is manifest-gated (GpxCommitLog), so the
    // publish below needs NO atomic rename and NO trash dance — staged
    // files rename (or copy) into the table dir invisibly and ONE
    // conditional-put manifest commit flips the table state; superseded
    // files retire in the manifest and are reclaimed by vacuum, keeping
    // readers pinned to older versions alive. This is the object-store
    // protocol; the listing-based branch below stays the default where
    // rename IS atomic.
    val logMode = wantLog || GpxCommitLog.isLogTable(path, conf)
    if (logMode) GpxCommitLog.enable(path, conf)
    val trash = new Path(staging, "_old")
    val trashed = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    if (truncate && !logMode) {
      fs.mkdirs(trash)
      var seq = 0
      def toTrash(p: Path): Unit = if (fs.exists(p)) {
        val t = new Path(trash, s"$seq-${p.getName}"); seq += 1
        if (!fs.rename(p, t))
          throw new java.io.IOException(s"gpx overwrite trash move failed: $p")
        trashed += ((p, t))
      }
      // superseded files are listed HERE, under the mutation lock — a
      // planning-time snapshot would miss files a concurrent op published
      // between query start and commit (e.g. a COW delete's survivors),
      // leaving them to pollute the freshly overwritten table
      val supersededFiles =
        if (fs.exists(rootP)) GpxTable.listFiles(Seq(path), conf)
        else Seq.empty[String]
      supersededFiles.foreach(f => toTrash(new Path(f)))
      // _proj stays: overwrite makes every projection manifest STALE
      // (exact coverage check), so none serves until refresh() rebuilds
      // it — the projection DEFINITION survives the table reload, like
      // the reference's layout metadata
      Seq("_bucketspec", "_sortspec", "_rangespec", "_index")
        .foreach(n => toTrash(new Path(rootP, n)))
      // delete-bitmap sidecar dirs of superseded files' parents: the new
      // layout starts with no masked rows (stale bitmaps keyed by dead
      // file names must not linger)
      (supersededFiles.map(f => new Path(f).getParent).distinct :+ rootP)
        .distinct.foreach(par => toTrash(new Path(par, GpxDeleteBitmap.DelDir)))
    }
    writeSidecars(fs, rootP)
    // publish with rollback: without it, a rename failure mid-publish
    // followed by Spark's abort() (which clears staging, including the
    // trash) would leave a permanently half-applied INSERT with the old
    // data discarded
    val published = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    try {
      messages.foreach {
        case GpxCommit(files) => files.foreach { f =>
          val src = new Path(f)
          val dest = new Path(rootP, src.getName)
          if (!fs.rename(src, dest))
            throw new java.io.IOException(
              s"gpx batch commit rename failed: $src -> $dest")
          published += ((dest, src))
        }
        case _ => ()
      }
    } catch {
      case e: Throwable =>
        published.reverseIterator.foreach { case (dest, src) =>
          try fs.rename(dest, src) catch { case _: Throwable => () }
        }
        // restore the trashed originals (fresh same-name sidecars are
        // removed first so the renames cannot collide)
        trashed.reverseIterator.foreach { case (orig, t) =>
          try {
            if (fs.exists(orig)) fs.delete(orig, true)
            fs.rename(t, orig)
          } catch { case _: Throwable => () }
        }
        throw e
    }
    if (logMode) {
      val destFiles = published.map(_._1.toString).toSeq
      logDefer match {
        case Some(token) =>
          // compound operation (COW rewrite): the outer op folds these
          // files into its single Replace commit — no state change here
          GpxCommitLog.deferAdd(token, destFiles)
        case None =>
          val entries = destFiles.map(GpxCommitLog.entryFor(path, _, conf))
          // the schema the FILES physically carry (commitTsColumn routing
          // strips the trailing ts column before the writers see rows)
          val fileSchema = if (tsColumn.isDefined)
            StructType(schema.fields.dropRight(1)) else schema
          if (truncate)
            GpxCommitLog.commit(path, conf,
              GpxCommitLog.Overwrite(entries, bucket, sortBy, range,
                Some(fileSchema)))
          else
            GpxCommitLog.commit(path, conf,
              GpxCommitLog.Append(entries, bucket, sortBy, range,
                Some(fileSchema)))
      }
    }
    fs.delete(new Path(staging), true)
    // layout-version token: invalidate token-gated artifacts (projection
    // manifests, index manifests, the delete-marker fast path). OVERWRITE
    // trashed the _del dirs, so its marker recomputes exactly (under the
    // lock this branch holds); appends preserve the marker.
    if (truncate && !logMode) GpxVersion.recomputeDeletes(path, conf)
    else GpxVersion.bump(path, conf)
    // projection maintenance (Projections.java economics): with
    // spark.graft.gpx.projectionAutoRefresh=true, every committed write
    // brings the table's projections up to date — O(inserted data) for
    // appends, full rebuild after overwrite. Best-effort by design: a
    // refresh failure leaves the projection stale, which the exact
    // coverage check turns into a silent base-scan fallback, never a
    // wrong answer.
    val auto = try org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.gpx.projectionAutoRefresh").contains("true")
    catch { case _: Throwable => false }
    if (auto) GpxProjection.listProjections(path, conf).foreach { p =>
      try GpxProjection.refresh(org.apache.spark.sql.SparkSession.active, path, p)
      catch { case scala.util.control.NonFatal(_) => () } // stale = fallback
    }
    // same economics for point indexes: appends index only the new files
    // (GpxPointIndex.refresh); overwrite rebuilds. Best-effort — a stale
    // index fails its token check and lookups fall back to scans.
    val idxAuto = try org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.gpx.indexAutoRefresh").contains("true")
    catch { case _: Throwable => false }
    if (idxAuto)
      try GpxPointIndex.refreshAll(org.apache.spark.sql.SparkSession.active, path)
      catch { case scala.util.control.NonFatal(_) => () }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val stP = new Path(staging)
    stP.getFileSystem(conf).delete(stP, true)
  }
}

final case class GpxCommit(files: Seq[String]) extends WriterCommitMessage

final case class GpxWriterFactory(schema: StructType, staging: String,
    opId: String, rgRows: Int, pxRows: Int, commitTs: Long,
    bucket: Option[GpxTable.BucketSpec], tsFromLastColumn: Boolean = false,
    range: Option[GpxTable.RangeSpec] = None,
    sortBy: Seq[String] = Nil)
  extends DataWriterFactory {

  /** final-name uniqueness: opId scopes this logical write (taskIds can
    * repeat across JVMs appending to the same table), taskId scopes the
    * attempt within it, and the commitTs tag keeps append-mode MVCC
    * batches self-describing. The bucket (-bN) / range (-rN) routing
    * suffix stays LAST (pruning parses the name tail). */
  private def fileName(partitionId: Int, taskId: Long, ts: Long, bk: Int): String = {
    val tsTag = if (ts >= 0) s"-t$ts" else ""
    val tag = if (bk < 0) "" else if (range.isDefined) s"-r$bk" else s"-b$bk"
    s"part-$opId-$partitionId-$taskId$tsTag$tag.gpx"
  }

  /** file schema: with `tsFromLastColumn` (option("commitTsColumn", c)) the
    * incoming rows carry the per-row commit ts as their LAST field; files
    * store only the data fields, and each row routes to the writer of its
    * own ts — ONE job rewrites a multi-version (compacted) file set with
    * every row group keeping its original MVCC stamp. */
  private val dataSchema: StructType =
    if (tsFromLastColumn) StructType(schema.fields.dropRight(1)) else schema

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val conf = new Configuration()
    val tsIdx = schema.length - 1 // only read when tsFromLastColumn
    val routeCol = bucket.map(_.column).orElse(range.map(_.column))
    val keyIdx = routeCol.map(dataSchema.fieldIndex)
    val keyDt = keyIdx.map(dataSchema(_).dataType)
    // routed writes: one writer per (commitTs, bucket-or-range id) — a
    // plain append has exactly one key, so the map degenerates to one
    val writers =
      scala.collection.mutable.LinkedHashMap.empty[(Long, Int), (String, GpxFileWriter)]

    def bucketOfRow(record: InternalRow): Int =
      GpxTable.routeOfRow(record, keyIdx, keyDt, bucket, range)

    def writerFor(ts: Long, bk: Int): GpxFileWriter =
      writers.getOrElseUpdate((ts, bk), {
        val file = s"$staging/${fileName(partitionId, taskId, ts, bk)}"
        // sort clustering in effect => the task's rows arrive sorted
        // (Spark inserts the sort for requiredOrdering) and every routed
        // writer sees an ordered subsequence — stamp the footer claim
        (file, new GpxFileWriter(file, dataSchema, conf, rgRows, pxRows, ts,
          sortedBy = sortBy))
      })._2

    new DataWriter[InternalRow] {
      override def write(record: InternalRow): Unit = {
        val ts =
          if (!tsFromLastColumn) commitTs
          else if (record.isNullAt(tsIdx)) -1L
          else record.getLong(tsIdx)
        // dataSchema is a prefix of the row layout: addRow reads only the
        // first dataSchema.length ordinals, so no projection is needed
        writerFor(ts, bucketOfRow(record)).addRow(record)
      }
      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._2.close())
        GpxCommit(writers.values.map(_._1).toSeq)
      }
      override def abort(): Unit = writers.values.foreach(_._2.abort())
      override def close(): Unit = ()
    }
  }
}
