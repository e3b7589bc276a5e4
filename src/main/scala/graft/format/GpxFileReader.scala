package graft.format

import GpxFormat._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import java.io.{ByteArrayInputStream, DataInputStream}
import java.util.concurrent.atomic.AtomicLong

/** Reads gpx files: footer parse (with a driver-side cache), zone-map
  * row-group AND pixel skipping, vectorized pixel-segment materialization
  * into Spark OnHeapColumnVectors (reference analog:
  * PixelsRecordReaderImpl.java:319-451 — file/row-group/pixel stats checks
  * then vectorized read of included columns). */
object GpxFileReader {

  /** observability: actual footer parses (cache misses) / pixel segments
    * decoded — FormatSpec asserts planning is cache-served and selective
    * scans decode fewer pixels */
  val footerReads = new AtomicLong(0)
  val pixelsDecoded = new AtomicLong(0)
  val dictColumnsFilled = new AtomicLong(0)
  /** actual data-page bytes read from the filesystem (chunk-cache misses
    * and uncached reads) — the warm-rescan gate asserts this stays flat */
  val dataBytesRead = new AtomicLong(0)

  /** Executor-local column-chunk cache: bounded byte-LRU over ENCODED
    * pixel-segment byte ranges keyed (path, offset, length) — the
    * Spark-idiomatic analog of the reference's shared-memory chunk cache
    * keyed (file, rowGroup, column) with its radix index
    * (pixels-cache/.../PixelsCacheReader.java). A repeated interactive
    * query over a gpx table serves its data pages from here with ZERO
    * filesystem data reads, without the user persisting a DataFrame.
    *
    * Validity mirrors FooterCache's discipline: one stat per readSlices
    * call; a (len, mtime) change purges the file's entries. Files still
    * inside their mtime tick (now - mtime < RaceWindowMs) are never
    * cached — an in-place same-length rewrite within the tick would be
    * undetectable; once the tick is past, any rewrite bumps (len, mtime).
    * Entries larger than 1/8 of the budget bypass the cache (one wide
    * binary chunk must not evict the whole working set). Sized by
    * -Dgraft.gpx.chunkCacheBytes (0 disables; default 128 MiB per JVM —
    * an executor-local working set, not a query-scoped buffer). */
  object ChunkCache {
    private val RaceWindowMs = 2000L
    @volatile var budgetBytes: Long =
      sys.props.get("graft.gpx.chunkCacheBytes").map(_.toLong)
        .getOrElse(128L << 20)
    val hits = new AtomicLong(0)
    val misses = new AtomicLong(0)

    final case class Validity(len: Long, mtime: Long)
    private val valid =
      new java.util.concurrent.ConcurrentHashMap[String, Validity]
    private val lock = new Object
    private var totalBytes = 0L
    private val entries =
      new java.util.LinkedHashMap[(String, Long, Int), Array[Byte]](
        1024, 0.75f, true)

    def clear(): Unit = lock.synchronized {
      entries.clear(); totalBytes = 0L; valid.clear()
    }

    private[graft] def retainedBytes: Long = lock.synchronized(totalBytes)

    /** May `path`'s segments be served from / inserted into the cache?
      * Returns the file's validity TOKEN (null = not cacheable), which
      * `put` requires so a reader that validated BEFORE an in-place
      * rewrite cannot insert its stale bytes AFTER the rewrite's purge
      * (validate -> rewrite+purge -> put is the TOCTOU this closes).
      * Purges stale entries as a side effect of a (len, mtime) change. */
    def validate(path: String, len: Long, mtime: Long): Validity = {
      if (budgetBytes <= 0) return null
      lock.synchronized {
        val v = valid.get(path)
        if (v != null && v.len == len && v.mtime == mtime) return v
        if (v != null) purgeLocked(path)
        if (System.currentTimeMillis() - mtime < RaceWindowMs) return null
        // validity tokens are NOT evicted with their byte entries (purge
        // is keyed on rewrite, eviction on budget), so a long-lived
        // executor streaming over ever-new immutable files would grow
        // `valid` without bound: sweep tokens whose paths hold no bytes
        // once the map outnumbers the cached path set substantially. A
        // swept token only costs its in-flight readers their put (token
        // mismatch), never correctness.
        if (valid.size > 1024) {
          val live = new java.util.HashSet[String]()
          entries.keySet.forEach(k => { live.add(k._1); () })
          if (valid.size > 2 * live.size + 1024)
            valid.keySet.removeIf(p => !live.contains(p))
        }
        val nv = Validity(len, mtime)
        valid.put(path, nv)
        nv
      }
    }

    private def purgeLocked(path: String): Unit = {
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == path) { totalBytes -= e.getValue.length; it.remove() }
      }
      valid.remove(path)
      ()
    }

    def get(path: String, offset: Long, length: Int): Array[Byte] =
      lock.synchronized(entries.get((path, offset, length)))

    def put(path: String, offset: Long, length: Int, bytes: Array[Byte],
        tok: Validity): Unit =
      lock.synchronized {
        // the file was purged or re-validated under a different (len,
        // mtime) since this reader's validate: its bytes are stale
        if (tok == null || valid.get(path) != tok) return
        if (bytes.length > budgetBytes / 8) return
        val k = (path, offset, length)
        if (entries.containsKey(k)) return
        entries.put(k, bytes)
        totalBytes += bytes.length
        val it = entries.entrySet().iterator()
        while (totalBytes > budgetBytes && it.hasNext) {
          val e = it.next()
          totalBytes -= e.getValue.length
          it.remove()
        }
      }
  }

  /** trailer of a gpx file: serialized-footer length + its content id */
  final case class Tail(footerLen: Int, fileId: Long)

  /** 16-byte tail read: (footerLen, fileId) — the cheap content check */
  def readTail(path: String, conf: Configuration, len: Long): Tail = {
    val hPath = new Path(path)
    val in = hPath.getFileSystem(conf).open(hPath)
    try {
      in.seek(len - TrailerLen)
      val tail = new Array[Byte](TrailerLen)
      in.readFully(tail)
      val td = new DataInputStream(new ByteArrayInputStream(tail))
      val footerLen = td.readInt()
      val fileId = td.readLong()
      val magic = new Array[Byte](4); td.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic), s"not a gpx file: $path")
      Tail(footerLen, fileId)
    } finally in.close()
  }

  def readFooter(path: String, conf: Configuration): Footer =
    readFooterWithId(path, conf)._1

  def readFooterWithId(path: String, conf: Configuration): (Footer, Long) = {
    footerReads.incrementAndGet()
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(conf)
    val len = GpxFs.stat(path, conf)
      .getOrElse(throw new java.io.FileNotFoundException(path)).len
    // ONE open for trailer + footer (two seeks on the same stream): a
    // second open per cache miss doubles cold-planning round trips on
    // object stores, where open is a HEAD/GET-class request
    val in = fs.open(hPath)
    try {
      in.seek(len - TrailerLen)
      val tailBytes = new Array[Byte](TrailerLen)
      in.readFully(tailBytes)
      val td = new DataInputStream(new ByteArrayInputStream(tailBytes))
      val footerLen = td.readInt()
      val fileId = td.readLong()
      val magic = new Array[Byte](4); td.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic), s"not a gpx file: $path")
      in.seek(len - TrailerLen - footerLen)
      val fb = new Array[Byte](footerLen)
      in.readFully(fb)
      (GpxFormat.readFooter(new DataInputStream(new ByteArrayInputStream(fb))),
        fileId)
    } finally in.close()
  }

  /** Driver-side footer cache keyed by path and validated by (length,
    * mtime) — repeated queries over the same table plan without re-reading
    * any footer bytes (the reference keeps these stats in a metadata
    * service, proto/metadata.proto:33-45; a single-process cache is the
    * Spark-driver equivalent).
    *
    * (length, mtime) alone cannot see a same-length rewrite landing within
    * one mtime tick of the original write, so entries cached inside the
    * `RaceWindowMs` of their file's mtime are additionally revalidated by
    * the 16-byte trailer content id on every hit; entries whose mtime tick
    * was safely in the past when cached (any later rewrite must bump mtime)
    * serve with zero I/O beyond the stat. Bounded by LRU eviction. */
  object FooterCache {
    private final case class Entry(
        len: Long, mtime: Long, fileId: Long, cachedAt: Long, footer: Footer)

    /** mtime granularity + clock-skew safety margin */
    private val RaceWindowMs = 2000L
    /** visible for tests (LRU eviction spec) */
    @volatile var capacity = 65536
    /** observability for specs: tail revalidation reads on cache hits */
    val tailChecks = new AtomicLong(0)

    private val cache = java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Entry](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Entry]): Boolean =
          size() > capacity
      })

    def clear(): Unit = cache.clear()

    def get(path: String, conf: Configuration): Footer = {
      val st = GpxFs.stat(path, conf)
        .getOrElse(throw new java.io.FileNotFoundException(path))
      val cached = cache.get(path)
      if (cached != null && cached.len == st.len && cached.mtime == st.mtime) {
        if (cached.cachedAt - st.mtime >= RaceWindowMs) return cached.footer
        // entry was cached within the file's mtime tick: an in-place
        // same-length rewrite could hide behind identical (len, mtime) —
        // revalidate content via the 16-byte trailer id
        tailChecks.incrementAndGet()
        if (readTail(path, conf, st.len).fileId == cached.fileId) {
          // once the mtime tick is safely past, no future natural rewrite
          // can reuse it — upgrade the entry so later hits skip the check
          val now = System.currentTimeMillis()
          if (now - st.mtime >= RaceWindowMs)
            cache.put(path, cached.copy(cachedAt = now))
          return cached.footer
        }
      }
      val (footer, fileId) = readFooterWithId(path, conf)
      cache.put(path, Entry(st.len, st.mtime, fileId, System.currentTimeMillis(), footer))
      footer
    }

    /** Footer of an IMMUTABLE file whose expected length the caller
      * already knows (a commit-log manifest entry: log-mode files are
      * never rewritten in place — every mutation writes a NEW name and a
      * new manifest). A cached entry matching the manifest's length serves
      * with ZERO filesystem calls — no stat, no tail check — which is what
      * makes warm planning O(manifest) instead of O(files) metadata
      * round-trips on an object store. */
    def getImmutable(path: String, len: Long, conf: Configuration): Footer = {
      val cached = cache.get(path)
      if (cached != null && cached.len == len) cached.footer
      else get(path, conf)
    }
  }

  /** Zone-map check at row-group granularity (chunk stats). */
  def mayMatch(filter: Filter, schema: StructType, rg: RowGroupMeta): Boolean =
    mayMatchStats(filter, schema, rg.numRows,
      i => if (i < rg.chunks.length) Some(rg.chunks(i).stats) else None)

  /** Zone-map check at pixel granularity (pixel p's stats). */
  def mayMatchPixel(filter: Filter, schema: StructType, rg: RowGroupMeta, p: Int): Boolean =
    mayMatchStats(filter, schema,
      rg.chunks.headOption.flatMap(c => c.pixels.lift(p)).map(_.rows).getOrElse(rg.numRows),
      i => if (i < rg.chunks.length && p < rg.chunks(i).pixels.length)
        Some(rg.chunks(i).pixels(p).stats) else None)

  /** Can a row range with these stats possibly satisfy the filter?
    * Conservative — unknown filters/columns answer true
    * (reference PixelsPredicate.matches, PixelsPredicate.java:32-96). */
  private def mayMatchStats(
      filter: Filter,
      schema: StructType,
      numRows: Int,
      statsAt: Int => Option[ChunkStats]): Boolean = {
    // hoisted: StructType.fieldNames allocates a fresh array per call,
    // and statsOf runs once per filter node per value — on the driver's
    // planning hot path at large file counts
    val names = schema.fieldNames
    mayMatchBy(filter, numRows.toLong, col => {
      // columns absent from the file schema (e.g. the synthetic
      // _commit_ts) have no stats: conservative keep
      val i = names.indexOf(col)
      if (i < 0) None else statsAt(i).map((_, schema(i).dataType))
    })
  }

  /** FILE-level zone-map check over NAME-keyed stats (commit-log manifest
    * entries): data types resolve from the table schema — safe because
    * manifest stats are written from footers whose physical storage class
    * (long-backed / double / string) matches any widened table type. */
  def mayMatchNamed(filter: Filter, tableSchema: StructType, numRows: Long,
      stats: String => Option[ChunkStats]): Boolean = {
    val names = tableSchema.fieldNames // hoisted: fresh array per call
    mayMatchBy(filter, numRows, col => for {
      st <- stats(col)
      i = names.indexOf(col)
      if i >= 0
    } yield (st, tableSchema(i).dataType))
  }

  private def mayMatchBy(
      filter: Filter,
      numRows: Long,
      statsOf: String => Option[(ChunkStats, DataType)]): Boolean = {
    def cmpBounds(col: String, v: Any)(test: (Int, Int) => Boolean): Boolean =
      statsOf(col) match {
        case Some((s, _)) if !s.reliable => true // stats unusable: keep
        case Some((s, dt)) if s.hasValues =>
          boundsFor(v, dt, s) match {
            case Some((cmpMin, cmpMax)) => test(cmpMin, cmpMax)
            case None => true
          }
        case Some(_) =>
          // reliable && !hasValues => genuinely all-null range: value
          // comparisons can never match
          false
        case None => true
      }
    filter match {
      case EqualTo(c, v) => cmpBounds(c, v)((mn, mx) => mn <= 0 && mx >= 0)
      case GreaterThan(c, v) => cmpBounds(c, v)((_, mx) => mx > 0)
      case GreaterThanOrEqual(c, v) => cmpBounds(c, v)((_, mx) => mx >= 0)
      case LessThan(c, v) => cmpBounds(c, v)((mn, _) => mn < 0)
      case LessThanOrEqual(c, v) => cmpBounds(c, v)((mn, _) => mn <= 0)
      case In(c, vs) => vs.isEmpty ||
        vs.exists(v => cmpBounds(c, v)((mn, mx) => mn <= 0 && mx >= 0))
      case IsNull(c) => statsOf(c).forall(_._1.nullCount > 0)
      case IsNotNull(c) => statsOf(c).forall { case (s, _) =>
        s.hasValues || s.nullCount < numRows }
      case And(l, r) => mayMatchBy(l, numRows, statsOf) &&
        mayMatchBy(r, numRows, statsOf)
      case Or(l, r) => mayMatchBy(l, numRows, statsOf) ||
        mayMatchBy(r, numRows, statsOf)
      case _ => true
    }
  }

  /** Returns (sign(cmp(min, v)), sign(cmp(max, v))) when stats are
    * comparable to the literal, else None. */
  private def boundsFor(v: Any, dt: DataType, s: ChunkStats): Option[(Int, Int)] = {
    def longOf(x: Any): Option[Long] = x match {
      case b: Boolean => Some(if (b) 1L else 0L)
      case b: Byte => Some(b.toLong)
      case sh: Short => Some(sh.toLong)
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case t: java.sql.Timestamp =>
        Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case t: java.time.Instant =>
        Some(t.getEpochSecond * 1000000L + t.getNano / 1000)
      case t: java.time.LocalDateTime =>
        Some(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000)
      case _ => None
    }
    dt match {
      case _ if isLongBacked(dt) && !dt.isInstanceOf[DecimalType] =>
        longOf(v).map(l =>
          (java.lang.Long.compare(s.minLong, l).sign, java.lang.Long.compare(s.maxLong, l).sign))
      case FloatType | DoubleType =>
        val dv = v match {
          case f: Float => Some(f.toDouble)
          case d: Double => Some(d)
          case _ => None
        }
        dv.map(x =>
          (java.lang.Double.compare(s.minDouble, x).sign, java.lang.Double.compare(s.maxDouble, x).sign))
      case StringType =>
        v match {
          // string stats are truncated to 64 chars at write; only trust
          // them when they are short enough to be exact
          case str: String if s.minString.length < 64 && s.maxString.length < 64 =>
            // UTF-8 binary order — the order Spark compares strings in
            // and the order the writer computed these bounds in
            val q = org.apache.spark.unsafe.types.UTF8String.fromString(str)
            Some((org.apache.spark.unsafe.types.UTF8String
                .fromString(s.minString).compareTo(q).sign,
              org.apache.spark.unsafe.types.UTF8String
                .fromString(s.maxString).compareTo(q).sign))
          case _ => None
        }
      case _ => None
    }
  }

  /** One pixel segment to read: absolute file offset, byte length, rows. */
  final case class PixelSlice(offset: Long, length: Int, rows: Int)

  /** synthetic-column kinds for [[readSlices]]' `synth` array */
  val SynthData: Byte = 0
  val SynthCommitTs: Byte = 1
  val SynthFile: Byte = 2
  val SynthPos: Byte = 3
  val SynthAbsent: Byte = 4
  /** constant string filled from the split's `constStr` (e.g. the change
    * feed's `_change_type`) */
  val SynthConst: Byte = 5

  /** Materialize a self-contained split: for each output column either a
    * run of pixel slices (in row order) or a synthetic column filled from
    * the split itself — `constLong` (the hidden _commit_ts), the file path
    * (_file), or the absolute file row position (_pos, enumerated from
    * `pixelStarts`/`pixelCounts`). With `synth` null the legacy encoding
    * applies: cols(i)==null => constant (by dtype), empty => absent-column
    * nulls. The executor touches ONLY the slice byte ranges — no footer
    * access. */
  def readSlices(
      path: String,
      conf: Configuration,
      outSchema: StructType,
      cols: Array[Array[PixelSlice]],
      numRows: Int,
      constLong: Long,
      synth: Array[Byte] = null,
      pixelStarts: Array[Long] = null,
      pixelCounts: Array[Int] = null,
      constStr: String = null): ColumnarBatch = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(conf)
    // chunk-cache validity: one stat per split read; a fully-cached split
    // never opens the file at all (the zero-data-read warm path)
    val cacheTok: ChunkCache.Validity =
      if (ChunkCache.budgetBytes <= 0) null
      else GpxFs.stat(path, conf) match {
        case Some(st) => ChunkCache.validate(path, st.len, st.mtime)
        case None => null
      }
    val cacheable = cacheTok != null
    var in: org.apache.hadoop.fs.FSDataInputStream = null
    def stream(): org.apache.hadoop.fs.FSDataInputStream = {
      if (in == null) in = fs.open(hPath)
      in
    }
    try {
      val vectors = OnHeapColumnVector.allocateColumns(numRows, outSchema)
      var oi = 0
      while (oi < cols.length) {
        val slices = cols(oi)
        val kind: Byte =
          if (synth != null) synth(oi)
          else if (slices == null) {
            if (outSchema(oi).dataType == StringType) SynthFile else SynthCommitTs
          } else if (slices.isEmpty) SynthAbsent
          else SynthData
        if (kind == SynthFile || kind == SynthConst) {
          val bytes =
            (if (kind == SynthFile) path else constStr).getBytes("UTF-8")
          var k = 0
          while (k < numRows) {
            vectors(oi).putByteArray(k, bytes, 0, bytes.length)
            k += 1
          }
        } else if (kind == SynthCommitTs) {
          vectors(oi).putLongs(0, numRows, constLong)
        } else if (kind == SynthPos) {
          // absolute row positions: one increasing run per kept pixel
          var row = 0
          var px = 0
          while (px < pixelStarts.length) {
            var j = 0
            val start = pixelStarts(px)
            val cnt = pixelCounts(px)
            while (j < cnt) {
              vectors(oi).putLong(row, start + j)
              row += 1; j += 1
            }
            px += 1
          }
        } else if (kind == SynthAbsent) {
          // column absent from this file (schema evolution): all nulls
          vectors(oi).putNulls(0, numRows)
        } else {
          // gather per-segment buffers: cache-served where valid, the
          // misses with coalesced reads (adjacent UNCACHED slices only)
          val segBufs = new Array[Array[Byte]](slices.length)
          var anyMiss = false
          if (cacheable) {
            var ci = 0
            while (ci < slices.length) {
              val b = ChunkCache.get(path, slices(ci).offset, slices(ci).length)
              if (b != null) { segBufs(ci) = b; ChunkCache.hits.incrementAndGet() }
              else { anyMiss = true; ChunkCache.misses.incrementAndGet() }
              ci += 1
            }
          } else anyMiss = true
          var si = 0
          while (anyMiss && si < slices.length) {
            if (segBufs(si) != null) si += 1
            else {
              // coalesce adjacent uncached slices into one read
              var sj = si
              var runLen = 0L
              while (sj < slices.length && segBufs(sj) == null &&
                slices(sj).offset == slices(si).offset + runLen) {
                runLen += slices(sj).length
                sj += 1
              }
              val buf = new Array[Byte](runLen.toInt)
              stream().seek(slices(si).offset)
              stream().readFully(buf)
              GpxFileReader.dataBytesRead.addAndGet(runLen)
              var off = 0
              var sk = si
              while (sk < sj) {
                segBufs(sk) = java.util.Arrays.copyOfRange(buf, off, off + slices(sk).length)
                if (cacheable)
                  ChunkCache.put(path, slices(sk).offset, slices(sk).length,
                    segBufs(sk), cacheTok)
                off += slices(sk).length
                sk += 1
              }
              si = sj
            }
          }
          val dt = outSchema(oi).dataType
          // encoded-vector fast path (enableEncodedColumnVector analog,
          // PixelsReaderOption.java:35): all-dict string chunks feed
          // Spark's dictionary ColumnVector — per row just an int id, no
          // per-row byte copies
          val allDict = (dt == StringType || dt == BinaryType) &&
            segBufs.forall(b => b.nonEmpty && b(0) == EncDictString)
          if (allDict) fillDictColumn(segBufs, slices, vectors(oi))
          else {
            var rowBase = 0
            var elemBase = 0
            var sk = 0
            while (sk < segBufs.length) {
              elemBase = decodeSegment(
                new DataInputStream(new ByteArrayInputStream(segBufs(sk))),
                dt, slices(sk).rows, vectors(oi), rowBase, elemBase)
              pixelsDecoded.incrementAndGet()
              rowBase += slices(sk).rows
              sk += 1
            }
          }
        }
        oi += 1
      }
      new ColumnarBatch(
        vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]],
        numRows)
    } finally if (in != null) in.close()
  }

  /** Dictionary entries of all of one column's dict segments, combined
    * with per-segment id offsets — backs Spark's dictionary ColumnVector. */
  private final class GpxByteDictionary(entries: Array[Array[Byte]])
    extends org.apache.spark.sql.execution.vectorized.Dictionary {
    override def decodeToBinary(id: Int): Array[Byte] = entries(id)
    override def decodeToInt(id: Int): Int = throw new UnsupportedOperationException
    override def decodeToLong(id: Int): Long = throw new UnsupportedOperationException
    override def decodeToFloat(id: Int): Float = throw new UnsupportedOperationException
    override def decodeToDouble(id: Int): Double = throw new UnsupportedOperationException
  }

  /** All-dict string column: combine segment dictionaries (offset ids) and
    * write only int ids per row. */
  private def fillDictColumn(
      segBufs: Array[Array[Byte]],
      slices: Array[PixelSlice],
      v: OnHeapColumnVector): Unit = {
    val entries = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val totalRows = slices.map(_.rows).sum
    val ids = v.reserveDictionaryIds(totalRows)
    var rowBase = 0
    var s = 0
    while (s < segBufs.length) {
      val d = new DataInputStream(new ByteArrayInputStream(segBufs(s)))
      val rows = slices(s).rows
      d.readByte() // EncDictString
      val nullCount = d.readInt()
      val isNull = new Array[Boolean](rows)
      if (nullCount > 0) {
        val bm = new Array[Byte]((rows + 7) / 8)
        d.readFully(bm)
        var k = 0
        while (k < rows) { isNull(k) = (bm(k >> 3) & (1 << (k & 7))) != 0; k += 1 }
      }
      d.readInt() // dataLen
      val dictSize = d.readInt()
      val base = entries.length
      var e = 0
      while (e < dictSize) {
        val len = d.readInt(); val a = new Array[Byte](len); d.readFully(a)
        entries += a
        e += 1
      }
      var k = 0
      while (k < rows) {
        val idx = d.readInt()
        if (isNull(k)) { v.putNull(rowBase + k); ids.putInt(rowBase + k, 0) }
        else ids.putInt(rowBase + k, base + idx)
        k += 1
      }
      pixelsDecoded.incrementAndGet()
      rowBase += rows
      s += 1
    }
    v.setDictionary(new GpxByteDictionary(entries.toArray))
    dictColumnsFilled.incrementAndGet()
  }

  /** Decode one pixel segment into `v` starting at row `rowBase`; returns
    * the updated array-element append position (numeric-array columns). */
  private def decodeSegment(
      d: DataInputStream,
      dt: DataType,
      numRows: Int,
      v: OnHeapColumnVector,
      rowBase: Int,
      elemBase: Int): Int = {
    val encoding = d.readByte()
    val nullCount = d.readInt()
    val isNull = new Array[Boolean](numRows)
    if (nullCount > 0) {
      val bm = new Array[Byte]((numRows + 7) / 8)
      d.readFully(bm)
      var k = 0
      while (k < numRows) {
        isNull(k) = (bm(k >> 3) & (1 << (k & 7))) != 0
        k += 1
      }
    }
    val dataLen = d.readInt()

    // XOR segments are bit-packed: slurp the payload and bit-read it
    def decodeXor(w: Int)(put: (Int, Long) => Unit): Unit = {
      val buf = new Array[Byte](dataLen)
      d.readFully(buf)
      XorCodec.decode(buf, numRows, w)(put)
    }

    // decode into a longs array for the integer family
    def decodeLongs(): Array[Long] = {
      val out = new Array[Long](numRows)
      if (encoding == EncRleLong) {
        var k = 0
        while (k < numRows) {
          val value = d.readLong(); val run = d.readInt()
          var j = 0
          while (j < run) { out(k + j) = value; j += 1 }
          k += run
        }
      } else if (encoding == EncForPacked) {
        val base = d.readLong()
        val width = d.readByte()
        var k = 0
        while (k < numRows) {
          val delta = width match {
            case 1 => (d.readByte() & 0xffL)
            case 2 => (d.readShort() & 0xffffL)
            case 4 => (d.readInt() & 0xffffffffL)
          }
          out(k) = base + delta
          k += 1
        }
      } else if (encoding == EncDeltaLong) {
        var prev = d.readLong()
        val base = d.readLong()
        val width = d.readByte()
        out(0) = prev
        var k = 1
        while (k < numRows) {
          val delta = width match {
            case 1 => (d.readByte() & 0xffL)
            case 2 => (d.readShort() & 0xffffL)
            case 4 => (d.readInt() & 0xffffffffL)
          }
          prev += base + delta
          out(k) = prev
          k += 1
        }
      } else {
        var k = 0
        while (k < numRows) { out(k) = d.readLong(); k += 1 }
      }
      out
    }

    var newElemBase = elemBase
    dt match {
      case _ if isLongBacked(dt) =>
        val vals = decodeLongs()
        var k = 0
        while (k < numRows) {
          if (isNull(k)) v.putNull(rowBase + k)
          else dt match {
            case BooleanType => v.putBoolean(rowBase + k, vals(k) != 0L)
            case ByteType => v.putByte(rowBase + k, vals(k).toByte)
            case ShortType => v.putShort(rowBase + k, vals(k).toShort)
            case IntegerType | DateType => v.putInt(rowBase + k, vals(k).toInt)
            case LongType | TimestampType | TimestampNTZType => v.putLong(rowBase + k, vals(k))
            case dec: DecimalType =>
              v.putDecimal(rowBase + k,
                org.apache.spark.sql.types.Decimal.createUnsafe(vals(k), dec.precision, dec.scale),
                dec.precision)
            case _ => throw new IllegalStateException(dt.toString)
          }
          k += 1
        }
      case FloatType =>
        if (encoding == EncXorFloat) {
          decodeXor(32) { (k, bits) =>
            if (isNull(k)) v.putNull(rowBase + k)
            else v.putFloat(rowBase + k,
              java.lang.Float.intBitsToFloat(bits.toInt))
          }
        } else {
          var k = 0
          while (k < numRows) {
            val f = d.readFloat()
            if (isNull(k)) v.putNull(rowBase + k) else v.putFloat(rowBase + k, f)
            k += 1
          }
        }
      case DoubleType =>
        if (encoding == EncScaledDouble) {
          val p = math.pow(10, d.readByte().toInt)
          val base = d.readLong()
          val width = d.readByte()
          var k = 0
          while (k < numRows) {
            val delta = width match {
              case 1 => (d.readByte() & 0xffL)
              case 2 => (d.readShort() & 0xffffL)
              case 4 => (d.readInt() & 0xffffffffL)
              case 8 => d.readLong()
            }
            if (isNull(k)) v.putNull(rowBase + k)
            else v.putDouble(rowBase + k, (base + delta) / p)
            k += 1
          }
        } else if (encoding == EncXorDouble) {
          decodeXor(64) { (k, bits) =>
            if (isNull(k)) v.putNull(rowBase + k)
            else v.putDouble(rowBase + k,
              java.lang.Double.longBitsToDouble(bits))
          }
        } else {
          var k = 0
          while (k < numRows) {
            val x = d.readDouble()
            if (isNull(k)) v.putNull(rowBase + k) else v.putDouble(rowBase + k, x)
            k += 1
          }
        }
      case ArrayType(et, _) => // VECTOR: count | null-bitmap | packed values
        val child = v.arrayData()
        var offset = newElemBase
        var k = 0
        while (k < numRows) {
          val outerLen = d.readInt()
          val blob = new Array[Byte](outerLen)
          d.readFully(blob)
          if (isNull(k)) v.putNull(rowBase + k)
          else {
            val bb = java.nio.ByteBuffer.wrap(blob)
            val n = bb.getInt()
            val bm = new Array[Byte]((n + 7) / 8)
            bb.get(bm)
            var j = 0
            while (j < n) {
              val isNullElem = (bm(j >> 3) & (1 << (j & 7))) != 0
              if (et == FloatType) {
                val f = bb.getFloat()
                if (isNullElem) child.appendNull() else child.appendFloat(f)
              } else {
                val x = bb.getDouble()
                if (isNullElem) child.appendNull() else child.appendDouble(x)
              }
              j += 1
            }
            v.putArray(rowBase + k, offset, n)
            offset += n
          }
          k += 1
        }
        newElemBase = offset
      case dec: DecimalType => // wide decimal: length-prefixed unscaled bytes
        var k = 0
        while (k < numRows) {
          val len = d.readInt()
          val a = new Array[Byte](len)
          d.readFully(a)
          if (isNull(k)) v.putNull(rowBase + k)
          else {
            val bi = new java.math.BigInteger(a)
            v.putDecimal(rowBase + k,
              org.apache.spark.sql.types.Decimal(
                new java.math.BigDecimal(bi, dec.scale), dec.precision, dec.scale),
              dec.precision)
          }
          k += 1
        }
      case StringType | BinaryType =>
        if (encoding == EncDictString) {
          val dictSize = d.readInt()
          val dict = Array.fill(dictSize) {
            val len = d.readInt(); val a = new Array[Byte](len); d.readFully(a); a
          }
          var k = 0
          while (k < numRows) {
            val idx = d.readInt()
            if (isNull(k)) v.putNull(rowBase + k)
            else { val a = dict(idx); v.putByteArray(rowBase + k, a, 0, a.length) }
            k += 1
          }
        } else {
          var k = 0
          while (k < numRows) {
            val len = d.readInt()
            val a = new Array[Byte](len)
            d.readFully(a)
            if (isNull(k)) v.putNull(rowBase + k)
            else v.putByteArray(rowBase + k, a, 0, a.length)
            k += 1
          }
        }
      case other => throw new IllegalStateException(s"unsupported $other")
    }
    newElemBase
  }
}
