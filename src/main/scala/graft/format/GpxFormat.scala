package graft.format

import org.apache.spark.sql.types._
import java.io.{DataInputStream, DataOutputStream}

/** The graft-pixels ("gpx") columnar file format — a Spark-first re-design
  * of the reference's Pixels file (layout spec proto/pixels.proto:30-120):
  *
  *   file   := MAGIC "GPX1" | rowgroup* | footer | footerLen:i32 | MAGIC
  *   rowgroup := column chunk* (schema order)
  *   chunk  := pixel segment* (each independently decodable)
  *   segment := encoding:u8 | nullCount:i32 | nullBitmap | dataLen:i32 | data
  *
  * A PIXEL (reference proto/pixels.proto:30-34 — the ~10k-row stats granule
  * that gives Pixels its name) is a fixed row range within a row group; each
  * column chunk encodes every pixel as an independent segment and the footer
  * records per-pixel offsets and min/max, so a selective reader seeks to and
  * decodes ONLY the pixels that can match — sub-row-group skipping, not just
  * row-group skipping.
  *
  * Chunk- and pixel-level min/max/nullCount statistics live in the footer
  * (zone maps, proto/pixels.proto:154-235) and drive pruning at planning
  * time (PixelsRecordReaderImpl.java:347-451 analog). Row groups carry an
  * optional commit timestamp (proto/pixels.proto:66-69 hidden-column
  * analog) that `option("snapshotTs", ...)` filters for MVCC time travel.
  *
  * Encodings (reference: encoding/RunLenIntEncoder.java, dictionary in
  * StringColumnWriter.java:42-64): PLAIN for all types; RLE/FOR for the
  * integer family when runs/ranges compress; DICT for strings when the
  * dictionary pays; scaled-decimal or Gorilla-XOR for float/double when
  * the probe wins. Compression-by-encoding only, like the reference
  * (pixels.proto:56-57 declares codecs "currently NOT USED").
  */
object GpxFormat {
  val Magic: Array[Byte] = "GPX1".getBytes("UTF-8")

  /** trailer := footerLen:i32 | fileId:i64 | MAGIC — 16 bytes. `fileId` is
    * a digest of the footer bytes, so a cached footer can be revalidated
    * against an in-place rewrite with a 16-byte tail read (two files with
    * identical footers are interchangeable for planning: the cache holds
    * only footers, data bytes are always read fresh). */
  val TrailerLen: Int = 16

  /** content id of a serialized footer: first 8 bytes of its MD5 */
  def footerId(footerBytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(footerBytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** serialize the 16-byte trailer for a footer of `footerBytes` */
  def trailerBytes(footerBytes: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(TrailerLen)
    bb.putInt(footerBytes.length)
    bb.putLong(footerId(footerBytes))
    bb.put(Magic)
    bb.array()
  }

  /** bumped on any footer/encoding layout change; cache dirs embed it so
    * files written by an older writer are never misread (v8: footer tail
    * gained the noNullElemCols claim — old files READ fine, but cached
    * materializations must rebuild to gain the claim and its
    * containsNull=false narrowing) */
  val FormatVersion: Int = 8

  // encodings
  val EncPlain: Byte = 0
  val EncRleLong: Byte = 1
  val EncDictString: Byte = 2
  /** frame-of-reference packing: base:i64 width:u8 then width-byte
    * big-endian unsigned deltas (integer family) */
  val EncForPacked: Byte = 3
  /** doubles that are exactly k/10^s for s<=4: scale:u8 then the longs k
    * FOR-packed (base:i64 width:u8 deltas). Decode k/10^s is bit-exact
    * because each stored double was the nearest-double of k/10^s. */
  val EncScaledDouble: Byte = 4
  /** Gorilla-style XOR-of-previous bit packing over raw IEEE payloads
    * (see [[XorCodec]]); chosen only when it beats PLAIN for the segment */
  val EncXorDouble: Byte = 5
  val EncXorFloat: Byte = 6
  /** delta-of-previous packing (Parquet DELTA_BINARY_PACKED analog):
    * first:i64 | minDelta:i64 | width:u8 | (rows-1) width-byte unsigned
    * (delta - minDelta). Near-zero bytes for monotonic key/timestamp
    * columns whose absolute range defeats FOR. */
  val EncDeltaLong: Byte = 7

  val DefaultRowGroupRows: Int = 65536
  /** default stats/encode sub-granule within a row group (reference pixel
    * size; pixels.proto:31 uses ~10k) */
  val DefaultPixelRows: Int = 8192

  /** Column-chunk statistics: typed min/max + null count (zone map).
    * `reliable=false` marks stats that must not drive skipping: float
    * chunks containing NaN (Spark orders NaN above +Inf, so finite
    * min/max would wrongly prune `col > huge` predicates), and types the
    * writer records no stats for (wide decimal, binary, arrays).
    * `hasValues=false && reliable` means the chunk is genuinely all-null. */
  final case class ChunkStats(
      hasValues: Boolean,
      minLong: Long, maxLong: Long, // integer family (incl. date/ts/decimal unscaled)
      minDouble: Double, maxDouble: Double, // float family
      minString: String, maxString: String, // string family (truncated)
      nullCount: Long,
      reliable: Boolean = true)

  object ChunkStats {
    val empty: ChunkStats =
      ChunkStats(hasValues = false, 0L, 0L, 0.0, 0.0, "", "", 0L)
    val unreliable: ChunkStats =
      empty.copy(reliable = false)

    /** Combine stats of two row ranges of the same column. */
    def merge(a: ChunkStats, b: ChunkStats): ChunkStats = {
      def pickL(av: Long, bv: Long, f: (Long, Long) => Long): Long =
        if (a.hasValues && b.hasValues) f(av, bv) else if (a.hasValues) av else bv
      def pickD(av: Double, bv: Double, f: (Double, Double) => Double): Double =
        if (a.hasValues && b.hasValues) f(av, bv) else if (a.hasValues) av else bv
      def pickS(av: String, bv: String, lo: Boolean): String =
        if (a.hasValues && b.hasValues) {
          // UTF-8 binary order, matching the writer's min/max and the
          // reader's predicate compare (UTF-16 order disagrees for
          // supplementary-plane characters)
          val c = org.apache.spark.unsafe.types.UTF8String.fromString(av)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(bv))
          if ((c <= 0) == lo) av else bv
        } else if (a.hasValues) av else bv
      ChunkStats(
        a.hasValues || b.hasValues,
        pickL(a.minLong, b.minLong, math.min), pickL(a.maxLong, b.maxLong, math.max),
        pickD(a.minDouble, b.minDouble, math.min), pickD(a.maxDouble, b.maxDouble, math.max),
        pickS(a.minString, b.minString, lo = true), pickS(a.maxString, b.maxString, lo = false),
        a.nullCount + b.nullCount,
        a.reliable && b.reliable)
    }
  }

  /** One pixel segment of a chunk: byte offset relative to the chunk start,
    * row count, and its own zone map. */
  final case class PixelMeta(relOffset: Int, rows: Int, stats: ChunkStats)

  final case class ChunkMeta(
      offset: Long, length: Long, encoding: Byte, stats: ChunkStats,
      pixels: Array[PixelMeta]) {
    /** byte length of pixel segment p within this chunk; pixel relOffsets
      * are i32, so a chunk past 2 GiB cannot be pixel-addressed — fail
      * loudly instead of silently truncating `length.toInt` */
    def pixelLength(p: Int): Int = {
      val end: Long =
        if (p + 1 < pixels.length) pixels(p + 1).relOffset.toLong else length
      require(end <= Int.MaxValue, s"chunk of $length bytes exceeds the " +
        "2 GiB pixel-addressing limit (i32 relOffset); split the row group")
      end.toInt - pixels(p).relOffset
    }
  }

  /** commitTs = -1 means "no commit timestamp recorded" (always visible). */
  final case class RowGroupMeta(
      numRows: Int, chunks: Array[ChunkMeta], commitTs: Long = -1L)

  /** `sortedBy`: every ROW GROUP in this file is internally sorted
    * ascending-nulls-first by this (physical-name) column prefix — stamped
    * by the batch writer when a sort clustering was in effect (Spark
    * inserts the sort via RequiresDistributionAndOrdering, so the claim is
    * writer-enforced, not caller-trusted), propagated through byte-copy
    * compaction (common prefix of the inputs) and delete folds. Per-FILE
    * truth, unlike the table-level `_sortspec` intent: files written
    * before the spec existed simply carry an empty list, so scan-time
    * ordering claims can never cover an unsorted legacy file. */
  /** `noNullElemCols`: numeric-array (VECTOR) columns of THIS FILE whose
    * every stored array provably contains no null elements — recorded by
    * the writer from the element bitmaps it emits, intersected across
    * files by byte-copy compaction. Schema inference narrows the table
    * schema to `containsNull=false` when EVERY file claims a column, which
    * lets the vector kernels' static null-gate (VectorKernels.elemsNullable)
    * drop the per-element null scan on the serve paths. A row-level null
    * array does not void the claim (row nullability is tracked separately).
    * Tail-serialized with EOF tolerance like `sortedBy`: older footers
    * simply carry no claims (never narrowed — always safe). */
  final case class Footer(schema: StructType, rowGroups: Array[RowGroupMeta],
      sortedBy: Seq[String] = Nil, noNullElemCols: Seq[String] = Nil)

  /** Types the format materializes natively. Decimals come in two widths
    * like the reference (TypeDescription.java:60-61): p<=18 rides in a
    * long (RLE/FOR-packable); p<=38 is stored as a variable-length
    * unscaled big-integer (Integer128 analog). */
  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case d: DecimalType => d.precision <= 38
    // VECTOR columns (reference VectorColumnVector.java:35-50): numeric
    // arrays, stored as count-prefixed packed elements
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** integer-family types whose values ride in a long (and may RLE/FOR) */
  def isLongBacked(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | BooleanType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** wide decimals (19..38 digits): stored like binary, no zone maps */
  def isWideDecimal(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.precision > 18
    case _ => false
  }

  private def writeStats(out: DataOutputStream, s: ChunkStats): Unit = {
    out.writeBoolean(s.hasValues)
    out.writeLong(s.minLong); out.writeLong(s.maxLong)
    out.writeDouble(s.minDouble); out.writeDouble(s.maxDouble)
    out.writeUTF(s.minString.take(64)); out.writeUTF(s.maxString.take(64))
    out.writeLong(s.nullCount)
    out.writeBoolean(s.reliable)
  }

  private def readStats(in: DataInputStream): ChunkStats =
    ChunkStats(in.readBoolean(),
      in.readLong(), in.readLong(), in.readDouble(), in.readDouble(),
      in.readUTF(), in.readUTF(), in.readLong(), in.readBoolean())

  def writeFooter(out: DataOutputStream, f: Footer): Unit = {
    writeSchemaDDL(out, f.schema.toDDL)
    out.writeInt(f.rowGroups.length)
    f.rowGroups.foreach { rg =>
      out.writeInt(rg.numRows)
      out.writeLong(rg.commitTs)
      out.writeInt(rg.chunks.length)
      rg.chunks.foreach { c =>
        out.writeLong(c.offset); out.writeLong(c.length); out.writeByte(c.encoding)
        writeStats(out, c.stats)
        out.writeInt(c.pixels.length)
        c.pixels.foreach { p =>
          out.writeInt(p.relOffset); out.writeInt(p.rows)
          writeStats(out, p.stats)
        }
      }
    }
    out.writeInt(f.sortedBy.length)
    f.sortedBy.foreach(out.writeUTF)
    out.writeInt(f.noNullElemCols.length)
    f.noNullElemCols.foreach(out.writeUTF)
  }

  /** Schema DDL framing: writeUTF's 2-byte length caps a DDL at 65535
    * modified-UTF-8 bytes — a ~2000-column schema would write every data
    * byte and then fail UNRECOVERABLY in close() (UTFDataFormatException,
    * and no retry can ever succeed for that schema). Wide DDLs use a
    * 0-length sentinel (impossible for a real schema: DDL is never
    * empty) followed by int-length raw UTF-8; narrow DDLs keep the
    * writeUTF byte layout, so existing files read unchanged. */
  private def writeSchemaDDL(out: DataOutputStream, ddl: String): Unit = {
    // GpxFileWriter rejects zero-field schemas, making this provably
    // unreachable — but guard here too so no future caller can emit the
    // ambiguous 2-zero-byte frame (writeUTF("") IS the wide sentinel)
    require(ddl.nonEmpty, "schema DDL must be non-empty")
    // 3 bytes/char is modified-UTF-8's BMP worst case (surrogate pairs:
    // 2 chars x 3 bytes), so length <= 21845 always fits writeUTF
    if (ddl.length <= 21845) out.writeUTF(ddl)
    else {
      val bytes = ddl.getBytes("UTF-8")
      out.writeShort(0)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
  }

  private def readSchemaDDL(in: DataInputStream): String = {
    val len = in.readUnsignedShort()
    if (len == 0) {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      new String(b, "UTF-8")
    } else {
      // short form: reconstruct writeUTF's frame so the MODIFIED-UTF-8
      // payload decodes exactly as readUTF would
      val b = new Array[Byte](len)
      in.readFully(b)
      val buf = java.nio.ByteBuffer.allocate(2 + len)
      buf.putShort(len.toShort).put(b)
      new DataInputStream(
        new java.io.ByteArrayInputStream(buf.array())).readUTF()
    }
  }

  def readFooter(in: DataInputStream): Footer = {
    val schema = StructType.fromDDL(readSchemaDDL(in))
    val nRg = in.readInt()
    val rgs = Array.fill(nRg) {
      val numRows = in.readInt()
      val commitTs = in.readLong()
      val nCh = in.readInt()
      val chunks = Array.fill(nCh) {
        val off = in.readLong(); val len = in.readLong(); val enc = in.readByte()
        val stats = readStats(in)
        val nPx = in.readInt()
        val pixels = Array.fill(nPx) {
          val rel = in.readInt(); val rows = in.readInt()
          PixelMeta(rel, rows, readStats(in))
        }
        ChunkMeta(off, len, enc, stats, pixels)
      }
      RowGroupMeta(numRows, chunks, commitTs)
    }
    // sortedBy/noNullElemCols ride at the tail; a footer serialized before
    // either field existed simply ends here (EOF => no claim recorded)
    val sortedBy =
      try Seq.fill(in.readInt())(in.readUTF())
      catch { case _: java.io.EOFException => Nil }
    val noNullElemCols =
      try Seq.fill(in.readInt())(in.readUTF())
      catch { case _: java.io.EOFException => Nil }
    Footer(schema, rgs, sortedBy, noNullElemCols)
  }
}
