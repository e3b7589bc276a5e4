package graft.format

import org.apache.spark.sql.types._
import java.io.{DataInputStream, DataOutputStream}

/** The graft-pixels ("gpx") columnar file format — a Spark-first re-design
  * of the reference's Pixels file (layout spec proto/pixels.proto:30-120):
  *
  *   file   := MAGIC "GPX1" | rowgroup* | footer | footerLen:i32 | MAGIC
  *   rowgroup := column chunk* (schema order)
  *   chunk  := encoding:u8 | nullCount:i32 | nullBitmap | dataLen:i32 | data
  *
  * Per-chunk min/max/nullCount statistics live in the footer (the
  * reference's zone maps, proto/pixels.proto:154-235) and drive row-group
  * skipping in the reader (PixelsRecordReaderImpl.java:347-451 analog).
  *
  * Encodings (reference: encoding/RunLenIntEncoder.java, dictionary in
  * StringColumnWriter.java:42-64): PLAIN for all types; RLE for the integer
  * family when runs compress; DICT for strings when the dictionary pays.
  * Compression-by-encoding only, like the reference (pixels.proto:56-57
  * declares codecs "currently NOT USED").
  */
object GpxFormat {
  val Magic: Array[Byte] = "GPX1".getBytes("UTF-8")

  /** bumped on any footer/encoding layout change; cache dirs embed it so
    * files written by an older writer are never misread */
  val FormatVersion: Int = 3

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

  val DefaultRowGroupRows: Int = 65536

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
  }

  final case class ChunkMeta(
      offset: Long, length: Long, encoding: Byte, stats: ChunkStats)

  final case class RowGroupMeta(numRows: Int, chunks: Array[ChunkMeta])

  final case class Footer(schema: StructType, rowGroups: Array[RowGroupMeta])

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

  def writeFooter(out: DataOutputStream, f: Footer): Unit = {
    out.writeUTF(f.schema.toDDL)
    out.writeInt(f.rowGroups.length)
    f.rowGroups.foreach { rg =>
      out.writeInt(rg.numRows)
      out.writeInt(rg.chunks.length)
      rg.chunks.foreach { c =>
        out.writeLong(c.offset); out.writeLong(c.length); out.writeByte(c.encoding)
        val s = c.stats
        out.writeBoolean(s.hasValues)
        out.writeLong(s.minLong); out.writeLong(s.maxLong)
        out.writeDouble(s.minDouble); out.writeDouble(s.maxDouble)
        out.writeUTF(s.minString.take(64)); out.writeUTF(s.maxString.take(64))
        out.writeLong(s.nullCount)
        out.writeBoolean(s.reliable)
      }
    }
  }

  def readFooter(in: DataInputStream): Footer = {
    val schema = StructType.fromDDL(in.readUTF())
    val nRg = in.readInt()
    val rgs = Array.fill(nRg) {
      val numRows = in.readInt()
      val nCh = in.readInt()
      val chunks = Array.fill(nCh) {
        val off = in.readLong(); val len = in.readLong(); val enc = in.readByte()
        val stats = ChunkStats(in.readBoolean(),
          in.readLong(), in.readLong(), in.readDouble(), in.readDouble(),
          in.readUTF(), in.readUTF(), in.readLong(), in.readBoolean())
        ChunkMeta(off, len, enc, stats)
      }
      RowGroupMeta(numRows, chunks)
    }
    Footer(schema, rgs)
  }
}
