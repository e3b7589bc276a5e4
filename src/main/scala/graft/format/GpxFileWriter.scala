package graft.format

import GpxFormat._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayOutputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Writes one gpx file from InternalRows (reference analog:
  * PixelsWriterImpl.java:70-110 buffering row batches per column writer and
  * emitting row groups; stats recorders in pixels-core/.../stats/).
  *
  * Every column chunk is emitted as a run of independently decodable PIXEL
  * segments (fixed `pixelRows` row ranges) with their own zone maps — the
  * reference's sub-row-group stats granule (proto/pixels.proto:30-34) —
  * so selective readers can seek to just the matching pixels. Encoding
  * selection (RLE / FOR / dict / scaled-double probes) runs per segment,
  * which also makes it adaptive to local value distributions.
  */
final class GpxFileWriter(
    path: String,
    schema: StructType,
    conf: Configuration,
    rowGroupRows: Int = DefaultRowGroupRows,
    pixelRows: Int = DefaultPixelRows,
    initialCommitTs: Long = -1L,
    sortedBy: Seq[String] = Nil) {

  /** ts stamped on row groups as they flush — mutable so multi-version
    * rewrites (delete-bitmap folds, compaction of mixed-ts files) can
    * stamp each row group with its ORIGINAL commit ts: set it, add the
    * group's rows, then [[flushRowGroup]] before changing it again */
  var commitTs: Long = initialCommitTs

  // nonEmpty first: the footer's wide-DDL framing uses a 0-length
  // writeUTF sentinel, which a zero-field schema's empty DDL would
  // collide with (readSchemaDDL would consume the row-group count as a
  // byte length) — and the forall check below passes vacuously for it
  require(schema.fields.nonEmpty, "gpx schema must have at least one field")
  require(schema.fields.forall(f => supported(f.dataType)),
    s"unsupported gpx schema: $schema")
  require(pixelRows > 0, "pixelRows must be positive")
  require(rowGroupRows > 0, "rowGroupRows must be positive")

  private val hPath = new Path(path)
  private val fs = hPath.getFileSystem(conf)
  private val out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(hPath, true), 1 << 20))
  private var pos: Long = 0L
  private def write(b: Array[Byte]): Unit = { out.write(b); pos += b.length }

  write(Magic)

  // ---- per-column row-group buffers ----
  private val n = schema.length
  private val longs = Array.fill(n)(new ArrayBuffer[Long](1024))
  private val doubles = Array.fill(n)(new ArrayBuffer[Double](1024))
  private val floats = Array.fill(n)(new ArrayBuffer[Float](1024))
  private val bytes = Array.fill(n)(new ArrayBuffer[Array[Byte]](1024))
  private val nulls = Array.fill(n)(new ArrayBuffer[Boolean](1024))
  private var bufRows = 0
  private val rowGroups = new ArrayBuffer[RowGroupMeta]
  // per-column "no array value in this file holds a null ELEMENT" claim,
  // recorded into the footer so readers can narrow containsNull=false and
  // the vector kernels' static null-gate engages (row-level null arrays
  // do not void it — row nullability is tracked by the row bitmap)
  private val elemNullFree = Array.fill(n)(true)

  def addRow(row: InternalRow): Unit = {
    var i = 0
    while (i < n) {
      val dt = schema(i).dataType
      if (row.isNullAt(i)) {
        nulls(i) += true
        dt match {
          case FloatType => floats(i) += 0f
          case DoubleType => doubles(i) += 0.0
          case StringType | BinaryType => bytes(i) += Array.emptyByteArray
          case d if isWideDecimal(d) || isNumericArray(d) =>
            bytes(i) += Array.emptyByteArray
          case _ => longs(i) += 0L
        }
      } else {
        nulls(i) += false
        dt match {
          case BooleanType => longs(i) += (if (row.getBoolean(i)) 1L else 0L)
          case ByteType => longs(i) += row.getByte(i).toLong
          case ShortType => longs(i) += row.getShort(i).toLong
          case IntegerType | DateType => longs(i) += row.getInt(i).toLong
          case LongType | TimestampType | TimestampNTZType => longs(i) += row.getLong(i)
          case d: DecimalType if d.precision <= 18 =>
            longs(i) += row.getDecimal(i, d.precision, d.scale).toUnscaledLong
          case d: DecimalType =>
            bytes(i) += row.getDecimal(i, d.precision, d.scale)
              .toJavaBigDecimal.unscaledValue().toByteArray
          case ArrayType(et, _) =>
            // VECTOR chunk element: count | null-bitmap | packed values
            val ad = row.getArray(i)
            val n2 = ad.numElements()
            val w = if (et == FloatType) 4 else 8
            val bm = new Array[Byte]((n2 + 7) / 8)
            val bb = java.nio.ByteBuffer.allocate(4 + bm.length + n2 * w)
            bb.putInt(n2)
            var j = 0
            while (j < n2) {
              if (ad.isNullAt(j)) {
                bm(j >> 3) = (bm(j >> 3) | (1 << (j & 7))).toByte
                elemNullFree(i) = false
              }
              j += 1
            }
            bb.put(bm)
            j = 0
            while (j < n2) {
              if (et == FloatType) bb.putFloat(if (ad.isNullAt(j)) 0f else ad.getFloat(j))
              else bb.putDouble(if (ad.isNullAt(j)) 0.0 else ad.getDouble(j))
              j += 1
            }
            bytes(i) += bb.array()
          case FloatType => floats(i) += row.getFloat(i)
          case DoubleType => doubles(i) += row.getDouble(i)
          case StringType => bytes(i) += row.getUTF8String(i).getBytes.clone()
          case BinaryType => bytes(i) += row.getBinary(i).clone()
          case other => throw new IllegalStateException(s"unsupported $other")
        }
      }
      i += 1
    }
    bufRows += 1
    if (bufRows >= rowGroupRows) flushRowGroup()
  }

  /** flush buffered rows as one row group stamped with the current
    * [[commitTs]] (public for multi-version rewrites; no-op when empty) */
  def flushRowGroup(): Unit = {
    if (bufRows == 0) return
    val chunks = new Array[ChunkMeta](n)
    var i = 0
    while (i < n) {
      chunks(i) = writeChunk(i)
      i += 1
    }
    rowGroups += RowGroupMeta(bufRows, chunks, commitTs)
    (0 until n).foreach { j =>
      longs(j).clear(); doubles(j).clear(); floats(j).clear()
      bytes(j).clear(); nulls(j).clear()
    }
    bufRows = 0
  }

  /** Emit column i of the buffered row group as pixel segments. */
  private def writeChunk(i: Int): ChunkMeta = {
    val offset = pos
    val body = new ByteArrayOutputStream(8192)
    val nPixels = (bufRows + pixelRows - 1) / pixelRows
    val pixels = new Array[PixelMeta](nPixels)
    var p = 0
    var firstEncoding = EncPlain
    var merged: ChunkStats = null
    while (p < nPixels) {
      val from = p * pixelRows
      val until = math.min(bufRows, from + pixelRows)
      val rel = body.size()
      val (enc, st) = encodeSegment(i, from, until, new DataOutputStream(body))
      if (p == 0) firstEncoding = enc
      pixels(p) = PixelMeta(rel, until - from, st)
      merged = if (merged == null) st else ChunkStats.merge(merged, st)
      p += 1
    }
    // stream the chunk payload out without materializing a second copy
    body.writeTo(out)
    pos += body.size()
    ChunkMeta(offset, pos - offset, firstEncoding, merged, pixels)
  }

  /** Encode rows [from, until) of column i as one self-contained segment:
    * encoding | nullCount | bitmap | dataLen | data. Returns the chosen
    * encoding and the segment's zone-map stats. */
  private def encodeSegment(
      i: Int, from: Int, until: Int, seg: DataOutputStream): (Byte, ChunkStats) = {
    val dt = schema(i).dataType
    val nullArr = nulls(i)
    val rows = until - from
    var nullCount = 0
    var k = from
    while (k < until) { if (nullArr(k)) nullCount += 1; k += 1 }

    val body = new ByteArrayOutputStream(4096)
    val d = new DataOutputStream(body)

    var stats = ChunkStats.empty.copy(nullCount = nullCount)
    var encoding = EncPlain

    if (isLongBacked(dt)) {
      val vals = longs(i)
      var mn = Long.MaxValue; var mx = Long.MinValue; var any = false
      k = from
      while (k < until) {
        if (!nullArr(k)) { val v = vals(k); if (v < mn) mn = v; if (v > mx) mx = v; any = true }
        k += 1
      }
      if (any) stats = stats.copy(hasValues = true, minLong = mn, maxLong = mx)
      // RLE probe: count runs
      var runs = 0
      k = from
      while (k < until) {
        var j = k + 1
        while (j < until && vals(j) == vals(k)) j += 1
        runs += 1; k = j
      }
      val rleBytes = runs * 12L
      val plainBytes = rows * 8L
      // frame-of-reference width: bytes needed for (v - min); nulls hold a
      // placeholder 0 in the buffer, so they are packed as delta 0
      val forWidth: Int =
        if (!any) 8
        else {
          val range = stats.maxLong - stats.minLong
          if (range < 0) 8 // overflow: span too wide, keep plain
          else if (range < 256L) 1
          else if (range < 65536L) 2
          else if (range < 4294967296L) 4
          else 8
        }
      // delta-of-previous probe: monotonic keys/timestamps have tiny delta
      // ranges even when their absolute range defeats FOR. Null rows keep
      // their placeholder 0 in the stream (decode reproduces it, the null
      // bitmap masks it) — same contract as the other integer encodings.
      // Skipped when value range overflowed (delta arithmetic could too).
      var deltaWidth = 8
      var minDelta = 0L
      if (rows >= 2 && any && stats.maxLong - stats.minLong >= 0) {
        var mnD = Long.MaxValue; var mxD = Long.MinValue
        k = from + 1
        while (k < until) {
          val dd = vals(k) - vals(k - 1)
          if (dd < mnD) mnD = dd; if (dd > mxD) mxD = dd
          k += 1
        }
        val dr = mxD - mnD
        if (dr >= 0) {
          deltaWidth =
            if (dr < 256L) 1 else if (dr < 65536L) 2
            else if (dr < 4294967296L) 4 else 8
          minDelta = mnD
        }
      }
      val forBytes =
        if (forWidth < 8) 9L + rows.toLong * forWidth else Long.MaxValue
      val deltaBytes =
        if (deltaWidth < 8) 17L + (rows - 1).toLong * deltaWidth
        else Long.MaxValue
      if (rleBytes < plainBytes / 2 && rleBytes < forBytes &&
          rleBytes < deltaBytes) {
        encoding = EncRleLong
        k = from
        while (k < until) {
          var j = k + 1
          while (j < until && vals(j) == vals(k)) j += 1
          d.writeLong(vals(k)); d.writeInt(j - k); k = j
        }
      } else if (forBytes <= deltaBytes && forBytes < plainBytes) {
        encoding = EncForPacked
        val base = stats.minLong
        d.writeLong(base); d.writeByte(forWidth)
        k = from
        while (k < until) {
          val delta = if (nullArr(k)) 0L else vals(k) - base
          forWidth match {
            case 1 => d.writeByte(delta.toInt)
            case 2 => d.writeShort(delta.toInt)
            case 4 => d.writeInt(delta.toInt)
          }
          k += 1
        }
      } else if (deltaBytes < plainBytes) {
        encoding = EncDeltaLong
        d.writeLong(vals(from))
        d.writeLong(minDelta); d.writeByte(deltaWidth)
        k = from + 1
        while (k < until) {
          val delta = (vals(k) - vals(k - 1)) - minDelta
          deltaWidth match {
            case 1 => d.writeByte(delta.toInt)
            case 2 => d.writeShort(delta.toInt)
            case 4 => d.writeInt(delta.toInt)
          }
          k += 1
        }
      } else {
        k = from
        while (k < until) { d.writeLong(vals(k)); k += 1 }
      }
    } else dt match {
      case FloatType =>
        val vals = floats(i)
        var mn = Double.MaxValue; var mx = -Double.MaxValue
        var any = false; var sawNaN = false
        k = from
        while (k < until) {
          if (!nullArr(k)) {
            val v = vals(k)
            if (java.lang.Float.isNaN(v)) sawNaN = true
            else { if (v < mn) mn = v; if (v > mx) mx = v; any = true }
          }
          k += 1
        }
        if (sawNaN) stats = stats.copy(reliable = false)
        else if (any) stats = stats.copy(hasValues = true,
          minDouble = if (mn == 0.0) -0.0 else mn,
          maxDouble = if (mx == 0.0) 0.0 else mx)
        // XOR (Gorilla) probe: bit-exact, wins on repeated / slowly-varying
        // sensor values; random payloads come out larger -> stay PLAIN
        val xorBytes = XorCodec.encode(
          r => java.lang.Float.floatToRawIntBits(vals(from + r)) & 0xffffffffL,
          rows, 32)
        if (xorBytes.length < rows * 4) {
          encoding = EncXorFloat
          d.write(xorBytes)
        } else {
          k = from
          while (k < until) { d.writeFloat(vals(k)); k += 1 }
        }
      case DoubleType =>
        val vals = doubles(i)
        var mn = Double.MaxValue; var mx = -Double.MaxValue
        var any = false; var sawNaN = false
        k = from
        while (k < until) {
          if (!nullArr(k)) {
            val v = vals(k)
            if (java.lang.Double.isNaN(v)) sawNaN = true
            else { if (v < mn) mn = v; if (v > mx) mx = v; any = true }
          }
          k += 1
        }
        // NaN sorts ABOVE +Inf in Spark: finite min/max would wrongly
        // prune range predicates that NaN rows satisfy.
        // Zero bounds widen to cover BOTH zeros (-0.0 as min, +0.0 as
        // max): the primitive <,> above conflate -0.0 and 0.0, but the
        // reader prunes under Double.compare's total order where
        // -0.0 < 0.0 — a file of {-5.0, -0.0} would record max = -0.0
        // and a `>= 0.0` predicate (true for -0.0 under Spark's IEEE
        // evaluation) would prune the row group: silent row loss
        if (sawNaN) stats = stats.copy(reliable = false)
        else if (any) stats = stats.copy(hasValues = true,
          minDouble = if (mn == 0.0) -0.0 else mn,
          maxDouble = if (mx == 0.0) 0.0 else mx)

        // scaled-decimal probe: many real-world measure columns are
        // fixed-point (money, ratings). If every value is bit-exactly
        // k/10^s for some s<=4 and |k| < 2^52, store the ints FOR-packed.
        var scale = -1
        if (!sawNaN) {
          var s2 = 0
          while (scale < 0 && s2 <= 4) {
            val p = math.pow(10, s2)
            var ok = true
            var k2 = from
            while (ok && k2 < until) {
              if (!nullArr(k2)) {
                val v = vals(k2)
                val scaled = Math.rint(v * p)
                // NB: double == treats -0.0 == 0.0 — but decode would
                // produce +0.0, so negative zero must stay plain-encoded
                ok = math.abs(scaled) < (1L << 52) && scaled / p == v &&
                  !(v == 0.0 && java.lang.Double.doubleToRawLongBits(v) != 0L)
              }
              k2 += 1
            }
            if (ok) scale = s2 else s2 += 1
          }
        }
        if (scale >= 0 && rows > 0) {
          encoding = EncScaledDouble
          val p = math.pow(10, scale)
          val longsV = new Array[Long](rows)
          // base/range over NON-NULL values only: a 0L placeholder far
          // from the data's range would otherwise drag the base to 0 and
          // inflate the packed width up to 8x for one null
          var k2 = 0
          var lmn = Long.MaxValue
          var lmx = Long.MinValue
          while (k2 < rows) {
            if (!nullArr(from + k2)) {
              val lv = Math.rint(vals(from + k2) * p).toLong
              longsV(k2) = lv
              if (lv < lmn) lmn = lv
              if (lv > lmx) lmx = lv
            }
            k2 += 1
          }
          if (lmn == Long.MaxValue) { lmn = 0L; lmx = 0L } // all-null segment
          // null placeholders sit AT the base so deltas stay >= 0
          k2 = 0
          while (k2 < rows) { if (nullArr(from + k2)) longsV(k2) = lmn; k2 += 1 }
          val range = lmx - lmn
          val width =
            if (range < 0) 8
            else if (range < 256L) 1 else if (range < 65536L) 2
            else if (range < 4294967296L) 4 else 8
          d.writeByte(scale)
          d.writeLong(lmn); d.writeByte(width)
          k2 = 0
          while (k2 < rows) {
            val delta = longsV(k2) - lmn
            width match {
              case 1 => d.writeByte(delta.toInt)
              case 2 => d.writeShort(delta.toInt)
              case 4 => d.writeInt(delta.toInt)
              case 8 => d.writeLong(delta)
            }
            k2 += 1
          }
        } else {
          // XOR (Gorilla) probe for doubles the scaled-decimal pass can't
          // represent: bit-exact, wins on repeated / slowly-drifting values
          val xorBytes = XorCodec.encode(
            r => java.lang.Double.doubleToRawLongBits(vals(from + r)), rows, 64)
          if (xorBytes.length < rows * 8) {
            encoding = EncXorDouble
            d.write(xorBytes)
          } else {
            k = from
            while (k < until) { d.writeDouble(vals(k)); k += 1 }
          }
        }
      case bdt if bdt == StringType || bdt == BinaryType ||
          bdt.isInstanceOf[DecimalType] || isNumericArray(bdt) =>
        val vals = bytes(i)
        // only strings get zone-map stats; other bytes-backed types must
        // never be skipped on (absent) stats
        if (bdt != StringType) stats = stats.copy(reliable = false)
        if (dt == StringType) {
          // min/max in UTF-8 BINARY order (UTF8String.compareTo), the
          // order Spark evaluates string predicates in — Java String
          // (UTF-16) order disagrees for supplementary-plane characters
          // (U+10000+ sort below U+E000..U+FFFF in UTF-16 but above them
          // in UTF-8), and a bound computed in the wrong order lets the
          // reader prune pixels that contain matching rows
          var mn: UTF8String = null; var mx: UTF8String = null
          k = from
          while (k < until) {
            if (!nullArr(k)) {
              val s = UTF8String.fromBytes(vals(k))
              if (mn == null || s.compareTo(mn) < 0) mn = s
              if (mx == null || s.compareTo(mx) > 0) mx = s
            }
            k += 1
          }
          if (mn != null)
            stats = stats.copy(hasValues = true,
              minString = mn.toString, maxString = mx.toString)
        }
        // dictionary probe (strings only): bail out early once the
        // dictionary clearly doesn't pay; only a COMPLETE scan that stayed
        // under the cardinality bound enables DICT.
        val distinct = scala.collection.mutable.LinkedHashMap[Seq[Byte], Int]()
        // ids recorded DURING the probe: the emit pass below then writes
        // them directly instead of re-wrapping and re-hashing every value
        // a second time (this runs per string segment on the write path)
        val dictIds = if (dt == StringType) new Array[Int](rows) else null
        var dictComplete = false
        if (dt == StringType) {
          k = from
          while (k < until && distinct.size <= rows / 2) {
            val key: Seq[Byte] =
              scala.collection.immutable.ArraySeq.unsafeWrapArray(vals(k))
            dictIds(k - from) = distinct.getOrElseUpdate(key, distinct.size)
            k += 1
          }
          dictComplete = k == until && distinct.size <= rows / 2
        }
        if (dt == StringType && rows > 0 && dictComplete) {
          encoding = EncDictString
          d.writeInt(distinct.size)
          distinct.keys.foreach { key =>
            val arr = key.toArray
            d.writeInt(arr.length); d.write(arr)
          }
          k = from
          while (k < until) { d.writeInt(dictIds(k - from)); k += 1 }
        } else {
          k = from
          while (k < until) {
            d.writeInt(vals(k).length); d.write(vals(k)); k += 1
          }
        }
      case other => throw new IllegalStateException(s"unsupported $other")
    }
    d.flush()

    // segment = encoding | nullCount | bitmap | dataLen | data
    seg.writeByte(encoding)
    seg.writeInt(nullCount)
    if (nullCount > 0) {
      val bm = new Array[Byte]((rows + 7) / 8)
      k = from
      while (k < until) {
        if (nullArr(k)) {
          val r = k - from
          bm(r >> 3) = (bm(r >> 3) | (1 << (r & 7))).toByte
        }
        k += 1
      }
      seg.write(bm)
    }
    seg.writeInt(body.size())
    body.writeTo(seg) // stream, no second full-segment copy
    seg.flush()
    (encoding, stats)
  }

  /** finalize: flush last row group, write footer + trailer. */
  def close(): Unit = {
    flushRowGroup()
    val fBytes = new ByteArrayOutputStream(8192)
    val fd = new DataOutputStream(fBytes)
    val claims = schema.fields.zipWithIndex.collect {
      case (f, i) if isNumericArray(f.dataType) && elemNullFree(i) => f.name
    }.toSeq
    GpxFormat.writeFooter(fd,
      Footer(schema, rowGroups.toArray, sortedBy, claims))
    fd.flush()
    val arr = fBytes.toByteArray
    write(arr)
    write(GpxFormat.trailerBytes(arr))
    out.close()
  }

  def abort(): Unit = {
    // best-effort close: aborts fire exactly when the stream is broken
    // (disk full, task kill), and a throwing close() must not skip the
    // delete — a footer-less partial .gpx under the final name fails
    // every later scan of the directory with "not a gpx file"
    try out.close() catch { case _: Throwable => () }
    fs.delete(hPath, false)
    ()
  }
}
