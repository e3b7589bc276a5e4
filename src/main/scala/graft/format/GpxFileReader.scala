package graft.format

import GpxFormat._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, DataInputStream}

/** Reads gpx files: footer parse, zone-map row-group skipping, vectorized
  * column-chunk materialization into Spark OnHeapColumnVectors
  * (reference analog: PixelsRecordReaderImpl.java:319-451 — file/row-group
  * stats checks then vectorized read of included columns). */
object GpxFileReader {

  def readFooter(path: String, conf: Configuration): Footer = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(conf)
    val len = fs.getFileStatus(hPath).getLen
    val in = fs.open(hPath)
    try {
      in.seek(len - 8)
      val tail = new Array[Byte](8)
      in.readFully(tail)
      val td = new DataInputStream(new ByteArrayInputStream(tail))
      val footerLen = td.readInt()
      val magic = new Array[Byte](4); td.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic), s"not a gpx file: $path")
      in.seek(len - 8 - footerLen)
      val fb = new Array[Byte](footerLen)
      in.readFully(fb)
      GpxFormat.readFooter(new DataInputStream(new ByteArrayInputStream(fb)))
    } finally in.close()
  }

  /** Zone-map check: can this row group possibly satisfy the filter?
    * Conservative — unknown filters/columns answer true
    * (reference PixelsPredicate.matches, PixelsPredicate.java:32-96). */
  def mayMatch(filter: Filter, schema: StructType, rg: RowGroupMeta): Boolean = {
    def statsOf(col: String): Option[(ChunkStats, DataType)] = {
      val i = schema.fieldIndex(col)
      if (i < rg.chunks.length) Some((rg.chunks(i).stats, schema(i).dataType))
      else None
    }
    def cmpBounds(col: String, v: Any)(test: (Int, Int) => Boolean): Boolean =
      statsOf(col) match {
        case Some((s, _)) if !s.reliable => true // stats unusable: keep
        case Some((s, dt)) if s.hasValues =>
          boundsFor(v, dt, s) match {
            case Some((cmpMin, cmpMax)) => test(cmpMin, cmpMax)
            case None => true
          }
        case Some(_) =>
          // reliable && !hasValues => genuinely all-null chunk: value
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
        s.hasValues || s.nullCount < rg.numRows }
      case And(l, r) => mayMatch(l, schema, rg) && mayMatch(r, schema, rg)
      case Or(l, r) => mayMatch(l, schema, rg) || mayMatch(r, schema, rg)
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
            Some((s.minString.compareTo(str).sign, s.maxString.compareTo(str).sign))
          case _ => None
        }
      case _ => None
    }
  }

  /** Load one row group's requested columns into a ColumnarBatch. */
  def readRowGroup(
      path: String,
      conf: Configuration,
      fileSchema: StructType,
      rg: RowGroupMeta,
      requiredCols: Array[Int]): ColumnarBatch = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(conf)
    val in = fs.open(hPath)
    try {
      val outSchema = StructType(requiredCols.map(fileSchema(_)))
      val vectors = OnHeapColumnVector.allocateColumns(rg.numRows, outSchema)
      var oi = 0
      while (oi < requiredCols.length) {
        val ci = requiredCols(oi)
        val meta = rg.chunks(ci)
        val buf = new Array[Byte](meta.length.toInt)
        in.seek(meta.offset)
        in.readFully(buf)
        fillVector(new DataInputStream(new ByteArrayInputStream(buf)),
          fileSchema(ci).dataType, rg.numRows, vectors(oi))
        oi += 1
      }
      new ColumnarBatch(
        vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]],
        rg.numRows)
    } finally in.close()
  }

  private def fillVector(
      d: DataInputStream,
      dt: DataType,
      numRows: Int,
      v: OnHeapColumnVector): Unit = {
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
    d.readInt() // dataLen

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
      } else {
        var k = 0
        while (k < numRows) { out(k) = d.readLong(); k += 1 }
      }
      out
    }

    dt match {
      case _ if isLongBacked(dt) =>
        val vals = decodeLongs()
        var k = 0
        while (k < numRows) {
          if (isNull(k)) v.putNull(k)
          else dt match {
            case BooleanType => v.putBoolean(k, vals(k) != 0L)
            case ByteType => v.putByte(k, vals(k).toByte)
            case ShortType => v.putShort(k, vals(k).toShort)
            case IntegerType | DateType => v.putInt(k, vals(k).toInt)
            case LongType | TimestampType | TimestampNTZType => v.putLong(k, vals(k))
            case dec: DecimalType =>
              v.putDecimal(k,
                org.apache.spark.sql.types.Decimal.createUnsafe(vals(k), dec.precision, dec.scale),
                dec.precision)
            case _ => throw new IllegalStateException(dt.toString)
          }
          k += 1
        }
      case FloatType =>
        var k = 0
        while (k < numRows) {
          val f = d.readFloat()
          if (isNull(k)) v.putNull(k) else v.putFloat(k, f)
          k += 1
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
            if (isNull(k)) v.putNull(k)
            else v.putDouble(k, (base + delta) / p)
            k += 1
          }
        } else {
          var k = 0
          while (k < numRows) {
            val x = d.readDouble()
            if (isNull(k)) v.putNull(k) else v.putDouble(k, x)
            k += 1
          }
        }
      case ArrayType(et, _) => // VECTOR: count | null-bitmap | packed values
        val child = v.arrayData()
        var offset = 0
        var k = 0
        while (k < numRows) {
          val outerLen = d.readInt()
          val blob = new Array[Byte](outerLen)
          d.readFully(blob)
          if (isNull(k)) v.putNull(k)
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
            v.putArray(k, offset, n)
            offset += n
          }
          k += 1
        }
      case dec: DecimalType => // wide decimal: length-prefixed unscaled bytes
        var k = 0
        while (k < numRows) {
          val len = d.readInt()
          val a = new Array[Byte](len)
          d.readFully(a)
          if (isNull(k)) v.putNull(k)
          else {
            val bi = new java.math.BigInteger(a)
            v.putDecimal(k,
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
            if (isNull(k)) v.putNull(k)
            else { val a = dict(idx); v.putByteArray(k, a, 0, a.length) }
            k += 1
          }
        } else {
          var k = 0
          while (k < numRows) {
            val len = d.readInt()
            val a = new Array[Byte](len)
            d.readFully(a)
            if (isNull(k)) v.putNull(k) else v.putByteArray(k, a, 0, a.length)
            k += 1
          }
        }
      case other => throw new IllegalStateException(s"unsupported $other")
    }
  }
}
