package graft.format

/** Gorilla-style XOR encoding for float/double chunks (the classic
  * timestamps/sensor-value compression from Facebook's Gorilla paper,
  * VLDB 2015 §4.1.2; the reference leaves general floating point PLAIN —
  * its encoders cover the integer family and strings only, e.g.
  * pixels-core/.../encoding/RunLenIntEncoder.java — so this is the one
  * encoding gpx adds beyond the reference's set).
  *
  * Scheme per value (W = 64 for double, 32 for float):
  *   first value: W raw bits
  *   xor == 0          -> '0'
  *   xor != 0, inside previous leading/trailing window
  *                     -> '10' + meaningful bits in the previous window
  *   else              -> '11' + leading:5 + (sigBits-1):6|5 + meaningful bits
  *
  * Bit-exact for every payload (NaN bit patterns, -0.0, subnormals) because
  * only raw IEEE bits flow through the XOR — no arithmetic on the values.
  */
object XorCodec {

  final class BitWriter(initial: Int = 4096) {
    private var buf = new Array[Byte](initial)
    private var bitPos = 0L
    private def ensure(moreBits: Int): Unit = {
      val needBytes = ((bitPos + moreBits + 7) >> 3).toInt
      if (needBytes > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, needBytes))
      }
    }
    /** append the low `bits` bits of v, most-significant first */
    def write(v: Long, bits: Int): Unit = {
      ensure(bits)
      var i = bits - 1
      var p = bitPos
      while (i >= 0) {
        if (((v >>> i) & 1L) != 0L) {
          buf((p >> 3).toInt) = (buf((p >> 3).toInt) | (1 << (7 - (p & 7)).toInt)).toByte
        }
        p += 1
        i -= 1
      }
      bitPos = p
    }
    def sizeBits: Long = bitPos
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, ((bitPos + 7) >> 3).toInt)
  }

  final class BitReader(buf: Array[Byte]) {
    private var bitPos = 0L
    /** read `bits` bits, most-significant first, into the low bits of a long */
    def read(bits: Int): Long = {
      var v = 0L
      var i = 0
      var p = bitPos
      while (i < bits) {
        v = (v << 1) |
          ((buf((p >> 3).toInt) >> (7 - (p & 7)).toInt) & 1).toLong
        p += 1
        i += 1
      }
      bitPos = p
      v
    }
    def readBit(): Boolean = read(1) != 0L
  }

  /** encode `n` W-bit IEEE payloads; W must be 32 or 64 */
  def encode(bits: Int => Long, n: Int, w: Int): Array[Byte] = {
    val lenBits = if (w == 64) 6 else 5 // stores sigBits-1 (1..W)
    val bw = new BitWriter(math.max(64, n))
    var prev = 0L
    var prevLead = -1
    var prevSig = -1
    var k = 0
    while (k < n) {
      val cur = bits(k)
      if (k == 0) bw.write(cur, w)
      else {
        val xor = prev ^ cur
        if (xor == 0L) bw.write(0L, 1)
        else {
          val lead0 = if (w == 64) java.lang.Long.numberOfLeadingZeros(xor)
                      else java.lang.Long.numberOfLeadingZeros(xor) - 32
          val lead = math.min(lead0, 31) // must fit 5 bits
          val trail = java.lang.Long.numberOfTrailingZeros(xor)
          if (prevLead >= 0 && lead >= prevLead &&
              (w - lead - trail) <= prevSig &&
              trail >= (w - prevLead - prevSig)) {
            // reuse previous window
            bw.write(2L, 2) // '10'
            bw.write(xor >>> (w - prevLead - prevSig), prevSig)
          } else {
            val sig = w - lead - trail
            bw.write(3L, 2) // '11'
            bw.write(lead.toLong, 5)
            bw.write((sig - 1).toLong, lenBits)
            bw.write(xor >>> trail, sig)
            prevLead = lead
            prevSig = sig
          }
        }
      }
      prev = cur
      k += 1
    }
    bw.toBytes
  }

  /** decode `n` W-bit payloads produced by [[encode]] */
  def decode(buf: Array[Byte], n: Int, w: Int)(put: (Int, Long) => Unit): Unit = {
    val lenBits = if (w == 64) 6 else 5
    val br = new BitReader(buf)
    var prev = 0L
    var lead = 0
    var sig = 0
    var k = 0
    while (k < n) {
      if (k == 0) prev = br.read(w)
      else if (br.readBit()) {
        if (br.readBit()) { // '11': new window
          lead = br.read(5).toInt
          sig = br.read(lenBits).toInt + 1
        }
        val meaningful = br.read(sig)
        prev = prev ^ (meaningful << (w - lead - sig))
      } // '0': repeat of prev
      put(k, prev)
      k += 1
    }
  }
}
