package graft.codec

import java.nio.ByteBuffer

/** Frame-of-reference block packer: fixed-size blocks of non-negative longs,
  * bit-packed at `bitsRequired(max)` bits per value, with a 1-byte header.
  *
  * Header semantics follow the reference's ForUtil
  * (/root/reference/core/codec/lucene41/forUtil.go:150-211): header byte 0
  * means ALL_VALUES_EQUAL and is followed by a single vLong; otherwise the
  * header is the bit width (1..64) followed by ceil(n*bits/8) packed bytes.
  * Unlike the reference we pack longs (docIds at 10^12-file scale exceed
  * int32) and replace its 33 generated specializations with one generic
  * positional bit loop — decode cost at query time is dominated by the scan,
  * not this loop.
  *
  * Bit layout: value i occupies bits [i*bits, (i+1)*bits) of a little-endian
  * bit stream (bit k lives in byte k>>3 at in-byte position k&7).
  */
object ForBlock {
  val BlockSize = 128 // reference LUCENE41_BLOCK_SIZE (postingsFormat.go:22)

  def bitsRequired(v: Long): Int = {
    require(v >= 0, s"negative value $v")
    64 - java.lang.Long.numberOfLeadingZeros(v | 1L)
  }

  /** Pack values(off until off+n). n may be < BlockSize for tail blocks. */
  def writeBlock(out: GrowableBytes, values: Array[Long], off: Int, n: Int): Unit = {
    var max = 0L
    var allEqual = true
    var i = off
    while (i < off + n) {
      if (values(i) > max) max = values(i)
      if (values(i) != values(off)) allEqual = false
      i += 1
    }
    if (allEqual) {
      out.add(0.toByte)
      VByte.writeVLong(out, values(off))
      return
    }
    val bits = bitsRequired(max)
    out.add(bits.toByte)
    val nBytes = (n * bits + 7) / 8
    val packed = new Array[Byte](nBytes)
    i = 0
    while (i < n) {
      val v = values(off + i)
      var bitPos = i * bits
      var remaining = bits
      var vv = v
      while (remaining > 0) {
        val bytePos = bitPos >> 3
        val bitOff = bitPos & 7
        val take = math.min(8 - bitOff, remaining)
        packed(bytePos) = (packed(bytePos) | ((vv & ((1L << take) - 1)) << bitOff)).toByte
        vv >>>= take
        bitPos += take
        remaining -= take
      }
      i += 1
    }
    out.addAll(packed, 0, nBytes)
  }

  /** Decode n values into dest(off until off+n). */
  def readBlock(in: ByteBuffer, dest: Array[Long], off: Int, n: Int): Unit = {
    val bits = in.get() & 0xff
    if (bits == 0) {
      val v = VByte.readVLong(in)
      var i = 0
      while (i < n) { dest(off + i) = v; i += 1 }
      return
    }
    val nBytes = (n * bits + 7) / 8
    val packed = new Array[Byte](nBytes)
    in.get(packed)
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    var i = 0
    while (i < n) {
      var v = 0L
      var bitPos = i * bits
      var gotBits = 0
      while (gotBits < bits) {
        val bytePos = bitPos >> 3
        val bitOff = bitPos & 7
        val take = math.min(8 - bitOff, bits - gotBits)
        val chunk = ((packed(bytePos) & 0xff) >>> bitOff) & ((1 << take) - 1)
        v |= chunk.toLong << gotBits
        gotBits += take
        bitPos += take
      }
      dest(off + i) = v & mask
      i += 1
    }
  }
}
