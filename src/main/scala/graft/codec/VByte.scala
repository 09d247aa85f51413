package graft.codec

import java.nio.ByteBuffer

/** Variable-byte (vInt / vLong) encoding: 7 data bits per byte, high bit set
  * on continuation bytes. Byte-compatible with the classic Lucene wire format
  * (see /root/reference/core/store/output.go WriteVInt/WriteVLong semantics).
  *
  * Used for posting-row headers and the <128-entry vInt tail of posting
  * lists, including the `(delta<<1 | 1)` singleton-frequency trick
  * (/root/reference/core/index/termsHashConsumerPerField.go:334-346).
  */
object VByte {

  def writeVLong(out: GrowableBytes, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.add(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    out.add(v.toByte)
  }

  def writeVInt(out: GrowableBytes, v: Int): Unit =
    writeVLong(out, v.toLong & 0xffffffffL)

  def readVLong(in: ByteBuffer): Long = {
    var b = in.get()
    var v = (b & 0x7fL)
    var shift = 7
    while ((b & 0x80) != 0) {
      b = in.get()
      v |= (b & 0x7fL) << shift
      shift += 7
    }
    v
  }

  def readVInt(in: ByteBuffer): Int = readVLong(in).toInt
}

/** Minimal growable byte sink (avoids repeated array copies of
  * ByteArrayOutputStream's synchronized methods in hot encode loops).
  */
final class GrowableBytes(initial: Int = 64) {
  private var buf = new Array[Byte](initial)
  private var len = 0

  def add(b: Byte): Unit = {
    if (len == buf.length) grow(len + 1)
    buf(len) = b
    len += 1
  }

  def addAll(bs: Array[Byte], off: Int, n: Int): Unit = {
    if (len + n > buf.length) grow(len + n)
    System.arraycopy(bs, off, buf, len, n)
    len += n
  }

  private def grow(min: Int): Unit = {
    var cap = buf.length * 2
    while (cap < min) cap *= 2
    buf = java.util.Arrays.copyOf(buf, cap)
  }

  def size: Int = len
  def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
}
