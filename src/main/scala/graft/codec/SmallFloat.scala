package graft.codec

/** Lossy float-to-byte quantization used for per-document field norms.
  *
  * Reproduces the 3-bit-mantissa / 5-bit-exponent / zero-point-15 encoding
  * of the reference engine (see /root/reference/core/util/smallFloat.go:15-28)
  * so that BM25 scores computed from the quantized norm are bit-identical to
  * the reference. Pure bit arithmetic on the IEEE-754 float32 representation.
  */
object SmallFloat {

  /** floatToByte(f, numMantissaBits=3, zeroExp=15): monotone lossy encode. */
  def floatToByte315(f: Float): Byte = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val smallfloat = bits >> (24 - 3)
    if (smallfloat <= ((63 - 15) << 3)) {
      if (bits <= 0) 0.toByte else 1.toByte
    } else if (smallfloat >= ((63 - 15) << 3) + 0x100) {
      -1.toByte // 255: saturate
    } else {
      (smallfloat - ((63 - 15) << 3)).toByte
    }
  }

  /** Inverse of [[floatToByte315]] (exact on the 256 representable points). */
  def byte315ToFloat(b: Byte): Float = {
    if (b == 0) return 0.0f
    var bits = (b & 0xff) << (24 - 3)
    bits += (63 - 15) << 24
    java.lang.Float.intBitsToFloat(bits)
  }

  /** The norm byte stored per (doc, field): encode(1/sqrt(length-numOverlap)).
    * Reference: /root/reference/core/search/similarities/bm25.go:108-110,134-143.
    */
  def encodeNorm(length: Int, numOverlap: Int, boost: Float = 1.0f): Byte = {
    val numTerms = length - numOverlap
    val norm =
      if (numTerms <= 0) boost
      else (boost.toDouble / math.sqrt(numTerms.toDouble)).toFloat
    floatToByte315(norm)
  }

  /** BM25's decoded "doc length" for a norm byte: 1/f^2 where f = decode(b).
    * Reference: /root/reference/core/search/similarities/bm25.go:77-84.
    */
  def decodeNormToDocLen(b: Byte): Float = {
    val f = byte315ToFloat(b)
    1.0f / (f * f)
  }
}
