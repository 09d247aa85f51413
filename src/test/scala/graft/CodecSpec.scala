package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import scala.util.Random

import graft.codec._

class CodecSpec extends AnyFunSuite {

  test("SmallFloat315 round-trips the representable points and is monotone") {
    for (b <- 0 until 256) {
      val f = SmallFloat.byte315ToFloat(b.toByte)
      assert(SmallFloat.floatToByte315(f) == b.toByte || b == 0 || f.isInfinite())
    }
    assert(SmallFloat.floatToByte315(0.0f) == 0)
    assert(SmallFloat.byte315ToFloat(0) == 0.0f)
    val xs = Seq(1e-10f, 1e-4f, 0.01f, 0.1f, 0.25f, 0.5f, 1.0f, 2.0f, 7.0f, 100f)
    val encoded = xs.map(x => SmallFloat.floatToByte315(x) & 0xff)
    assert(encoded == encoded.sorted)
  }

  test("norm byte matches 1/sqrt(dl) quantization used by BM25") {
    val b1 = SmallFloat.encodeNorm(length = 1, numOverlap = 0)
    assert(math.abs(SmallFloat.byte315ToFloat(b1) - 1.0f) < 1e-6)
    val b4 = SmallFloat.encodeNorm(length = 4, numOverlap = 0)
    assert(math.abs(SmallFloat.byte315ToFloat(b4) - 0.5f) < 1e-6)
    assert(math.abs(SmallFloat.decodeNormToDocLen(b4) - 4.0f) < 1e-5)
  }

  test("vLong round-trip (property, seeded)") {
    val rnd = new Random(42)
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue) ++
      (1 to 500).map(_ => rnd.nextLong().abs)
    for (v <- vals) {
      val out = new GrowableBytes()
      VByte.writeVLong(out, v)
      assert(VByte.readVLong(ByteBuffer.wrap(out.toArray)) == v, s"v=$v")
    }
  }

  test("FOR block round-trip across bit widths and lengths (property, seeded)") {
    val rnd = new Random(7)
    val cases: Seq[Array[Long]] =
      (0 to 64).map { bits =>
        val max = if (bits == 0) 0L else if (bits == 64) Long.MaxValue else (1L << bits) - 1
        Array.fill(128)(if (max == 0) 0L else rnd.nextLong().abs % (max + (if (max == Long.MaxValue) 0 else 1)))
      } ++
        Seq(37, 1, 127, 128).map(n => Array.fill(n)(rnd.nextLong().abs % 5000)) ++
        Seq(Array.fill(128)(42L), Array.fill(5)(0L))
    for (arr <- cases) {
      val out = new GrowableBytes()
      ForBlock.writeBlock(out, arr, 0, arr.length)
      val dest = new Array[Long](arr.length)
      ForBlock.readBlock(ByteBuffer.wrap(out.toArray), dest, 0, arr.length)
      assert(dest.toSeq == arr.toSeq, s"n=${arr.length}")
    }
  }

  test("all-equal block encodes as single vLong (reference ForUtil special case)") {
    val out = new GrowableBytes()
    ForBlock.writeBlock(out, Array.fill(128)(7L), 0, 128)
    assert(out.size <= 3)
  }

  private def randomEntries(rnd: Random, n: Int, withPos: Boolean): Array[PostingEntry] = {
    var id = rnd.nextLong().abs % (1L << 41)
    (0 until n).map { _ =>
      id += 1 + rnd.nextInt(5000)
      val freq = 1 + rnd.nextInt(300)
      val dl = 1 + rnd.nextInt(4096)
      val ps =
        if (withPos) {
          var p = -1
          Array.fill(freq) { p += 1 + rnd.nextInt(7); p }
        } else Array.emptyIntArray
      PostingEntry(id, freq, dl, SmallFloat.encodeNorm(dl, 0), ps)
    }.toArray
  }

  test("postings codec round-trip (docIds, freqs, dls, norms, positions)") {
    val rnd = new Random(2026)
    for (n <- Seq(1, 3, 127, 128, 129, 300, 1000); _ <- 1 to 5) {
      val entries = randomEntries(rnd, n, withPos = true)
      val enc = PostingsCodec.encode(entries, withPositions = true)
      assert(enc.count == entries.length)
      assert(enc.firstDocId == entries.head.docId)
      assert(enc.lastDocId == entries.last.docId)
      assert(enc.ttf == entries.map(_.freq.toLong).sum)
      val dec = PostingsCodec.decode(enc.payload)
      assert(dec.docIds.toSeq == entries.map(_.docId).toSeq)
      assert(dec.freqs.toSeq == entries.map(_.freq).toSeq)
      assert(dec.dls.toSeq == entries.map(_.dl).toSeq)
      assert(dec.norms.toSeq == entries.map(_.norm).toSeq)
      val poss = PostingsCodec.decodePositions(enc.positions.get, dec.freqs)
      entries.indices.foreach(i => assert(poss(i).toSeq == entries(i).positions.toSeq))
      val nBlocks = (n + 127) / 128
      assert(enc.skip.lastDoc.length == nBlocks)
      assert(enc.skip.lastDoc.last == entries.last.docId)
      val blockMax = entries.grouped(128).map(_.map(_.freq).max).toSeq
      assert(enc.skip.maxFreq.toSeq == blockMax)
      val blockMinDl = entries.grouped(128).map(_.map(_.dl).min).toSeq
      assert(enc.skip.minDl.toSeq == blockMinDl)
    }
  }

  test("offsets stream round-trips (format 3): per-occurrence (start, end) pairs") {
    val rnd = new Random(77)
    for (n <- Seq(1, 127, 128, 300); _ <- 1 to 5) {
      val entries = randomEntries(rnd, n, withPos = true).map { e =>
        // offsets consistent with positions: monotone starts, end > start
        var off = rnd.nextInt(50)
        val os = new Array[Int](e.freq * 2)
        var k = 0
        while (k < os.length) {
          val len = 1 + rnd.nextInt(20)
          os(k) = off; os(k + 1) = off + len
          off += len + 1 + rnd.nextInt(5)
          k += 2
        }
        e.copy(offsets = os)
      }
      val enc = PostingsCodec.encode(entries, withPositions = true, withOffsets = true)
      val dec = PostingsCodec.decode(enc.payload)
      val offs = PostingsCodec.decodeOffsets(enc.offsets.get, dec.freqs)
      entries.indices.foreach(i =>
        assert(offs(i).toSeq == entries(i).offsets.toSeq, s"entry $i"))
      // positions stream is unaffected by the offsets stream
      val poss = PostingsCodec.decodePositions(enc.positions.get, dec.freqs)
      entries.indices.foreach(i => assert(poss(i).toSeq == entries(i).positions.toSeq))
    }
    // freq/offsets length mismatch is rejected at encode time
    val bad = randomEntries(rnd, 1, withPos = true)
      .map(e => e.copy(offsets = Array(0, 3))) // freq > 1 but one pair
      .filter(_.freq > 1)
    if (bad.nonEmpty)
      intercept[IllegalArgumentException](
        PostingsCodec.encode(bad, withPositions = true, withOffsets = true))
  }

  test("decodeRange (skip-entry navigation) equals filtered full decode") {
    val rnd = new Random(99)
    for (n <- Seq(5, 128, 300, 1000)) {
      val entries = randomEntries(rnd, n, withPos = false)
      val enc = PostingsCodec.encode(entries, withPositions = false)
      val full = PostingsCodec.decode(enc.payload)
      for (_ <- 1 to 10) {
        val a = entries(rnd.nextInt(n)).docId - rnd.nextInt(1000)
        val b = a + rnd.nextInt(2000000)
        val ranged = PostingsCodec.decodeRange(enc.payload, enc.skip, a, b)
        val expIdx = full.docIds.indices.filter(i => full.docIds(i) >= a && full.docIds(i) <= b)
        assert(ranged.docIds.toSeq == expIdx.map(full.docIds), s"n=$n [$a,$b]")
        assert(ranged.freqs.toSeq == expIdx.map(full.freqs))
        assert(ranged.dls.toSeq == expIdx.map(full.dls))
        assert(ranged.norms.toSeq == expIdx.map(full.norms))
      }
      // out-of-range → empty
      val none = PostingsCodec.decodeRange(enc.payload, enc.skip,
        entries.last.docId + 1, entries.last.docId + 100)
      assert(none.length == 0)
    }
  }

  test("singleton (df=1, freq=1) posting stays tiny (reference pulsing analogue)") {
    val e = Array(PostingEntry(123456789L, 1, 10, SmallFloat.encodeNorm(10, 0), Array(3)))
    val enc = PostingsCodec.encode(e, withPositions = true)
    assert(enc.payload.length < 16)
  }
}
