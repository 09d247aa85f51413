package graft.codec

import java.nio.ByteBuffer

/** One posting entry at encode time.
  *
  * `dl` is the exact BM25 document length (tokens minus overlaps) and `norm`
  * its lossy byte315 quantization (reference parity; see
  * /root/reference/core/search/similarities/bm25.go:108-143). Storing both in
  * the posting list denormalizes the per-doc norm into the inverted lists so
  * query-time scoring needs NO join against the docs table — at 10^12-doc
  * scale a norms join would shuffle the full corpus per query.
  */
final case class PostingEntry(
    docId: Long,
    freq: Int,
    dl: Int,
    norm: Byte,
    positions: Array[Int],
    /** Flattened (start, end) char-offset pairs, length 2·freq — present
      * only when the index stores offsets (IndexOptions-style gate,
      * reference postingsWriter.go:323-381 offset flags). Empty otherwise.
      */
    offsets: Array[Int] = Array.emptyIntArray)

/** A decoded posting run (column-striped, sorted by docId ascending). */
final class DecodedPostings(
    val docIds: Array[Long],
    val freqs: Array[Int],
    val dls: Array[Int],
    val norms: Array[Byte]) {
  def length: Int = docIds.length
}

/** Per-128-doc-block skip + block-max metadata, stored as plain Parquet array
  * columns on the posting row (the "skip entries" of the reference's
  * multi-level skip list, /root/reference/core/codec/lucene41/skipWriter.go:36-55,
  * flattened to one level because rows are already bounded docId ranges).
  * `maxFreq`/`minDl` are block-max WAND bounds — additive over the reference
  * (Lucene 4.10 predates impacts).
  */
final case class SkipData(
    lastDoc: Array[Long],
    offset: Array[Int],
    posOffset: Array[Int],
    maxFreq: Array[Int],
    minDl: Array[Int])

final case class EncodedPostings(
    count: Int,
    firstDocId: Long,
    lastDocId: Long,
    payload: Array[Byte],
    positions: Option[Array[Byte]],
    /** vInt stream of per-occurrence (startΔ, len) pairs, delta per entry —
      * decoded whole-row like positions (no per-block skip: offsets are a
      * retrieval-time stream, never on the scoring path).
      */
    offsets: Option[Array[Byte]],
    skip: SkipData,
    ttf: Long,
    maxFreq: Int,
    minDl: Int)

/** Block postings codec: delta + FOR-128 packed docIds/freqs/doc-lengths with
  * raw norm bytes, a vInt tail with the reference's `(delta<<1|1)`
  * singleton-freq trick (/root/reference/core/codec/lucene41/postingsWriter.go:418-440),
  * and per-block skip/block-max metadata.
  */
object PostingsCodec {
  import ForBlock.BlockSize

  /** Bump when the on-disk posting layout changes (invalidates caches). */
  val FormatVersion = 1

  def encode(entries: Array[PostingEntry], withPositions: Boolean,
      withOffsets: Boolean = false): EncodedPostings = {
    require(entries.nonEmpty, "empty posting run")
    var v = 1
    while (v < entries.length) {
      require(entries(v).docId > entries(v - 1).docId,
        s"unsorted/duplicate docIds at $v: ${entries(v - 1).docId} -> ${entries(v).docId}")
      v += 1
    }
    val n = entries.length
    val out = new GrowableBytes(n * 3 + 16)
    val posOut = if (withPositions) new GrowableBytes(n * 2) else null
    val offOut = if (withOffsets) new GrowableBytes(n * 4) else null
    VByte.writeVInt(out, n)
    val base = entries(0).docId
    VByte.writeVLong(out, base)

    val nBlocks = (n + BlockSize - 1) / BlockSize
    val skipLast = new Array[Long](nBlocks)
    val skipOff = new Array[Int](nBlocks)
    val skipPosOff = new Array[Int](nBlocks)
    val skipMaxFreq = new Array[Int](nBlocks)
    val skipMinDl = new Array[Int](nBlocks)

    val deltas = new Array[Long](BlockSize)
    val freqs = new Array[Long](BlockSize)
    val dls = new Array[Long](BlockSize)

    var ttf = 0L
    var globalMaxFreq = 0
    var globalMinDl = Int.MaxValue
    var prevDoc = base
    var i = 0
    var block = 0
    while (i < n) {
      val len = math.min(BlockSize, n - i)
      skipOff(block) = out.size
      skipPosOff(block) = if (withPositions) posOut.size else 0
      var bMaxFreq = 0
      var bMinDl = Int.MaxValue
      if (len == BlockSize) {
        var j = 0
        while (j < len) {
          val e = entries(i + j)
          deltas(j) = e.docId - prevDoc // first block, first entry: 0
          prevDoc = e.docId
          freqs(j) = e.freq.toLong
          dls(j) = e.dl.toLong
          if (e.freq > bMaxFreq) bMaxFreq = e.freq
          if (e.dl < bMinDl) bMinDl = e.dl
          ttf += e.freq
          j += 1
        }
        ForBlock.writeBlock(out, deltas, 0, len)
        ForBlock.writeBlock(out, freqs, 0, len)
        ForBlock.writeBlock(out, dls, 0, len)
        j = 0
        while (j < len) { out.add(entries(i + j).norm); j += 1 }
      } else {
        // vInt tail, reference singleton-freq encoding
        var j = 0
        while (j < len) {
          val e = entries(i + j)
          val delta = e.docId - prevDoc
          prevDoc = e.docId
          if (e.freq == 1) VByte.writeVLong(out, (delta << 1) | 1L)
          else { VByte.writeVLong(out, delta << 1); VByte.writeVInt(out, e.freq) }
          VByte.writeVInt(out, e.dl)
          out.add(e.norm)
          if (e.freq > bMaxFreq) bMaxFreq = e.freq
          if (e.dl < bMinDl) bMinDl = e.dl
          ttf += e.freq
          j += 1
        }
      }
      if (withPositions) {
        var j = 0
        while (j < len) {
          val ps = entries(i + j).positions
          var prev = 0
          var k = 0
          while (k < ps.length) {
            VByte.writeVInt(posOut, ps(k) - prev)
            prev = ps(k)
            k += 1
          }
          j += 1
        }
      }
      if (withOffsets) {
        // per occurrence: vInt(start - prevStart), vInt(end - start);
        // prevStart resets per entry (entries decode independently)
        var j = 0
        while (j < len) {
          val os = entries(i + j).offsets
          require(os.length == entries(i + j).freq * 2,
            s"offsets must be 2*freq ints, got ${os.length} for freq ${entries(i + j).freq}")
          var prev = 0
          var k = 0
          while (k < os.length) {
            VByte.writeVInt(offOut, os(k) - prev)
            VByte.writeVInt(offOut, os(k + 1) - os(k))
            prev = os(k)
            k += 2
          }
          j += 1
        }
      }
      skipLast(block) = prevDoc
      skipMaxFreq(block) = bMaxFreq
      skipMinDl(block) = bMinDl
      if (bMaxFreq > globalMaxFreq) globalMaxFreq = bMaxFreq
      if (bMinDl < globalMinDl) globalMinDl = bMinDl
      i += len
      block += 1
    }

    EncodedPostings(
      count = n,
      firstDocId = base,
      lastDocId = prevDoc,
      payload = out.toArray,
      positions = if (withPositions) Some(posOut.toArray) else None,
      offsets = if (withOffsets) Some(offOut.toArray) else None,
      skip = SkipData(skipLast, skipOff, skipPosOff, skipMaxFreq, skipMinDl),
      ttf = ttf,
      maxFreq = globalMaxFreq,
      minDl = globalMinDl)
  }

  /** Decode the full run (rows are bounded docId ranges, so full decode is a
    * cache-friendly array sweep; block skipping happens at row granularity
    * via firstDocId/lastDocId Parquet column pruning, and within a row via
    * [[decodeRange]]).
    */
  def decode(payload: Array[Byte]): DecodedPostings = {
    val in = ByteBuffer.wrap(payload)
    val n = VByte.readVInt(in)
    val base = VByte.readVLong(in)
    val docIds = new Array[Long](n)
    val freqs = new Array[Int](n)
    val dls = new Array[Int](n)
    val norms = new Array[Byte](n)
    val tmp = new Array[Long](BlockSize)
    var prevDoc = base
    var i = 0
    while (i < n) {
      val len = math.min(BlockSize, n - i)
      if (len == BlockSize) {
        ForBlock.readBlock(in, tmp, 0, len)
        var j = 0
        while (j < len) { prevDoc += tmp(j); docIds(i + j) = prevDoc; j += 1 }
        ForBlock.readBlock(in, tmp, 0, len)
        j = 0
        while (j < len) { freqs(i + j) = tmp(j).toInt; j += 1 }
        ForBlock.readBlock(in, tmp, 0, len)
        j = 0
        while (j < len) { dls(i + j) = tmp(j).toInt; j += 1 }
        in.get(norms, i, len)
      } else {
        var j = 0
        while (j < len) {
          val code = VByte.readVLong(in)
          prevDoc += (code >>> 1)
          docIds(i + j) = prevDoc
          freqs(i + j) = if ((code & 1L) != 0) 1 else VByte.readVInt(in)
          dls(i + j) = VByte.readVInt(in)
          norms(i + j) = in.get()
          j += 1
        }
      }
      i += len
    }
    new DecodedPostings(docIds, freqs, dls, norms)
  }

  /** Skip-entry navigation: decode ONLY the 128-blocks intersecting
    * [minDoc, maxDoc] using the row's skip offsets — the read-side use of
    * the skip list (reference Advance,
    * /root/reference/core/codec/lucene41/postingsReader.go:495-545).
    * Returns entries with docIds possibly outside the bounds at block edges;
    * callers filter.
    */
  def decodeRange(payload: Array[Byte], skip: SkipData,
      minDoc: Long, maxDoc: Long): DecodedPostings = {
    val in = ByteBuffer.wrap(payload)
    val n = VByte.readVInt(in)
    val base = VByte.readVLong(in)
    val nBlocks = skip.lastDoc.length
    // first block whose lastDoc >= minDoc (binary search over skip entries)
    var lo = 0
    var hi = nBlocks - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (skip.lastDoc(mid) < minDoc) lo = mid + 1 else hi = mid
    }
    val fromBlock = lo
    if (skip.lastDoc(nBlocks - 1) < minDoc)
      return new DecodedPostings(Array.empty, Array.empty, Array.empty, Array.empty)

    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    val outF = scala.collection.mutable.ArrayBuilder.make[Int]
    val outD = scala.collection.mutable.ArrayBuilder.make[Int]
    val outN = scala.collection.mutable.ArrayBuilder.make[Byte]
    val tmp = new Array[Long](BlockSize)
    var block = fromBlock
    var continue = true
    while (continue && block < nBlocks) {
      val blockStart = block * BlockSize
      val len = math.min(BlockSize, n - blockStart)
      in.position(skip.offset(block))
      // delta decoding restarts from the previous block's lastDoc (block 0:
      // the base written in the header)
      var prevDoc = if (block == 0) base else skip.lastDoc(block - 1)
      if (len == BlockSize) {
        ForBlock.readBlock(in, tmp, 0, len)
        val ids = new Array[Long](len)
        var j = 0
        while (j < len) { prevDoc += tmp(j); ids(j) = prevDoc; j += 1 }
        ForBlock.readBlock(in, tmp, 0, len)
        val fs = new Array[Int](len)
        j = 0
        while (j < len) { fs(j) = tmp(j).toInt; j += 1 }
        ForBlock.readBlock(in, tmp, 0, len)
        val ds = new Array[Int](len)
        j = 0
        while (j < len) { ds(j) = tmp(j).toInt; j += 1 }
        val ns = new Array[Byte](len)
        in.get(ns, 0, len)
        j = 0
        while (j < len) {
          if (ids(j) >= minDoc && ids(j) <= maxDoc) {
            out += ids(j); outF += fs(j); outD += ds(j); outN += ns(j)
          }
          j += 1
        }
      } else {
        var j = 0
        while (j < len) {
          val code = VByte.readVLong(in)
          prevDoc += (code >>> 1)
          val f = if ((code & 1L) != 0) 1 else VByte.readVInt(in)
          val d = VByte.readVInt(in)
          val nb = in.get()
          if (prevDoc >= minDoc && prevDoc <= maxDoc) {
            out += prevDoc; outF += f; outD += d; outN += nb
          }
          j += 1
        }
      }
      if (skip.lastDoc(block) > maxDoc) continue = false
      block += 1
    }
    new DecodedPostings(out.result(), outF.result(), outD.result(), outN.result())
  }

  /** Decode per-entry flattened (start, end) offset pairs aligned with
    * [[decode]] output: freqs(i) pairs per entry.
    */
  def decodeOffsets(offPayload: Array[Byte], freqs: Array[Int]): Array[Array[Int]] = {
    val in = ByteBuffer.wrap(offPayload)
    val res = new Array[Array[Int]](freqs.length)
    var i = 0
    while (i < freqs.length) {
      val f = freqs(i)
      val os = new Array[Int](f * 2)
      var prev = 0
      var k = 0
      while (k < f * 2) {
        prev += VByte.readVInt(in)
        os(k) = prev
        os(k + 1) = prev + VByte.readVInt(in)
        k += 2
      }
      res(i) = os
      i += 1
    }
    res
  }

  /** Decode per-entry position arrays aligned with [[decode]] output.
    * freqs(i) positions per entry, delta-encoded vInts.
    */
  def decodePositions(posPayload: Array[Byte], freqs: Array[Int]): Array[Array[Int]] = {
    val in = ByteBuffer.wrap(posPayload)
    val res = new Array[Array[Int]](freqs.length)
    var i = 0
    while (i < freqs.length) {
      val f = freqs(i)
      val ps = new Array[Int](f)
      var prev = 0
      var k = 0
      while (k < f) {
        prev += VByte.readVInt(in)
        ps(k) = prev
        k += 1
      }
      res(i) = ps
      i += 1
    }
    res
  }
}
