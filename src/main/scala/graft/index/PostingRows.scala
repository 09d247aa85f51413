package graft.index

import graft.codec.{PostingEntry, PostingsCodec}

/** Shared posting-row (re)construction: used by the build's reduce side and
  * by tiered merge — both combine sorted partial runs of the same
  * (field, term, rangeId) into one encoded row.
  */
object PostingRows {

  def fromEntries(entries: Array[PostingEntry], wave: Int, field: String,
      term: String, rangeId: Long, withPositions: Boolean,
      withOffsets: Boolean = false): PostingRow = {
    val enc = PostingsCodec.encode(entries, withPositions, withOffsets)
    PostingRow(wave, field, term, rangeId, enc.firstDocId, enc.lastDocId,
      enc.count, enc.ttf, enc.maxFreq, enc.minDl,
      enc.payload, enc.positions.orNull,
      enc.skip.lastDoc, enc.skip.offset, enc.skip.posOffset,
      enc.skip.maxFreq, enc.skip.minDl, enc.offsets.orNull)
  }

  /** Decode + concat + sort + re-encode a group of partial rows. */
  def merge(rows: Array[PostingRow], wave: Int): PostingRow = {
    if (rows.length == 1 && rows(0).segId == wave) return rows(0)
    val head = rows(0)
    val withPos = head.posPayload != null
    val withOff = head.offPayload != null
    val entries =
      if (rows.length == 1) decodeEntries(head, withPos)
      else rows.sortBy(_.firstDocId).flatMap(r => decodeEntries(r, withPos)).sortBy(_.docId)
    fromEntries(entries, wave, head.field, head.term, head.rangeId, withPos, withOff)
  }

  /** [[merge]] that additionally DROPS entries whose docId is in `dels`
    * (sorted ascending) — merge-time delete reclamation. None when every
    * entry of the group is deleted (the posting row vanishes physically).
    */
  def mergeFiltered(rows: Array[PostingRow], wave: Int,
      dels: Array[Long]): Option[PostingRow] = {
    if (dels.isEmpty) return Some(merge(rows, wave))
    val head = rows(0)
    val withPos = head.posPayload != null
    val withOff = head.offPayload != null
    val entries = rows.sortBy(_.firstDocId)
      .flatMap(r => decodeEntries(r, withPos))
      .filter(e => java.util.Arrays.binarySearch(dels, e.docId) < 0)
    if (entries.isEmpty) None
    else Some(fromEntries(entries.sortBy(_.docId), wave, head.field, head.term,
      head.rangeId, withPos, withOff))
  }

  def decodeEntries(r: PostingRow, withPos: Boolean): Array[PostingEntry] = {
    val dec = PostingsCodec.decode(r.payload)
    val poss =
      if (withPos && r.posPayload != null)
        PostingsCodec.decodePositions(r.posPayload, dec.freqs)
      else null
    val offs =
      if (r.offPayload != null) PostingsCodec.decodeOffsets(r.offPayload, dec.freqs)
      else null
    Array.tabulate(dec.length) { i =>
      PostingEntry(dec.docIds(i), dec.freqs(i), dec.dls(i), dec.norms(i),
        if (poss != null) poss(i) else Array.emptyIntArray,
        if (offs != null) offs(i) else Array.emptyIntArray)
    }
  }
}

/** Minimal growable int buffer (position lists in the invert hot loop). */
final class IntsBuf {
  private var a = new Array[Int](4)
  var n = 0
  def add(v: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
    a(n) = v
    n += 1
  }
  def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
}
