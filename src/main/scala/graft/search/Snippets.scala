package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snippet/highlight planning over stored character offsets (format-3
  * indexes, IndexConfig.withOffsets) — the consumer the offsets stream
  * exists for. The index stores no raw content (only its sha256), so the
  * contract is Lucene-highlighter-shaped: the ENGINE supplies exact matched
  * spans and the best window; the CALLER applies them to its own copy of the
  * text ([[render]] does the string surgery given that text).
  *
  * Scale: span extraction is the postings-offsets scan (bounded per doc),
  * window planning is per-doc arithmetic over that doc's spans — nothing
  * corpus-sized, no re-tokenization of stored content anywhere.
  */
object Snippets {

  /** Best fixed-width window over a doc's span starts: the window anchored
    * at some span start containing the MOST span starts; ties break to the
    * earliest anchor. (Anchoring at span starts is a defined, deterministic
    * spec — an unanchored sliding window has the same max count.) Returns
    * (windowStart, matchesInWindow); input must be sorted ascending.
    */
  def bestWindow(spanStarts: Array[Int], window: Int): (Int, Int) = {
    require(spanStarts.nonEmpty, "no spans")
    var bestStart = spanStarts(0)
    var bestN = 0
    var i = 0
    var j = 0
    while (i < spanStarts.length) {
      val a = spanStarts(i)
      if (j < i) j = i
      while (j < spanStarts.length && spanStarts(j) < a + window) j += 1
      if (j - i > bestN) { bestN = j - i; bestStart = a }
      i += 1
    }
    (bestStart, bestN)
  }

  /** Distributed window planning over an [[IndexSearcher.offsets]]-shaped
    * DataFrame (docId, startOff, endOff): one row per doc with the best
    * window's start and its match count. Per-group state is that doc's
    * spans only.
    */
  def bestWindows(offsets: DataFrame, window: Int): DataFrame = {
    val spark = offsets.sparkSession
    import spark.implicits._
    offsets.select(col("docId").cast("long"), col("startOff").cast("int"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (docId: Long, it: Iterator[(Long, Int)]) =>
        val starts = it.map(_._2).toArray
        java.util.Arrays.sort(starts)
        val (s, n) = bestWindow(starts, window)
        (docId, s, n)
      }
      .toDF("docId", "winStart", "nMatches")
  }

  /** Merge several terms' span lists into one sorted, overlap-coalesced
    * list (the highlight mark-up set for one doc).
    */
  def coalesce(spans: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    if (spans.isEmpty) return Nil
    val sorted = spans.sortBy(s => (s._1, s._2))
    val out = scala.collection.mutable.ArrayBuffer(sorted.head)
    sorted.tail.foreach { case (s, e) =>
      val (ls, le) = out.last
      if (s <= le) out(out.length - 1) = (ls, math.max(le, e))
      else out += ((s, e))
    }
    out.toSeq
  }

  /** Apply spans to the caller's copy of the text: the best `window`-char
    * snippet with each in-window span wrapped in pre/post markers. Spans
    * must index into THIS text (the same bytes that were indexed).
    */
  def render(text: String, spans: Seq[(Int, Int)], window: Int,
      pre: String = "<b>", post: String = "</b>"): String = {
    if (spans.isEmpty) return text.substring(0, math.min(window, text.length))
    val merged = coalesce(spans)
    val (wStart, _) = bestWindow(merged.map(_._1).toArray, window)
    val wEnd = math.min(wStart + window, text.length)
    val sb = new java.lang.StringBuilder
    var cur = wStart
    merged.foreach { case (s, e) =>
      if (s >= wStart && s < wEnd) {
        val ce = math.min(e, wEnd)
        sb.append(text, cur, s).append(pre).append(text, s, ce).append(post)
        cur = ce
      }
    }
    sb.append(text, cur, wEnd)
    sb.toString
  }
}
