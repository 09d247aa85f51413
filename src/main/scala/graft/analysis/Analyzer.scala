package graft.analysis

import com.ibm.icu.text.{BreakIterator, RuleBasedBreakIterator}
import com.ibm.icu.util.ULocale

/** A token: lowercased term + position (position counts removed stopwords and
  * skipped over-long tokens, reproducing Lucene position-increment semantics:
  * /root/reference/analysis/core/stopFilter.go:40-44,
  * /root/reference/analysis/standard/tokenizer.go:104-133).
  */
final case class Token(term: String, pos: Int)

/** Analysis result for one (doc, field): the tokens plus the counters that
  * feed norm computation (/root/reference/core/index/invert.go:15-86 —
  * FieldInvertState.length/numOverlap).
  */
final case class Analyzed(tokens: Array[Token], length: Int, numOverlap: Int)

/** An analyzer = pure `String => Analyzed`. Implementations must be
  * thread-safe (they run inside executor tasks).
  */
trait Analyzer extends Serializable {
  def apply(text: String): Analyzed

  /** Visitor fast path (no Token allocation); implementations may override
    * with an allocation-lean native loop.
    */
  def tokenize(text: String)(emit: (String, Int) => Unit): Unit =
    apply(text).tokens.foreach(t => emit(t.term, t.pos))

  /** Visitor with CHARACTER OFFSETS (term, pos, startOffset, endOffset) —
    * required by offset-storing indexes (IndexConfig.withOffsets). Analyzers
    * that cannot attribute offsets (wrapping/filtering chains that merge
    * tokens) must not be used with withOffsets — this default makes the
    * failure explicit at build time instead of silently storing garbage.
    */
  def tokenizeWithOffsets(text: String)(emit: (String, Int, Int, Int) => Unit): Unit =
    throw new UnsupportedOperationException(
      s"${getClass.getName} does not produce character offsets; " +
        "use an offset-capable analyzer or disable IndexConfig.withOffsets")
}

object Analyzer {
  /** Lucene's 33-word English stop set
    * (/root/reference/analysis/standard/analyzer.go:16-22).
    */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  val MaxTokenLength = 255 // /root/reference/analysis/standard/analyzer.go:13
}

/** StandardAnalyzer equivalent: UAX#29 word-break tokenizer → lowercase →
  * stop filter (/root/reference/analysis/standard/analyzer.go:57-71).
  *
  * The reference's tokenizer is a JFlex DFA generated from the UAX#29 spec
  * (/root/reference/analysis/standard/tokenizerImpl.go); we use ICU4J's
  * RuleBasedBreakIterator, which implements the same spec, keeping segments
  * whose rule status marks them as letter/number/kana/ideographic words.
  * Over-long tokens (>255 chars) are dropped but still advance the position
  * (/root/reference/analysis/standard/tokenizer.go:114-131); stopwords are
  * dropped after lowercasing, also advancing position. `length` counts only
  * emitted tokens; `numOverlap` counts position-increment-0 tokens (always 0
  * here — no synonym/graph filters).
  */
final class StandardCodeAnalyzer(stopWords: Set[String]) extends Analyzer {
  def this() = this(Analyzer.EnglishStopWords)

  @transient private lazy val proto: RuleBasedBreakIterator =
    BreakIterator.getWordInstance(ULocale.ROOT).asInstanceOf[RuleBasedBreakIterator]

  @transient private lazy val local = new ThreadLocal[RuleBasedBreakIterator] {
    override def initialValue(): RuleBasedBreakIterator =
      proto.clone().asInstanceOf[RuleBasedBreakIterator]
  }

  override def apply(text: String): Analyzed = {
    val tokens = Array.newBuilder[Token]
    tokenize(text) { (term, pos) => tokens += Token(term, pos) }
    val result = tokens.result()
    Analyzed(result, result.length, numOverlap = 0)
  }

  // stopwords bucketed by length as char arrays: zero-allocation membership
  // test against the lowered char buffer
  @transient private lazy val stopByLen: Array[Array[Array[Char]]] = {
    val maxLen = if (stopWords.isEmpty) 0 else stopWords.map(_.length).max
    Array.tabulate(maxLen + 1)(l => stopWords.filter(_.length == l).map(_.toCharArray).toArray)
  }

  private def isStop(buf: Array[Char], n: Int): Boolean = {
    if (n >= stopByLen.length) return false
    val cands = stopByLen(n)
    var i = 0
    while (i < cands.length) {
      val w = cands(i)
      var j = 0
      while (j < n && w(j) == buf(j)) j += 1
      if (j == n) return true
      i += 1
    }
    false
  }

  /** Token count (= BM25 dl for this analyzer) without ANY per-token
    * allocation — the stored-fields pass needs only this.
    */
  def countTokens(text: String): Int = {
    val bi = local.get()
    bi.setText(text)
    var count = 0
    var buf = new Array[Char](64)
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      if (bi.getRuleStatus >= 100) {
        val n = end - start
        if (n <= Analyzer.MaxTokenLength) {
          if (buf.length < n) buf = new Array[Char](math.max(n, buf.length * 2))
          var i = 0
          var ascii = true
          while (i < n) {
            val c = text.charAt(start + i)
            if (c < 128) buf(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
            else { ascii = false; buf(i) = c }
            i += 1
          }
          if (ascii) { if (!isStop(buf, n)) count += 1 }
          else {
            // rare non-ASCII path falls back to string semantics
            val term = new String(buf, 0, n).toLowerCase(java.util.Locale.ROOT)
            if (!stopWords.contains(term)) count += 1
          }
        }
      }
      start = end
      end = bi.next()
    }
    count
  }

  /** Allocation-lean visitor path for the build hot loop: one String per
    * emitted token (single-pass lowercase extraction, ASCII fast path),
    * no Token objects.
    */
  override def tokenize(text: String)(emit: (String, Int) => Unit): Unit = {
    val bi = local.get()
    bi.setText(text)
    var pos = -1 // position of the last *conceptual* token slot
    var start = bi.first()
    var end = bi.next()
    var buf = new Array[Char](64)
    while (end != BreakIterator.DONE) {
      // status of the rule that matched the segment ending at `end`
      val status = bi.getRuleStatus
      if (status >= 100) { // WORD_NUMBER(100+)/WORD_LETTER(200+)/KANA/IDEO
        pos += 1
        val n = end - start
        if (n <= Analyzer.MaxTokenLength) {
          if (buf.length < n) buf = new Array[Char](math.max(n, buf.length * 2))
          var i = 0
          var ascii = true
          while (i < n) {
            val c = text.charAt(start + i)
            if (c < 128) buf(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
            else { ascii = false; buf(i) = c }
            i += 1
          }
          val term =
            if (ascii) new String(buf, 0, n)
            else new String(buf, 0, n).toLowerCase(java.util.Locale.ROOT)
          if (!stopWords.contains(term)) emit(term, pos)
        }
        // over-long: skipped but position already advanced
      }
      start = end
      end = bi.next()
    }
  }

  /** Offset-emitting twin of [[tokenize]]: offsets are [start, end) char
    * indexes into the ORIGINAL text (lowercasing is per-char here).
    */
  override def tokenizeWithOffsets(text: String)(emit: (String, Int, Int, Int) => Unit): Unit = {
    val bi = local.get()
    bi.setText(text)
    var pos = -1
    var start = bi.first()
    var end = bi.next()
    var buf = new Array[Char](64)
    while (end != BreakIterator.DONE) {
      if (bi.getRuleStatus >= 100) {
        pos += 1
        val n = end - start
        if (n <= Analyzer.MaxTokenLength) {
          if (buf.length < n) buf = new Array[Char](math.max(n, buf.length * 2))
          var i = 0
          var ascii = true
          while (i < n) {
            val c = text.charAt(start + i)
            if (c < 128) buf(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
            else { ascii = false; buf(i) = c }
            i += 1
          }
          val term =
            if (ascii) new String(buf, 0, n)
            else new String(buf, 0, n).toLowerCase(java.util.Locale.ROOT)
          if (!stopWords.contains(term)) emit(term, pos, start, end)
        }
      }
      start = end
      end = bi.next()
    }
  }
}

/** Whitespace/regex analyzer whose semantics are exactly expressible in ANSI
  * SQL (`regexp_split_to_array(lower(text), '[^a-z0-9]+')`) — used for the
  * DuckDB-oracle-verified query surface so both sides tokenize identically.
  * Equivalent in spirit to the reference's LetterTokenizer-style paths.
  */
final class SimpleAnalyzer(stopWords: Set[String]) extends Analyzer {
  def this() = this(Set.empty)

  override def apply(text: String): Analyzed = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val tokens = Array.newBuilder[Token]
    var pos = -1
    var length = 0
    var i = 0
    val n = lower.length
    while (i < n) {
      var c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < n && { c = lower.charAt(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') }) i += 1
        pos += 1
        val term = lower.substring(start, i)
        if (!stopWords.contains(term)) {
          tokens += Token(term, pos)
          length += 1
        }
      } else i += 1
    }
    Analyzed(tokens.result(), length, numOverlap = 0)
  }

  /** Offsets index into the LOWERCASED text (1:1 with the original for any
    * corpus whose lowercase mapping preserves length — all ASCII).
    */
  override def tokenizeWithOffsets(text: String)(emit: (String, Int, Int, Int) => Unit): Unit = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    var pos = -1
    var i = 0
    val n = lower.length
    while (i < n) {
      var c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < n && { c = lower.charAt(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') }) i += 1
        pos += 1
        val term = lower.substring(start, i)
        if (!stopWords.contains(term)) emit(term, pos, start, i)
      } else i += 1
    }
  }
}

/** Whole-value single token (/root/reference/analysis/core/keywordTokenizer.go:16-96). */
final class KeywordAnalyzer extends Analyzer {
  override def apply(text: String): Analyzed =
    Analyzed(Array(Token(text, 0)), 1, 0)
  override def tokenizeWithOffsets(text: String)(emit: (String, Int, Int, Int) => Unit): Unit =
    emit(text, 0, 0, text.length)
}
