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
    val bi = local.get()
    bi.setText(text)
    val tokens = Array.newBuilder[Token]
    var pos = -1 // position of the last *conceptual* token slot
    var length = 0
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      // status of the rule that matched the segment ending at `end`
      val status = bi.getRuleStatus
      if (status >= 100) { // WORD_NUMBER(100+)/WORD_LETTER(200+)/KANA/IDEO
        pos += 1
        if (end - start <= Analyzer.MaxTokenLength) {
          val term = text.substring(start, end).toLowerCase(java.util.Locale.ROOT)
          if (!stopWords.contains(term)) {
            tokens += Token(term, pos)
            length += 1
          }
        }
        // over-long: skipped but position already advanced
      }
      start = end
      end = bi.next()
    }
    Analyzed(tokens.result(), length, numOverlap = 0)
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
}

/** Whole-value single token (/root/reference/analysis/core/keywordTokenizer.go:16-96). */
final class KeywordAnalyzer extends Analyzer {
  override def apply(text: String): Analyzed =
    Analyzed(Array(Token(text, 0)), 1, 0)
}
