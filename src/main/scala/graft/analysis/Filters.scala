package graft.analysis

/** UpperCaseFilter (reference analysis/core/uppercaseFilter.go): uppercases
  * every emitted token; positions/length/overlap unchanged.
  */
final class UpperCaseFilterAnalyzer(inner: Analyzer) extends Analyzer {
  override def apply(text: String): Analyzed = {
    val a = inner(text)
    Analyzed(
      a.tokens.map(t => Token(t.term.toUpperCase(java.util.Locale.ROOT), t.pos)),
      a.length, a.numOverlap)
  }
}

/** CommonGramsFilter (reference analysis/commongram/commonGramsFilter.go:
  * 14-121): emits every token of the inner stream unchanged, plus a bigram
  * `prev_cur` at the PREVIOUS token's position (positionIncrement 0 in the
  * reference) whenever the previous OR the current token is a common word.
  * Gram tokens are overlap tokens, so norms discount them (numOverlap).
  *
  * Use over a non-stop-filtered inner analyzer: the point of common grams is
  * to keep stopword context as bigrams instead of dropping it.
  */
final class CommonGramsAnalyzer(inner: Analyzer, commonWords: Set[String]) extends Analyzer {
  def this(inner: Analyzer) = this(inner, Analyzer.EnglishStopWords)

  override def apply(text: String): Analyzed = {
    val analyzed = inner(text)
    val in = analyzed.tokens
    val out = Array.newBuilder[Token]
    var grams = 0
    var i = 0
    while (i < in.length) {
      val t = in(i)
      if (i > 0) {
        val prev = in(i - 1)
        if (commonWords.contains(prev.term) || commonWords.contains(t.term)) {
          out += Token(prev.term + "_" + t.term, prev.pos)
          grams += 1
        }
      }
      out += t
      i += 1
    }
    // inner stats carry through: grams ADD to both length and numOverlap,
    // they don't replace whatever the inner chain already reported
    Analyzed(out.result(), analyzed.length + grams, analyzed.numOverlap + grams)
  }
}
