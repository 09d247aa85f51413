package graft.analysis

/** Porter stemming algorithm (Porter 1980), as used by the reference's
  * EnglishAnalyzer chain (/root/reference/analysis/en/porterStemmer.go,
  * /root/reference/analysis/en/analyzer.go:50-61). Independent
  * implementation of the published algorithm — steps 1a/1b/1c/2/3/4/5a/5b
  * over the measure/vowel framework.
  */
object Porter {

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.last == w.charAt(w.length - 2) && !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the last c is not w, x, or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else None
    } else None

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    var step1bFired = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
      w = w.dropRight(2); step1bFired = true
    } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
      w = w.dropRight(3); step1bFired = true
    }
    if (step1bFired) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }

    // step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // step 2 (m > 0)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.collectFirst {
      case (s, r) if w.endsWith(s) && measure(w.dropRight(s.length)) > 0 =>
        w.dropRight(s.length) + r
    }.foreach(w = _)

    // step 3 (m > 0)
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.collectFirst {
      case (s, r) if w.endsWith(s) && measure(w.dropRight(s.length)) > 0 =>
        w.dropRight(s.length) + r
    }.foreach(w = _)

    // step 4 (m > 1)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    val s4 = step4.collectFirst {
      case s if w.endsWith(s) && measure(w.dropRight(s.length)) > 1 &&
        (s != "ion" ) => w.dropRight(s.length)
    }
    // special "ion": only after s or t
    val s4ion =
      if (s4.isEmpty && w.endsWith("ion")) {
        val stem = w.dropRight(3)
        if (measure(stem) > 1 && stem.nonEmpty && "st".contains(stem.last)) Some(stem)
        else None
      } else None
    s4.orElse(s4ion).foreach(w = _)

    // step 5a (m > 1, or m == 1 and not *o)
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l")) w = w.dropRight(1)

    w
  }
}

/** EnglishAnalyzer equivalent (/root/reference/analysis/en/analyzer.go:50-61):
  * standard tokenize → possessive strip → lowercase → stop → Porter stem.
  */
final class EnglishAnalyzer(stopWords: Set[String]) extends Analyzer {
  def this() = this(Analyzer.EnglishStopWords)
  private val std = new StandardCodeAnalyzer(stopWords)

  override def apply(text: String): Analyzed = {
    val base = std(text)
    // possessive strip happens before stop in the reference; on our stop set
    // the order is observationally equivalent (no stopword ends in 's)
    val stemmed = base.tokens.map { t =>
      val noPoss =
        if (t.term.endsWith("'s") || t.term.endsWith("’s")) t.term.dropRight(2)
        else t.term
      Token(Porter.stem(noPoss), t.pos)
    }
    Analyzed(stemmed, base.length, base.numOverlap)
  }
}
