package graft.search

import graft.analysis.Analyzer

/** Classic query-parser subset actually implemented by the reference
  * (/root/reference/queryparser/classic/queryParser.go:118-244 — the
  * productions that do NOT panic): `AND OR NOT + - ( ) field: "quoted" term`,
  * default operator OR. Bare text is re-analyzed with the index analyzer
  * (/root/reference/queryparser/classic/queryBuilder.go:23-130): one token →
  * TermQuery, n tokens → BooleanQuery of SHOULD clauses, quoted → PhraseQuery.
  */
/** @param keywordFields fields indexed as single unanalyzed terms
  *   (StringField) — `field:value` takes the raw value; quoted phrases are
  *   REJECTED (a keyword field has one position — a multi-token phrase can
  *   never match, so silently degrading it to a raw term hid user mistakes).
  * @param analyzedFields extra tokenized text fields — `field:text`
  *   re-analyzes and routes each token (or phrase) to that field, the
  *   reference's per-field TextField queries (queryBuilder.go:23-130,
  *   phrase.go:18-60).
  * @param strictFields when true (default), an unknown `field:` prefix is an
  *   error — never silently searched against the default field (the round-1
  *   bug). Set false for free-text surfaces where colons are ordinary
  *   characters (`std::vector`, URLs): unknown-prefix words are then
  *   analyzed whole as default-field text.
  */
final class QueryParser(analyzer: Analyzer, defaultField: String = "content",
    keywordFields: Set[String] = Set.empty, strictFields: Boolean = true,
    analyzedFields: Set[String] = Set.empty) {

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object Plus extends Tok
  private case object Minus extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  private final case class Quoted(s: String) extends Tok
  private final case class Word(s: String) extends Tok
  private final case class Rx(s: String) extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '+' => out += Plus; i += 1
        case '-' => out += Minus; i += 1
        case '"' =>
          val end = s.indexOf('"', i + 1)
          val stop = if (end < 0) s.length else end
          out += Quoted(s.substring(i + 1, stop))
          i = stop + 1
        // single-quote phrases, gated to TOKEN BOUNDARIES at BOTH ends so
        // apostrophes inside words (don't, it's) stay ordinary text: shells
        // routinely eat double quotes before they reach the CLI/sbt arg
        // vector. The closing quote must sit at a token end (end-of-string,
        // whitespace, or a break/boost/slop follower — mirroring the bare
        // regexp gate): without it, free text like "'til o'clock" would lex
        // the leading-apostrophe word as Quoted("til o") because a LATER
        // mid-word apostrophe closed it.
        case '\'' if (i == 0 || s.charAt(i - 1).isWhitespace ||
            "()+-\"".contains(s.charAt(i - 1))) && {
              val e = s.indexOf('\'', i + 1)
              e >= 0 && (e + 1 == s.length || s.charAt(e + 1).isWhitespace ||
                "()+-\"^~".contains(s.charAt(e + 1)))
            } =>
          val end = s.indexOf('\'', i + 1)
          out += Quoted(s.substring(i + 1, end))
          i = end + 1
        // bare regexp `/pat/`, gated like single-quote phrases: must OPEN at
        // a token boundary and CLOSE at a token end, so an absolute path
        // typed as free text (`/root/repo`) stays ordinary words. The scan
        // runs to the closing slash ignoring break chars — patterns may
        // contain `( ) + -` and spaces.
        case '/' if (i == 0 || s.charAt(i - 1).isWhitespace ||
            "()+-\"".contains(s.charAt(i - 1))) && {
              val e = s.indexOf('/', i + 1)
              e > i + 1 && (e + 1 == s.length || s.charAt(e + 1).isWhitespace ||
                "()+-\"^".contains(s.charAt(e + 1)))
            } =>
          val end = s.indexOf('/', i + 1)
          out += Rx(s.substring(i + 1, end))
          i = end + 1
        case _ =>
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
            !"()+-\"".contains(s.charAt(i))) i += 1
          s.substring(start, i) match {
            case "AND" | "&&" => out += AndTok
            case "OR" | "||" => out += OrTok
            case "NOT" | "!" => out += NotTok
            case w => out += Word(w)
          }
      }
    }
    out.toList
  }

  def parse(input: String): Query = {
    val (q, rest) = parseBoolean(lex(input))
    require(rest.isEmpty, s"unconsumed query tokens: $rest")
    q
  }

  private def parseBoolean(toks0: List[Tok]): (Query, List[Tok]) = {
    var toks = toks0
    val clauses = scala.collection.mutable.ArrayBuffer.empty[BooleanClause]
    var conj: Option[Tok] = None
    var mod: Option[Tok] = None
    var done = false
    while (!done && toks.nonEmpty) {
      toks.head match {
        case RParen => done = true
        case AndTok | OrTok => conj = Some(toks.head); toks = toks.tail
        case Plus => mod = Some(Plus); toks = toks.tail
        case Minus | NotTok => mod = Some(Minus); toks = toks.tail
        case _ =>
          val (sub0, rest) = parseClause(toks)
          // a standalone `^N` word after any clause boosts it (group,
          // phrase, regex — inline word boosts split inside parseClause)
          val (subOpt, rest2) = sub0 match {
            case Some(q) => rest match {
              // `^=N` first: a constant-score wrapper, not a boost
              case Word(w) :: r if w.length > 2 && w.startsWith("^=") &&
                  isBoostNum(w.drop(2)) =>
                (Some(ConstantScoreQuery(q, w.drop(2).toFloat)), r)
              case Word(w) :: r if w.length > 1 && w.charAt(0) == '^' &&
                  isBoostNum(w.drop(1)) =>
                (Some(Query.boosted(q, w.drop(1).toFloat)), r)
              case r => (sub0, r)
            }
            case None => (sub0, rest)
          }
          toks = rest2
          subOpt.foreach { sub =>
            // reference addClause semantics: CONJ_AND promotes the previous
            // non-prohibited clause to MUST (queryParserBase.go addClause)
            if (conj.contains(AndTok) && clauses.nonEmpty &&
              clauses.last.occur != Occur.MUST_NOT)
              clauses(clauses.length - 1) = clauses.last.copy(occur = Occur.MUST)
            val occur = mod match {
              case Some(Minus) => Occur.MUST_NOT
              case Some(Plus) => Occur.MUST
              case _ => if (conj.contains(AndTok)) Occur.MUST else Occur.SHOULD
            }
            clauses += BooleanClause(occur, sub)
          }
          conj = None
          mod = None
      }
    }
    val q = clauses.toList match {
      case Nil => BooleanQuery(Nil)
      case List(BooleanClause(Occur.SHOULD, single)) => single
      case cs => BooleanQuery(cs)
    }
    (q, toks)
  }

  private def unknownField(f: String): Nothing =
    throw new IllegalArgumentException(
      s"unknown field '$f' (known: '$defaultField'" +
        (keywordFields ++ analyzedFields).toSeq.sorted.map(k => s", '$k'").mkString + ")")

  /** One clause: group, quoted phrase (optionally `field:"..."`), or bare
    * term (optionally `field:term`).
    */
  private def parseClause(toks: List[Tok]): (Option[Query], List[Tok]) = toks match {
    // `*:*` — MatchAllDocsQuery (Lucene classic syntax; absent in the
    // reference). Optionally boosted: `*:*^2`. FILTER clauses have no
    // classic syntax — they are API-level (FilteredQuery / Occur.FILTER).
    case Word(wRaw) :: rest if splitBoost(wRaw)._1 == "*:*" =>
      (Some(Query.boosted(MatchAllQuery(), splitBoost(wRaw)._2)), rest)
    // term range `[a TO b]` / `{a TO b}` (optionally `field:[a TO b]`): the
    // lexer yields three words; `*` opens a side. Reference: absent.
    case Word(w) :: Word("TO") :: Word(z0) :: rest
        if rangeOpen(w).isDefined && {
          val z = splitBoost(z0)._1
          z.length > 1 && (z.last == ']' || z.last == '}')
        } =>
      val (z, zb) = splitBoost(z0)
      val (fOpt, loTxt, incLo) = rangeOpen(w).get
      fOpt.foreach(f => if (!fieldKnown(f)) unknownField(f))
      val raw = fOpt.exists(keywordFields.contains)
      def bound(t: String): Option[String] =
        if (t == "*") None
        else Some(if (raw) t else t.toLowerCase(java.util.Locale.ROOT))
      (Some(Query.boosted(TermRangeQuery(bound(loTxt), bound(z.dropRight(1)),
        includeLower = incLo, includeUpper = z.last == ']',
        field = fOpt.filter(_ != defaultField)), zb)), rest)
    case LParen :: rest =>
      val (q, rest2) = parseBoolean(rest)
      val rest3 = rest2 match {
        case RParen :: r => r
        case r => r
      }
      (Some(q), rest3)
    case Rx(p) :: rest =>
      (Some(RegexpQuery(p)), rest)
    // fielded phrase `f:"a b"` — the lexer yields Word("f:") then Quoted.
    // Analyzed fields route the phrase (reference phrase.go:18-60); keyword
    // fields REJECT it (single-position fields can never match a phrase);
    // unknown fields: strict → error, lenient → fall through to the separate
    // Word + Quoted handling (the colon is ordinary query text there)
    case Word(w) :: Quoted(s) :: rest if w.length > 1 && w.endsWith(":") &&
        (strictFields || fieldKnown(w.dropRight(1))) =>
      val f = w.dropRight(1)
      val (slop, pb, rest2) = slopSuffix(rest)
      if (f == defaultField) (phrase(s, None, slop).map(Query.boosted(_, pb)), rest2)
      else if (analyzedFields.contains(f)) (phrase(s, Some(f), slop).map(Query.boosted(_, pb)), rest2)
      else if (keywordFields.contains(f))
        throw new IllegalArgumentException(
          s"keyword field '$f' indexes one unanalyzed token — a phrase can never match; " +
            s"use $f:value without quotes")
      else unknownField(f)
    case Quoted(s) :: rest =>
      val (slop, pb, rest2) = slopSuffix(rest)
      (phrase(s, None, slop).map(Query.boosted(_, pb)), rest2)
    case Word(wRaw) :: rest =>
      // `field:text` routes to a named field (queryBuilder.go:23-130):
      // defaultField and analyzed fields re-analyze; keyword fields take the
      // RAW value as one unanalyzed term (StringField semantics); unknown
      // fields are REJECTED — never silently searched against the default.
      // A trailing `^=N` constant-score suffix (modern Lucene operator) or
      // `^N` boost splits off first (classic CARAT syntax — the `^`
      // character is reserved, as in the reference's lexer).
      val (wRaw1, constOpt) = splitConst(wRaw)
      val (w, wBoost) = splitBoost(wRaw1)
      val ci = w.indexOf(':')
      val (q0, restOut): (Option[Query], List[Tok]) =
      if (ci > 0 && ci < w.length - 1) {
        val f = w.substring(0, ci)
        val text = w.substring(ci + 1)
        if (text.length > 2 && text.head == '/' && text.last == '/' && fieldKnown(f))
          // fielded regexp `f:/pat/` — one word, so the pattern cannot
          // contain whitespace or `( ) + - "` (the bare `/pat/` lexer rule
          // has no such limit; same shell-adjacent constraint family as
          // single-quote phrases)
          (Some(RegexpQuery(text.substring(1, text.length - 1),
            field = Some(f).filter(_ != defaultField))), rest)
        else if (text.length > 1 && text.endsWith("*") && !text.dropRight(1).exists(isWild) &&
            fieldKnown(f))
          (Some(prefix(text.dropRight(1), Some(f).filter(_ != defaultField),
            raw = keywordFields.contains(f))), rest)
        else if (text.exists(isWild) && text.exists(!isWild(_)) && fieldKnown(f))
          (Some(wildcard(text, Some(f).filter(_ != defaultField),
            raw = keywordFields.contains(f))), rest)
        else if (fuzzySuffix(text).isDefined && fieldKnown(f)) {
          val (b, n) = fuzzySuffix(text).get
          (Some(fuzzy(b, n, Some(f).filter(_ != defaultField),
            raw = keywordFields.contains(f))), rest)
        }
        else if (f == defaultField) (analyzed(text, None), rest)
        else if (analyzedFields.contains(f)) (analyzed(text, Some(f)), rest)
        else if (keywordFields.contains(f)) (Some(TermQuery(text, 1.0f, Some(f))), rest)
        else if (!strictFields) {
          // advisor round-3 fix: lenient routing must not make a typo'd
          // prefix ('lagn:de') silently invisible on a view that HAS
          // configured fields — warn with the known-field list. Surfaces
          // with no configured fields stay silent (std::vector, URLs).
          if ((keywordFields.nonEmpty || analyzedFields.nonEmpty) &&
              f.matches("[A-Za-z][A-Za-z0-9_]*"))
            QueryParser.log.warn(
              s"query token '$w' looks like a field prefix but '$f' is not a known field " +
                s"(known: ${(Set(defaultField) ++ keywordFields ++ analyzedFields).toSeq.sorted.mkString(", ")}); " +
                "searching it as default-field text (strictFields=false)")
          (analyzed(w, None), rest) // whole word as text
        } else unknownField(f)
      } else if (w.length > 1 && w.endsWith("*") && !w.dropRight(1).exists(isWild))
        (Some(prefix(w.dropRight(1), None, raw = false)), rest)
      else if (w.exists(isWild) && w.exists(!isWild(_)))
        (Some(wildcard(w, None, raw = false)), rest)
      else if (fuzzySuffix(w).isDefined) {
        val (b, n) = fuzzySuffix(w).get
        (Some(fuzzy(b, n, None, raw = false)), rest)
      } else (analyzed(w, None), rest)
      (q0.map(q => constOpt match {
        case Some(cs) => ConstantScoreQuery(q, cs)
        case None => Query.boosted(q, wBoost)
      }), restOut)
    case other => (None, if (other.isEmpty) Nil else other.tail)
  }

  private def isBoostNum(s: String): Boolean =
    s.nonEmpty && s.matches("""\d+(\.\d+)?""")

  /** Split a trailing `^N` boost off a word (`merge^2`, `f:pre*^1.5`). Only
    * fires when the suffix after the LAST caret is numeric, so keyword
    * values containing a non-numeric caret pass through untouched.
    */
  private def splitBoost(w: String): (String, Float) = {
    val i = w.lastIndexOf('^')
    if (i > 0 && isBoostNum(w.substring(i + 1))) (w.substring(0, i), w.substring(i + 1).toFloat)
    else (w, 1.0f)
  }

  /** Split a trailing `^=N` constant-score suffix off a word (`merge^=2` —
    * the modern Lucene constant-score operator; standalone `^=N` after a
    * group/phrase is handled in parseBoolean). splitBoost never fires on
    * `^=N` (the `=` makes its suffix non-numeric), so the two compose.
    */
  private def splitConst(w: String): (String, Option[Float]) = {
    val i = w.lastIndexOf("^=")
    if (i > 0 && isBoostNum(w.substring(i + 2)))
      (w.substring(0, i), Some(w.substring(i + 2).toFloat))
    else (w, None)
  }

  /** `pre*` → PrefixQuery. Analyzed fields lowercase/normalize the prefix
    * through the index analyzer (it must stay ONE token — a multi-token
    * prefix has no defined expansion); keyword fields take it raw
    * (StringField terms are unanalyzed).
    */
  private def prefix(text: String, field: Option[String], raw: Boolean): Query = {
    if (raw) return PrefixQuery(text, 1.0f, field)
    analyzer(text).tokens.map(_.term).toSeq match {
      case Seq(t) => PrefixQuery(t, 1.0f, field)
      case other => throw new IllegalArgumentException(
        s"prefix '$text*' must analyze to exactly one token (got: $other)")
    }
  }

  private def isWild(c: Char): Boolean = c == '*' || c == '?'

  /** `word~` (maxEdits 2) or `word~N` — the classic fuzzy suffix (the slop
    * suffix is separate: it only follows a QUOTED phrase).
    */
  private def fuzzySuffix(text: String): Option[(String, Int)] = {
    val i = text.lastIndexOf('~')
    if (i <= 0) return None
    val base = text.substring(0, i)
    val suf = text.substring(i + 1)
    if (base.exists(isWild) || base.contains('~')) None
    else if (suf.isEmpty) Some((base, 2))
    else if (suf.length == 1 && suf.charAt(0).isDigit) Some((base, suf.toInt))
    else None
  }

  private def fuzzy(text: String, maxEdits: Int, field: Option[String],
      raw: Boolean): Query = {
    if (raw) return FuzzyQuery(text, maxEdits, 1.0f, field)
    analyzer(text).tokens.map(_.term).toSeq match {
      case Seq(t) => FuzzyQuery(t, maxEdits, 1.0f, field)
      case other => throw new IllegalArgumentException(
        s"fuzzy '$text~$maxEdits' must analyze to exactly one token (got: $other)")
    }
  }

  /** `[lo` / `{lo` / `f:[lo` / `f:{lo` → (field, lowerText, inclusive). */
  private def rangeOpen(w: String): Option[(Option[String], String, Boolean)] = {
    def open(c: Char) = c == '[' || c == '{'
    if (w.length > 1 && open(w.head)) Some((None, w.tail, w.head == '['))
    else {
      val ci = w.indexOf(':')
      if (ci > 0 && ci < w.length - 2 && open(w.charAt(ci + 1)))
        Some((Some(w.substring(0, ci)), w.substring(ci + 2), w.charAt(ci + 1) == '['))
      else None
    }
  }

  /** `a*b?c` → WildcardQuery. The pattern cannot pass through the analyzer
    * (it would strip the wildcards), so analyzed fields lowercase it — the
    * right normalization for both shipped tokenizer families; keyword
    * fields take it raw.
    */
  private def wildcard(text: String, field: Option[String], raw: Boolean): Query =
    WildcardQuery(
      if (raw) text else text.toLowerCase(java.util.Locale.ROOT), 1.0f, field)

  private def fieldKnown(f: String): Boolean =
    f == defaultField || keywordFields.contains(f) || analyzedFields.contains(f)

  /** `"..."~N` sloppy-phrase suffix: the lexer yields the tilde word right
    * after the quoted token (classic syntax, queryParser.go lexes FUZZY_SLOP
    * — the reference then panics in the handler; evaluation here is this
    * engine's defined sloppy spec, see [[PhraseQuery]]).
    */
  private def slopSuffix(toks: List[Tok]): (Int, Float, List[Tok]) = toks match {
    // `~N` or the combined `~N^M` (a bare `"..."^M` boost is instead the
    // standalone-caret word handled generically in parseBoolean)
    case Word(w0) :: r if w0.length > 1 && w0.charAt(0) == '~' && {
        val (base, _) = splitBoost(w0)
        base.length > 1 && base.drop(1).forall(_.isDigit)
      } =>
      val (base, b) = splitBoost(w0)
      (base.drop(1).toInt, b, r)
    case r => (0, 1.0f, r)
  }

  private def phrase(s: String, field: Option[String], slop: Int = 0): Option[Query] =
    analyzer(s).tokens.map(_.term).toSeq match {
      case Seq() => None
      case Seq(t) => Some(TermQuery(t, 1.0f, field))
      case ts => Some(PhraseQuery(ts, 1.0f, field, slop))
    }

  private def analyzed(text: String, field: Option[String]): Option[Query] =
    analyzer(text).tokens.map(_.term).toSeq match {
      case Seq() => None
      case Seq(t) => Some(TermQuery(t, 1.0f, field))
      case ts => Some(BooleanQuery(
        ts.map(t => BooleanClause(Occur.SHOULD, TermQuery(t, 1.0f, field))).toList))
    }
}

private object QueryParser {
  val log: org.slf4j.Logger = org.slf4j.LoggerFactory.getLogger(classOf[QueryParser])
}
