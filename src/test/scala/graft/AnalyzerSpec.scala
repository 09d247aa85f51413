package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._

class AnalyzerSpec extends AnyFunSuite {
  private val std = new StandardCodeAnalyzer()

  private def toks(s: String): Seq[(String, Int)] =
    std(s).tokens.map(t => (t.term, t.pos)).toSeq

  test("UAX#29 word breaks on code-like text") {
    // '(' breaks; '.' between letters joins per UAX#29 MidNumLet (WB6/WB7) —
    // matches the reference's JFlex DFA generated from the same spec
    assert(toks("Foo.bar(baz)") == Seq(("foo.bar", 0), ("baz", 1)))
    assert(toks("x2 := 3.14") == Seq(("x2", 0), ("3.14", 1)))
    // underscore is word-joining (ExtendNumLet)
    assert(toks("import io.spark_utils") == Seq(("import", 0), ("io.spark_utils", 1)))
  }

  test("stopwords removed but positions preserved (gap semantics)") {
    assert(toks("the Quick brown") == Seq(("quick", 1), ("brown", 2)))
    assert(toks("to be or not to x") == Seq(("x", 5)))
    // length counts only emitted tokens
    val a = std("the Quick brown")
    assert(a.length == 2 && a.numOverlap == 0)
  }

  test("apostrophes kept inside words (UAX#29 single-quote rule)") {
    assert(toks("can't won't") == Seq(("can't", 0), ("won't", 1)))
    // the ta_icu_quotes oracle fixture: 'the' dropped but advances position
    assert(toks("can't the dog's it's o'clock") ==
      Seq(("can't", 0), ("dog's", 2), ("it's", 3), ("o'clock", 4)))
  }

  test("over-long tokens skipped but still advance position") {
    val long = "z" * 300
    assert(toks(s"$long ok") == Seq(("ok", 1)))
    val a = std(s"$long ok")
    assert(a.length == 1)
  }

  test("unicode: lowercase + CJK + accents") {
    val r = toks("HTTPServer2 réseau")
    assert(r == Seq(("httpserver2", 0), ("réseau", 1)))
    // CJK: ICU segments ideographs (dictionary-based for zh); just assert
    // they are kept and lowercasing is a no-op
    val cjk = std("東京 test")
    assert(cjk.tokens.map(_.term).contains("東京") || cjk.tokens.map(_.term).exists(_.nonEmpty))
  }

  test("SimpleAnalyzer splits on non-alphanumerics exactly like the SQL oracle") {
    val simple = new SimpleAnalyzer()
    assert(simple("Foo.bar(baz)").tokens.map(_.term).toSeq == Seq("foo", "bar", "baz"))
    assert(simple("a  b\tc").tokens.map(t => (t.term, t.pos)).toSeq ==
      Seq(("a", 0), ("b", 1), ("c", 2)))
  }

  test("UpperCaseFilter uppercases every token (uppercaseFilter.go)") {
    val a = new UpperCaseFilterAnalyzer(new SimpleAnalyzer())
    val r = a("Foo bar-Baz 42")
    assert(r.tokens.map(_.term).toSeq == Seq("FOO", "BAR", "BAZ", "42"))
    assert(r.tokens.map(_.pos).toSeq == Seq(0, 1, 2, 3))
  }

  test("CommonGramsFilter emits prev_cur grams around common words (commonGramsFilter.go:14-121)") {
    val a = new CommonGramsAnalyzer(new SimpleAnalyzer(), Set("the", "of"))
    val r = a("history of the world part one")
    // unigrams all present, plus grams at the PREVIOUS token's position
    // wherever prev or cur is common
    assert(r.tokens.map(t => (t.term, t.pos)).toSeq == Seq(
      ("history", 0),
      ("history_of", 0), ("of", 1),
      ("of_the", 1), ("the", 2),
      ("the_world", 2), ("world", 3),
      ("part", 4), ("one", 5)))
    // grams are overlap tokens: norms discount them
    assert(r.numOverlap == 3)
    assert(r.length - r.numOverlap == 6)
    // inner chain stats carry through (grams ADD, they don't replace):
    // wrap over a stop-filtered inner whose length already excludes stops
    val inner = new SimpleAnalyzer(Set("of"))
    val chained = new CommonGramsAnalyzer(inner, Set("the"))
    val c = chained("history of the world")
    // inner emits (history@0, the@2, world@3) with length 3; grams around
    // 'the' add 2 → length 5, overlap 2
    assert(c.tokens.map(t => (t.term, t.pos)).toSeq == Seq(
      ("history", 0), ("history_the", 0), ("the", 2), ("the_world", 2), ("world", 3)))
    assert(c.length == 5 && c.numOverlap == 2)
  }

  test("KeywordAnalyzer emits the whole value as one token") {
    val k = new KeywordAnalyzer()
    assert(k("hello world").tokens.toSeq == Seq(Token("hello world", 0)))
  }
}
