package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.StandardCodeAnalyzer
import graft.index._
import graft.search._

/** Explanation-tree invariant (reference core_test/search_test.go:36-78,
  * explanation.go): for every hit, explain(q, doc).value == the score
  * search() assigned — exactly, in both scoring modes — and the breakdown
  * carries matching leaf details.
  */
class ExplainSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val N = 1200
  private lazy val indexPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft-explain").toString
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 128, numSegments = 8, segmentsPerWave = 8)
    new IndexBuilder(spark, cfg).build(TestCorpus.corpus(N).toDF(), dir)
    dir
  }
  private lazy val searcher = new IndexSearcher(spark, indexPath)
  private lazy val parser = new QueryParser(new StandardCodeAnalyzer())

  private def queries: Seq[(String, Query)] = Seq(
    "q1_term" -> TermQuery("import"),
    "q2_or" -> parser.parse("parser OR buffer"),
    "q3_phrase" -> PhraseQuery(Seq("posting", "list")),
    "q4_boost" -> TermQuery("scorer", -42.0f),
    "q5_and" -> parser.parse("+import +parser"),
    "q6_reqexcl" -> parser.parse("parser -uniqtoken_7"),
    "q7_stop" -> parser.parse("a OR the OR import"),
    "q8_msm" -> BooleanQuery(Seq(
      BooleanClause(Occur.SHOULD, TermQuery("parser")),
      BooleanClause(Occur.SHOULD, TermQuery("buffer")),
      BooleanClause(Occur.SHOULD, TermQuery("scorer"))), minShouldMatch = 2))

  test("explain value == search score for Q1-Q8, both modes, every top hit") {
    for ((name, q) <- queries; mode <- Seq[ScoreMode](ScoreMode.Ref32, ScoreMode.ExactDouble)) {
      val top = searcher.search(q, 5, mode)
      assert(top.scoreDocs.nonEmpty, s"$name returned no hits")
      for (hit <- top.scoreDocs) {
        val ex = searcher.explain(q, hit.docId, mode)
        assert(ex.isMatch, s"$name/$mode doc=${hit.docId} not matched:\n${ex.render}")
        assert(ex.value == hit.score,
          s"$name/$mode doc=${hit.docId}: explain=${ex.value} search=${hit.score}\n${ex.render}")
      }
    }
  }

  test("boolean breakdown: details sum to the value and carry clause trees") {
    val q = parser.parse("+import +parser buffer")
    val top = searcher.search(q, 3, ScoreMode.ExactDouble)
    val ex = searcher.explain(q, top.scoreDocs.head.docId, ScoreMode.ExactDouble)
    val scoringKids = ex.details.filter(e => e.isMatch && !e.description.startsWith("coord"))
    assert(scoringKids.nonEmpty)
    assert(math.abs(scoringKids.map(_.value).sum - ex.value) < 1e-9)
    assert(ex.details.exists(_.description.contains("import")))
    assert(ex.details.exists(_.description.contains("parser")))
  }

  test("phrase breakdown: phraseFreq detail present") {
    val q = PhraseQuery(Seq("posting", "list"))
    val top = searcher.search(q, 3, ScoreMode.Ref32)
    val ex = searcher.explain(q, top.scoreDocs.head.docId, ScoreMode.Ref32)
    assert(ex.isMatch && ex.value == top.scoreDocs.head.score)
    assert(ex.description.contains("phraseFreq="))
  }

  /** Every internal node's value equals the composition of its details, in
    * the mode's arithmetic: "product of" nodes multiply ALL details in order;
    * "sum of" nodes fold-add the MATCHING details in order (the reference's
    * Explanation composition, explanation.go / term.go:163-193).
    */
  private def assertComposes(e: Explanation, mode: ScoreMode): Unit =
    if (e.isMatch && e.details.nonEmpty) {
      if (e.description.startsWith("product of")) {
        val got = mode match {
          case ScoreMode.Ref32 => e.details.map(_.value.toFloat).reduce(_ * _).toDouble
          case ScoreMode.ExactDouble => e.details.map(_.value).reduce(_ * _)
        }
        assert(got == e.value, s"product != value:\n${e.render}")
      } else if (e.description.startsWith("sum of")) {
        val ms = e.details.filter(_.isMatch)
        val got = mode match {
          case ScoreMode.Ref32 => ms.map(_.value.toFloat).foldLeft(0.0f)(_ + _).toDouble
          case ScoreMode.ExactDouble => ms.map(_.value).foldLeft(0.0)(_ + _)
        }
        assert(got == e.value, s"sum != value:\n${e.render}")
      } else fail(s"internal node lacks a composition op: ${e.description}")
      e.details.foreach(assertComposes(_, mode))
    }

  test("every internal node equals the composition of its details (both modes)") {
    for ((name, q) <- queries; mode <- Seq[ScoreMode](ScoreMode.Ref32, ScoreMode.ExactDouble)) {
      val top = searcher.search(q, 5, mode)
      for (hit <- top.scoreDocs) {
        val ex = searcher.explain(q, hit.docId, mode)
        assert(ex.value == hit.score, s"$name/$mode root != score")
        assertComposes(ex, mode)
      }
    }
  }

  test("TF-IDF: coord factor composes as a product node, root still == score") {
    val s = new IndexSearcher(spark, indexPath, similarity = new TfIdfSimilarity())
    val q = parser.parse("parser OR buffer OR uniqtoken_3")
    val top = s.search(q, 5, ScoreMode.Ref32)
    assert(top.scoreDocs.nonEmpty)
    for (hit <- top.scoreDocs) {
      val ex = s.explain(q, hit.docId, ScoreMode.Ref32)
      assert(ex.value == hit.score, s"tfidf root != score:\n${ex.render}")
      assertComposes(ex, ScoreMode.Ref32)
      // partial-match docs get coord < 1 → explicit product wrap
      if (ex.description.startsWith("product of"))
        assert(ex.details.exists(_.description.startsWith("coord(")))
    }
  }

  test("non-match explains why") {
    // a doc that contains 'import' but is excluded by MUST_NOT
    val top = searcher.search(TermQuery("import"), 1, ScoreMode.Ref32)
    val docId = top.scoreDocs.head.docId
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.SHOULD, TermQuery("import")),
      BooleanClause(Occur.MUST_NOT, TermQuery("import"))))
    val ex = searcher.explain(q, docId, ScoreMode.Ref32)
    assert(!ex.isMatch && ex.value == 0.0)
    assert(ex.description.contains("MUST_NOT"))
  }
}
