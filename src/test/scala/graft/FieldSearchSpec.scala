package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.StandardCodeAnalyzer
import graft.index._
import graft.search._

/** Multi-field indexing + field-scoped queries: keyword fields (lang, repo)
  * are indexed as single unanalyzed terms with dl=1; `field:value` parses to
  * a fielded TermQuery; unknown fields are rejected (never silently searched
  * against the default field, the round-1 bug).
  */
class FieldSearchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val N = 800
  private lazy val indexPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fields").toString
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 128, numSegments = 8, segmentsPerWave = 8,
      keywordFields = Seq("lang", "repo"))
    new IndexBuilder(spark, cfg).build(TestCorpus.corpus(N).toDF(), dir)
    dir
  }
  private lazy val searcher = new IndexSearcher(spark, indexPath)
  private lazy val parser =
    new QueryParser(new StandardCodeAnalyzer(), keywordFields = Set("lang", "repo"))
  private lazy val corpus = TestCorpus.corpus(N)

  test("keyword term query matches exactly the docs with that value") {
    val goCount = corpus.count(_.lang == "go")
    val hits = searcher.search(TermQuery("go", 1.0f, Some("lang")), N, ScoreMode.ExactDouble)
    assert(hits.totalHits == goCount)
    // keyword values are NOT analyzed: a content term does not leak in
    val langDocs = searcher.docs(hits.scoreDocs.take(20).map(_.docId))
    assert(langDocs.forall(_.lang == "go"))
  }

  test("fielded conjunction: lang filter + content term, both modes") {
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("go", 1.0f, Some("lang"))),
      BooleanClause(Occur.MUST, TermQuery("parser"))))
    for (mode <- Seq[ScoreMode](ScoreMode.Ref32, ScoreMode.ExactDouble)) {
      val hits = searcher.search(q, N, mode)
      val expected = corpus.zipWithIndex.count { case (f, _) =>
        f.lang == "go" && f.content.split("\\s+").contains("parser")
      }
      assert(hits.totalHits == expected, s"mode=$mode")
      assert(hits.scoreDocs.forall(d => !d.score.isNaN && d.score > 0))
    }
  }

  test("keyword dl=1 does not pollute content-leaf normalization") {
    // same content query with and without an extra keyword MUST: the content
    // leaf's score contribution must be identical (per-field dl/norm)
    val qPlain = TermQuery("parser")
    val qFielded = BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("go", 1.0f, Some("lang"))),
      BooleanClause(Occur.MUST, TermQuery("parser"))))
    val plain = searcher.search(qPlain, N, ScoreMode.ExactDouble)
      .scoreDocs.map(d => d.docId -> d.score).toMap
    val langScore = searcher.search(TermQuery("go", 1.0f, Some("lang")), 1, ScoreMode.ExactDouble)
      .scoreDocs.head.score
    val fielded = searcher.search(qFielded, N, ScoreMode.ExactDouble)
    assert(fielded.scoreDocs.nonEmpty)
    fielded.scoreDocs.foreach { d =>
      assert(math.abs(d.score - (plain(d.docId) + langScore)) < 1e-12,
        s"doc ${d.docId}: ${d.score} != ${plain(d.docId)} + $langScore")
    }
  }

  test("CheckIndex validates a multi-field index") {
    val report = CheckIndex.run(spark, indexPath)
    assert(report.ok, report.problems.mkString("; "))
  }

  test("parser routes field: prefixes and rejects unknown fields") {
    val q = parser.parse("+lang:go +parser")
    q match {
      case BooleanQuery(cs, _, _) =>
        assert(cs.exists(c => c.query == TermQuery("go", 1.0f, Some("lang"))))
        assert(cs.exists(c => c.query == TermQuery("parser")))
      case other => fail(s"unexpected parse: $other")
    }
    val ex = intercept[IllegalArgumentException](parser.parse("nosuchfield:x"))
    assert(ex.getMessage.contains("unknown field"))
    // lenient mode: colon words are ordinary text (std::vector, URLs)
    val lenient = new QueryParser(new StandardCodeAnalyzer(),
      keywordFields = Set("lang"), strictFields = false)
    lenient.parse("std::vector") match {
      case BooleanQuery(cs, _, _) =>
        assert(cs.map(_.query) == Seq(TermQuery("std"), TermQuery("vector")))
      case other => fail(s"unexpected: $other")
    }
    // known fields still route in lenient mode
    assert(lenient.parse("lang:go") == TermQuery("go", 1.0f, Some("lang")))
  }

  test("WAND covers fielded flat booleans with parity") {
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("go", 1.0f, Some("lang"))),
      BooleanClause(Occur.SHOULD, TermQuery("parser")),
      BooleanClause(Occur.SHOULD, TermQuery("buffer"))))
    val exact = searcher.search(q, 10, ScoreMode.Ref32)
    val wand = Wand.searchTopK(searcher, q, 10, ScoreMode.Ref32, phase1Ranges = 4)
    assert(wand.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
      exact.scoreDocs.map(d => (d.docId, d.score)).toSeq)
  }

  test("PerFieldSimilarityWrapper routes keyword leaves to their own model") {
    // lang field scored by BM25(k1=0): leaf score degenerates to pure idf
    val wrapper = new PerFieldSimilarityWrapper(new Bm25Similarity(),
      Map("lang" -> new Bm25Similarity(0f, 0f)))
    val s = new IndexSearcher(spark, indexPath, similarity = wrapper)
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("go", 1.0f, Some("lang"))),
      BooleanClause(Occur.MUST, TermQuery("parser"))))
    val base = searcher.search(TermQuery("parser"), N, ScoreMode.Ref32)
      .scoreDocs.map(d => d.docId -> d.score).toMap
    val goDf = corpus.count(_.lang == "go").toLong
    val idfGo = Bm25.idfRef(goDf, N).toDouble
    val hits = s.search(q, N, ScoreMode.Ref32)
    assert(hits.scoreDocs.nonEmpty)
    hits.scoreDocs.foreach { d =>
      // float32 clause-order sum: (idfGo + parserScore)
      val expected = (idfGo.toFloat + base(d.docId).toFloat).toDouble
      assert(math.abs(d.score - expected) < 1e-6,
        s"doc ${d.docId}: ${d.score} vs $expected")
    }
  }

  test("explain on a fielded query reproduces the score") {
    val q = parser.parse("+lang:go +parser")
    val top = searcher.search(q, 3, ScoreMode.Ref32)
    val ex = searcher.explain(q, top.scoreDocs.head.docId, ScoreMode.Ref32)
    assert(ex.isMatch && ex.value == top.scoreDocs.head.score, ex.render)
    assert(ex.details.exists(_.description.contains("lang:go")))
  }
}
