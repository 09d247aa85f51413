package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.StandardCodeAnalyzer
import graft.index._
import graft.search._

/** liveDocs semantics (reference term.go:132, bufferedDeletes.go): deleted
  * docs vanish from matches, top-k, totalHits, and explain; term/collection
  * stats still count them (Lucene behavior until a rewrite reclaims).
  */
class DeletesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val N = 600
  private lazy val indexPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft-del").toString
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 64, numSegments = 8, segmentsPerWave = 8)
    new IndexBuilder(spark, cfg).build(TestCorpus.corpus(N).toDF(), dir)
    dir
  }

  test("searcher-scoped deletes filter matches and totalHits on all paths") {
    val s0 = new IndexSearcher(spark, indexPath)
    val all = s0.search(TermQuery("import"), N, ScoreMode.Ref32)
    val victims = all.scoreDocs.take(5).map(_.docId)
    val s1 = s0.withDeletes(victims)
    val after = s1.search(TermQuery("import"), N, ScoreMode.Ref32)
    assert(after.totalHits == all.totalHits - 5)
    assert(victims.forall(v => !after.scoreDocs.exists(_.docId == v)))
    // surviving docs keep their exact scores (stats unchanged — Lucene
    // semantics: deletes don't affect df/ttf until rewrite)
    val before = all.scoreDocs.map(d => d.docId -> d.score).toMap
    after.scoreDocs.foreach(d => assert(d.score == before(d.docId)))
    // distributed path agrees
    s1.localSearchMaxPostings = 0
    val dist = s1.search(TermQuery("import"), N, ScoreMode.Ref32)
    assert(dist.totalHits == after.totalHits)
    assert(dist.scoreDocs.map(_.docId).toSeq == after.scoreDocs.map(_.docId).toSeq)
  }

  test("persisted deletes load automatically; WAND respects them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-del2").toString
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 64, numSegments = 4, segmentsPerWave = 4)
    new IndexBuilder(spark, cfg).build(TestCorpus.corpus(300).toDF(), dir)
    val pre = new IndexSearcher(spark, dir).search(TermQuery("import"), 300)
    val victims = pre.scoreDocs.take(3).map(_.docId)
    Deletes.append(spark, dir, victims.toSeq)
    val s = new IndexSearcher(spark, dir)
    val post = s.search(TermQuery("import"), 300)
    assert(post.totalHits == pre.totalHits - 3)
    // WAND top-k over the deleted view == exhaustive over the deleted view
    val exact = s.search(TermQuery("import"), 10, ScoreMode.Ref32)
    val wand = Wand.searchTopK(s, TermQuery("import"), 10, ScoreMode.Ref32, phase1Ranges = 2)
    assert(wand.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
      exact.scoreDocs.map(d => (d.docId, d.score)).toSeq)
    // appending more deletes accumulates
    Deletes.append(spark, dir, Seq(pre.scoreDocs(3).docId))
    assert(new IndexSearcher(spark, dir).search(TermQuery("import"), 300).totalHits ==
      pre.totalHits - 4)
  }

  test("explain on a deleted doc reports non-match") {
    val s0 = new IndexSearcher(spark, indexPath)
    val hit = s0.search(TermQuery("parser"), 1).scoreDocs.head
    val s1 = s0.withDeletes(Array(hit.docId))
    val ex = s1.explain(TermQuery("parser"), hit.docId)
    assert(!ex.isMatch && ex.value == 0.0)
  }
}
