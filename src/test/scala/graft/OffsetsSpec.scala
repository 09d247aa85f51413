package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.StandardCodeAnalyzer
import graft.index._
import graft.search._

/** Character offsets in postings (format 3, IndexConfig.withOffsets):
  * build → read → merge preservation → format gates.
  */
class OffsetsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def offsetsOf(s: IndexSearcher, term: String): Seq[(Long, Int, Int)] =
    s.offsets("content", term).as[(Long, Int, Int)].collect().sorted.toSeq

  test("offsets match hand-computed character spans (ICU analyzer, mixed case)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-off").toString
    val docs = Seq(
      (0L, "Alpha beta ALPHA"), // alpha @ [0,5) and [11,16)
      (1L, "x, alpha! y") // alpha @ [3,8) — punctuation offsets preserved
    ).map { case (id, text) => (id, s"r$id", f"p$id%03d", "", "scala", text) }
      .toDF("docId", "repo", "path", "commit", "lang", "content")
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(), docsPerRange = 8,
      numSegments = 1, segmentsPerWave = 1, explicitDocIdCol = Some("docId"),
      withOffsets = true)
    new IndexBuilder(spark, cfg).build(docs, dir)
    val m = IndexManifest.load(spark, dir)
    assert(m.formatVersion == IndexManifest.FormatOffsets)
    assert(CheckIndex.run(spark, dir).ok)
    val s = new IndexSearcher(spark, dir)
    assert(offsetsOf(s, "alpha") == Seq((0L, 0, 5), (0L, 11, 16), (1L, 3, 8)))
    assert(offsetsOf(s, "beta") == Seq((0L, 6, 10)))
  }

  test("offsets survive a tiered merge and respect deletes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-off-merge").toString
    val docs = (0L until 64L).map(i =>
      (i, s"r$i", f"p$i%03d", "", "scala", s"pad$i marker tail$i"))
      .toDF("docId", "repo", "path", "commit", "lang", "content")
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(), docsPerRange = 8,
      numSegments = 8, segmentsPerWave = 1, explicitDocIdCol = Some("docId"),
      withOffsets = true)
    val b = new IndexBuilder(spark, cfg)
    b.build(docs, dir)
    val before = offsetsOf(new IndexSearcher(spark, dir), "marker")
    assert(before.size == 64 && before.forall { case (i, st, en) =>
      val padLen = s"pad$i".length + 1
      st == padLen && en == padLen + "marker".length
    })
    if (TieredMerge.waves(spark, dir).size > 1) {
      TieredMerge.maybeMerge(spark, dir, segsPerTier = 1, maxMergeAtOnce = 10)
      IndexBuilder.forExisting(spark, dir).publish(dir)
    }
    assert(offsetsOf(new IndexSearcher(spark, dir), "marker") == before,
      "merge must preserve the offsets stream byte-for-byte semantics")
    // deletes drop occurrences from the offsets view
    val sDel = new IndexSearcher(spark, dir).withDeletes(Array(0L, 5L))
    assert(offsetsOf(sDel, "marker").map(_._1).toSet ==
      (0L until 64L).toSet -- Set(0L, 5L))
  }

  test("matchedSpans merges multi-term offsets; Snippets renders the best window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snip").toString
    val text0 = "alpha beta filler filler alpha gamma alpha beta tail"
    val docs = Seq(
      (0L, text0),
      (1L, "nothing here"),
      (2L, "beta alone")
    ).map { case (id, text) => (id, s"r$id", f"p$id%03d", "", "scala", text) }
      .toDF("docId", "repo", "path", "commit", "lang", "content")
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(), docsPerRange = 8,
      numSegments = 1, segmentsPerWave = 1, explicitDocIdCol = Some("docId"),
      withOffsets = true)
    new IndexBuilder(spark, cfg).build(docs, dir)
    val s = new IndexSearcher(spark, dir)
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.SHOULD, TermQuery("alpha")),
      BooleanClause(Occur.SHOULD, TermQuery("beta"))))
    val top = s.search(q, 3, ScoreMode.Ref32)
    val spans = s.matchedSpans(q, top.scoreDocs.map(_.docId).toSeq)
    // doc 0: alpha@[0,5),[25,30),[37,42); beta@[6,10),[43,47) — sorted merged
    assert(spans(0L) == Seq((0, 5), (6, 10), (25, 30), (37, 42), (43, 47)),
      spans(0L).toString)
    assert(spans(2L) == Seq((0, 4)))
    // bestWindow over doc 0's starts with window 25: anchor 25 covers 25,37,43
    assert(Snippets.bestWindow(spans(0L).map(_._1).toArray, 25) == ((25, 3)))
    // render wraps in-window spans against the CALLER's text
    val snip = Snippets.render(text0, spans(0L), 25, "[", "]")
    assert(snip == "[alpha] gamma [alpha] [beta] ta", s"got '$snip'") // window [25,50)
    // coalesce merges overlaps
    assert(Snippets.coalesce(Seq((0, 5), (3, 8), (10, 12))) == Seq((0, 8), (10, 12)))
    // prefix leaves expand before span extraction
    val spansPre = s.matchedSpans(PrefixQuery("alph"), Seq(0L))
    assert(spansPre(0L) == Seq((0, 5), (25, 30), (37, 42)))
    // distributed window planning agrees with the driver-side function
    val bw = Snippets.bestWindows(s.offsets("content", "alpha"), 25)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(bw == Set((0L, 25, 2))) // alpha starts 0,25,37: window@25 covers 25,37
  }

  test("format gates: offsets() on a format-2 index errors clearly; analyzer gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-off-gate").toString
    new IndexBuilder(spark, IndexConfig(analyzer = new StandardCodeAnalyzer(),
      numSegments = 1, segmentsPerWave = 1))
      .build(Seq(CodeFile("r", "p", "", "scala", "alpha beta")).toDF(), dir)
    val ex = intercept[IllegalArgumentException](
      new IndexSearcher(spark, dir).offsets("content", "alpha").count())
    assert(ex.getMessage.contains("withOffsets"))
    // an analyzer that cannot attribute offsets fails the build explicitly
    val chain = new graft.analysis.CommonGramsAnalyzer(
      new graft.analysis.SimpleAnalyzer(), Set("the"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-off-gate2").toString
    intercept[org.apache.spark.SparkException] { // UnsupportedOperation inside the task
      new IndexBuilder(spark, IndexConfig(analyzer = chain, numSegments = 1,
        segmentsPerWave = 1, withOffsets = true))
        .build(Seq(CodeFile("r", "p", "", "scala", "alpha beta")).toDF(), dir2)
    }
  }
}
