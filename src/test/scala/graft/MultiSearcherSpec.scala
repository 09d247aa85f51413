package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.StandardCodeAnalyzer
import graft.index._
import graft.search._

/** Sharded search ≡ monolithic: a MultiSearcher over two interleaved shards
  * (doc_id % 2) must produce BIT-IDENTICAL results to one index over the
  * union corpus — same totalHits, same (docId, score) pairs, both score
  * modes, every query shape — because scoring uses globally merged
  * statistics (idf from summed df, avgdl from summed field totals).
  */
class MultiSearcherSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val N = 500

  private def df(pred: Long => Boolean) =
    TestCorpus.corpus(N).zipWithIndex.collect { case (c, i) if pred(i.toLong) =>
      (i.toLong, c.repo, c.path, c.commit, c.lang, c.content)
    }.toDF("doc_id", "repo", "path", "commit", "lang", "content")

  private def cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
    docsPerRange = 64, numSegments = 8, segmentsPerWave = 8,
    explicitDocIdCol = Some("doc_id"))

  private def build(pred: Long => Boolean, tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-multi-$tag").toString
    new IndexBuilder(spark, cfg).build(df(pred), dir)
    dir
  }

  private lazy val monoPath = build(_ => true, "mono")
  private lazy val shardAPath = build(_ % 2 == 0, "a")
  private lazy val shardBPath = build(_ % 2 == 1, "b")

  private lazy val mono = new IndexSearcher(spark, monoPath)
  private lazy val multi = MultiSearcher(spark, Seq(shardAPath, shardBPath))

  private val battery: Seq[Query] = Seq(
    TermQuery("merge"),
    BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("merge")),
      BooleanClause(Occur.MUST, TermQuery("scorer")))),
    BooleanQuery(Seq(
      BooleanClause(Occur.SHOULD, TermQuery("merge")),
      BooleanClause(Occur.SHOULD, TermQuery("index")),
      BooleanClause(Occur.SHOULD, TermQuery("buffer"))), 2),
    BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("merge")),
      BooleanClause(Occur.MUST_NOT, TermQuery("scorer")),
      BooleanClause(Occur.SHOULD, TermQuery("vector")))),
    PhraseQuery(Seq("posting", "list")),
    DisMaxQuery(Seq(TermQuery("merge"), TermQuery("scorer")), 0.5f),
    ConstantScoreQuery(TermQuery("merge"), 2.5f),
    FilteredQuery(TermQuery("merge"), TermQuery("index")))

  test("search ≡ monolithic: totalHits and (docId, score), both modes") {
    for (q <- battery; mode <- Seq[ScoreMode](ScoreMode.Ref32, ScoreMode.ExactDouble)) {
      val m = mono.search(q, 12, mode)
      val s = multi.search(q, 12, mode)
      assert(s.totalHits == m.totalHits, s"totalHits q=$q mode=$mode")
      assert(s.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
        m.scoreDocs.map(d => (d.docId, d.score)).toSeq, s"q=$q mode=$mode")
    }
  }

  test("scoredDocs union ≡ monolithic full match set") {
    val q = battery(2) // msm disjunction
    val m = mono.scoredDocs(q, ScoreMode.ExactDouble).collect()
      .map(d => (d.docId, d.score)).sortBy(_._1).toSeq
    val s = multi.scoredDocs(q, ScoreMode.ExactDouble).collect()
      .map(d => (d.docId, d.score)).sortBy(_._1).toSeq
    assert(s == m)
  }

  test("per-shard WAND merge ≡ monolithic exhaustive top-k") {
    for (q <- battery; mode <- Seq[ScoreMode](ScoreMode.Ref32, ScoreMode.ExactDouble)) {
      val m = mono.search(q, 10, mode)
      val s = multi.searchWand(q, 10, mode)
      assert(s.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
        m.scoreDocs.map(d => (d.docId, d.score)).toSeq, s"q=$q mode=$mode")
    }
  }

  test("explain routes to the owning shard; value == monolithic score") {
    val q = battery(1)
    val top = mono.search(q, 5, ScoreMode.Ref32)
    top.scoreDocs.foreach { d =>
      assert(multi.explain(q, d.docId).value == d.score, s"doc ${d.docId}")
    }
    assert(!multi.explain(q, N + 100L).isMatch)
  }

  test("match-all merges across shards: live count and docId-asc top-k") {
    val t = multi.search(MatchAllQuery(1.5f), 6)
    assert(t.totalHits == N)
    assert(t.scoreDocs.map(_.docId).toSeq == (0L until 6L))
    assert(t.scoreDocs.forall(_.score == 1.5))
  }

  test("TF-IDF similarity: coord/queryNorm computed from merged stats") {
    val multiT = MultiSearcher(spark, Seq(shardAPath, shardBPath),
      similarity = new TfIdfSimilarity())
    val monoT = new IndexSearcher(spark, monoPath, similarity = new TfIdfSimilarity())
    val q = battery(3)
    for (mode <- Seq[ScoreMode](ScoreMode.Ref32, ScoreMode.ExactDouble)) {
      val m = monoT.search(q, 10, mode)
      val s = multiT.search(q, 10, mode)
      assert(s.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
        m.scoreDocs.map(d => (d.docId, d.score)).toSeq, s"mode=$mode")
    }
  }

  test("facets and sort-by-field across shards ≡ monolithic") {
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.SHOULD, TermQuery("merge")),
      BooleanClause(Occur.SHOULD, TermQuery("vector"))))
    val mf = mono.facetCounts(q, "lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val sf = multi.facetCounts(q, "lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sf == mf)
    val ms = mono.searchSortBy(q, "repo", 12, ascending = false).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ss = multi.searchSortBy(q, "repo", 12, ascending = false).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ss == ms)
    def grouped(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getInt(2), x.getLong(3), x.getDouble(4)))
      .sortBy(t => (t._1, t._3)).toSeq
    val mg = grouped(mono.groupedSearch(q, "lang", 3, 4, ScoreMode.ExactDouble))
    val sg = grouped(multi.groupedSearch(q, "lang", 3, 4, ScoreMode.ExactDouble))
    assert(sg == mg)
  }

  test("suggest and MoreLikeThis across shards ≡ monolithic") {
    def sug(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val msug = sug(mono.suggestTerms("merg", 2, 5))
    val ssug = sug(multi.suggestTerms("merg", 2, 5))
    assert(ssug == msug)
    val an = new StandardCodeAnalyzer()
    val seed = "merge scorer index buffer"
    val mq = mono.moreLikeThisQuery(an, seed, maxQueryTerms = 3)
    val sq = multi.moreLikeThisQuery(an, seed, maxQueryTerms = 3)
    assert(sq == mq) // merged df/maxDoc rank-selects the same disjunction
    val m = mono.search(mq, 10, ScoreMode.ExactDouble)
    val s = multi.search(sq, 10, ScoreMode.ExactDouble)
    assert(s.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
      m.scoreDocs.map(d => (d.docId, d.score)).toSeq)
  }

  test("per-shard deletes apply") {
    val del = Array(1L, 3L, 5L) // all live in shard B (odd ids)
    val multiD = MultiSearcher.of(Seq(
      new IndexSearcher(spark, shardAPath),
      new IndexSearcher(spark, shardBPath).withDeletes(del)))
    val monoD = mono.withDeletes(del)
    val q = TermQuery("merge")
    val m = monoD.search(q, 10, ScoreMode.ExactDouble)
    val s = multiD.search(q, 10, ScoreMode.ExactDouble)
    assert(s.totalHits == m.totalHits)
    assert(s.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
      m.scoreDocs.map(d => (d.docId, d.score)).toSeq)
  }

  test("multi-term queries expand against the UNION dictionary ≡ monolithic") {
    val qs: Seq[Query] = Seq(
      PrefixQuery("mer"), // common stem — terms present in both shards
      // uniqtoken_N terms are per-doc unique → every expansion term lives
      // in exactly ONE shard (the cross-shard stats/eligibility stress)
      PrefixQuery("uniqtoken_1"),
      FuzzyQuery("merge", 1),
      WildcardQuery("s*rd"),
      TermRangeQuery(Some("shard"), Some("token")),
      BooleanQuery(Seq( // nested beside a scored term
        BooleanClause(Occur.MUST, TermQuery("index")),
        BooleanClause(Occur.SHOULD, PrefixQuery("scor")))))
    for (q <- qs; mode <- Seq[ScoreMode](ScoreMode.Ref32, ScoreMode.ExactDouble)) {
      val m = mono.search(q, 10, mode)
      val s = multi.search(q, 10, mode)
      assert(s.totalHits == m.totalHits, s"totalHits q=$q mode=$mode")
      assert(s.scoreDocs.map(d => (d.docId, d.score)).toSeq ==
        m.scoreDocs.map(d => (d.docId, d.score)).toSeq, s"q=$q mode=$mode")
    }
  }

  test("groupedSearch heap ≡ window reference on a 90%-skewed group column") {
    import org.apache.spark.sql.functions._
    // one group owns 90% of the matches — the skew shape the former
    // row_number window funneled through a single task
    val rows = (0 until 400).map { i =>
      val lang = if (i % 10 == 0) s"minor${i % 3}" else "dominant"
      (i.toLong, "r", s"p$i", s"c$i", lang, s"merge tok$i shared merge words")
    }.toDF("doc_id", "repo", "path", "commit", "lang", "content")
    val dir = java.nio.file.Files.createTempDirectory("graft-group-skew").toString
    new IndexBuilder(spark, cfg).build(rows, dir)
    val s = new IndexSearcher(spark, dir)
    val q = TermQuery("merge")
    def norm(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3)).toSeq
    val got = norm(s.groupedSearch(q, "lang", 10, 3, ScoreMode.ExactDouble).collect())
    // independent window reference over the same scored match set
    val hits = s.scoredDocs(q, ScoreMode.ExactDouble).toDF("docId", "score")
      .join(spark.read.parquet(s"$dir/docs").select(col("docId"), col("lang")), "docId")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score").desc, col("docId").asc)
    val leaders = hits.groupBy(col("lang")).agg(max(col("score")).as("groupTop"))
      .orderBy(col("groupTop").desc, col("lang")).limit(10)
    val ref = norm(hits.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .join(broadcast(leaders), Seq("lang"))
      .select(col("lang"), col("groupTop"), col("rank"), col("docId"), col("score"))
      .collect())
    assert(got == ref)
    assert(got.count(_._1 == "dominant") == 3) // dominant group capped at docsPerGroup
    assert(got.nonEmpty && ref.nonEmpty)
  }
}
