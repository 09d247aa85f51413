package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.StandardCodeAnalyzer
import graft.index._
import graft.search._

/** Exact-double twins of the non-BM25 similarities (the ScoreMode.ExactDouble
  * arithmetic the DuckDB oracle reproduces — ft_tfidf / ft_lm_dirichlet in
  * SparkEntry). Asserts the engine's exact path against independent
  * from-the-stats recomputation, explain parity, and the TF-IDF coord factor
  * in exact mode (the one place ExactDouble multiplies by a float32 value).
  */
class ExactSimSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val N = 800
  private lazy val indexPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft-exactsim").toString
    val cfg = IndexConfig(analyzer = new StandardCodeAnalyzer(),
      docsPerRange = 128, numSegments = 4, segmentsPerWave = 4)
    new IndexBuilder(spark, cfg).build(TestCorpus.corpus(N).toDF(), dir)
    dir
  }

  private def tfidfSearcher = new IndexSearcher(spark, indexPath,
    similarity = new TfIdfSimilarity)
  private def lmdSearcher = new IndexSearcher(spark, indexPath,
    similarity = new LMDirichletSimilarity)

  private def stop(t: String): Boolean =
    graft.analysis.Analyzer.EnglishStopWords.contains(t)

  private lazy val docIdByPath: Map[String, Long] =
    spark.read.parquet(s"$indexPath/docs")
      .select("path", "docId").as[(String, Long)].collect().toMap

  test("TF-IDF exact: MUST+SHOULD scores recompute from stats (incl. coord and queryNorm)") {
    val s = tfidfSearcher
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("import")),
      BooleanClause(Occur.SHOULD, TermQuery("parser"))))
    val cs = s.collectionStats("content")
    val st = s.termStats(Seq(("content", "import"), ("content", "parser")))
    def idf(t: String): Double =
      math.log(cs.maxDoc.toDouble / (st(("content", t)).docFreq.toDouble + 1)) + 1.0
    val (im, ip) = (idf("import"), idf("parser"))
    val qn = 1.0 / math.sqrt((im * 1.0) * (im * 1.0) + (ip * 1.0) * (ip * 1.0))
    def leaf(idfV: Double, f: Int, dl: Int): Double =
      (((idfV * 1.0) * qn) * idfV) * math.sqrt(f.toDouble) * (1.0 / math.sqrt(dl.toDouble))

    val hits = s.scoredDocs(q, ScoreMode.ExactDouble).collect().map(h => h.docId -> h.score).toMap
    assert(hits.nonEmpty)
    val witnesses = TestCorpus.corpus(N)
      .map(d => d.path -> d.content.split(' ').filterNot(stop).toSeq)
      .filter(_._2.contains("import"))
      .take(25) // bounded; fixture mixes coord=0.5 and coord=1.0 docs below
    assert(witnesses.nonEmpty)
    var halfCoord = 0
    var fullCoord = 0
    for ((path, toks) <- witnesses) {
      val docId = docIdByPath(path)
      val dl = toks.length
      val fImport = toks.count(_ == "import")
      val fParser = toks.count(_ == "parser")
      val base = leaf(im, fImport, dl) +
        (if (fParser > 0) { fullCoord += 1; leaf(ip, fParser, dl) }
         else { halfCoord += 1; 0.0 })
      val coord = (1 + (if (fParser > 0) 1 else 0)).toFloat / 2.0f
      val expected = base * coord.toDouble
      assert(hits.contains(docId), s"doc $path missing from hits")
      assert(hits(docId) == expected,
        s"$path: engine=${hits(docId)} recomputed=$expected")
    }
    assert(halfCoord > 0 && fullCoord > 0,
      s"fixture must exercise both coord branches (got $halfCoord/$fullCoord)")
  }

  test("TF-IDF exact: explain value == search score, coord composes") {
    val s = tfidfSearcher
    val q = BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("import")),
      BooleanClause(Occur.SHOULD, TermQuery("parser"))))
    val top = s.search(q, 5, ScoreMode.ExactDouble)
    assert(top.scoreDocs.nonEmpty)
    for (hit <- top.scoreDocs) {
      val ex = s.explain(q, hit.docId, ScoreMode.ExactDouble)
      assert(ex.value == hit.score, s"doc=${hit.docId}:\n${ex.render}")
    }
    // a must-only match has coord 0.5 → the coord-scaled product composition
    val mustOnly = s.scoredDocs(q, ScoreMode.ExactDouble).collect().map(_.docId).toSet
    val both = s.scoredDocs(BooleanQuery(Seq(
      BooleanClause(Occur.MUST, TermQuery("import")),
      BooleanClause(Occur.MUST, TermQuery("parser")))), ScoreMode.ExactDouble)
      .collect().map(_.docId).toSet
    val coordHalf = (mustOnly -- both).headOption
    assert(coordHalf.nonEmpty, "fixture must contain an import-without-parser doc")
    val ex = s.explain(q, coordHalf.get, ScoreMode.ExactDouble)
    assert(ex.description.contains("coord-scaled"), ex.render)
    assert(ex.details.last.value == 0.5, ex.render)
    assert(ex.value == ex.details.head.value * ex.details.last.value, ex.render)
  }

  test("every oracle-verified model: explain == search score, exact and ref32, term + boolean") {
    val models: Seq[(String, Similarity)] = Seq(
      "bm25" -> new Bm25Similarity,
      "bm25l" -> new Bm25LSimilarity,
      "bm25plus" -> new Bm25PlusSimilarity,
      "atire" -> new AtireBm25Similarity,
      "modbm25" -> new ModBm25Similarity,
      "tfidf" -> new TfIdfSimilarity,
      "lmd" -> new LMDirichletSimilarity,
      "lmjm" -> new LMJelinekMercerSimilarity,
      "lmh" -> new LMHiemstraSimilarity,
      "lmad" -> new LMAbsoluteDiscountingSimilarity,
      "lmts" -> new LMTwoStageSimilarity,
      "dfr" -> new DFRSimilarity,
      "ib" -> new IBSimilarity,
      "dfi" -> new DFISimilarity,
      "multi" -> new MultiSimilarity(Seq(new Bm25Similarity, new TfIdfSimilarity)),
      "perfield" -> new PerFieldSimilarityWrapper(new Bm25Similarity,
        Map("content" -> new Bm25LSimilarity)))
    val qs = Seq[Query](
      TermQuery("import"),
      BooleanQuery(Seq(
        BooleanClause(Occur.MUST, TermQuery("import")),
        BooleanClause(Occur.SHOULD, TermQuery("parser")))))
    for ((name, sim) <- models; q <- qs;
         mode <- Seq[ScoreMode](ScoreMode.ExactDouble, ScoreMode.Ref32)) {
      val s = new IndexSearcher(spark, indexPath, similarity = sim)
      val top = s.search(q, 3, mode)
      assert(top.scoreDocs.nonEmpty, s"$name/$q/$mode: no hits")
      for (hit <- top.scoreDocs) {
        val ex = s.explain(q, hit.docId, mode)
        assert(ex.value == hit.score,
          s"$name/$mode doc=${hit.docId}: explain=${ex.value} != score=${hit.score}\n${ex.render}")
      }
    }
  }

  test("LM Dirichlet exact: scores recompute from stats; clamped docs still match") {
    val s = lmdSearcher
    val q = TermQuery("import")
    val cs = s.collectionStats("content")
    val ts = s.termStats(Seq(("content", "import")))(("content", "import"))
    val p = (ts.totalTermFreq + 1).toDouble / (cs.sumTotalTermFreq + 1).toDouble
    val hits = s.scoredDocs(q, ScoreMode.ExactDouble).collect().map(h => h.docId -> h.score).toMap
    assert(hits.nonEmpty)
    val byId = docIdByPath.map(_.swap)
    val toksByPath = TestCorpus.corpus(N)
      .map(d => d.path -> d.content.split(' ').filterNot(stop).toSeq).toMap
    var clamped = 0
    for ((docId, score) <- hits) {
      val toks = toksByPath(byId(docId))
      val f = toks.count(_ == "import").toDouble
      val dl = toks.length.toDouble
      val raw = 1.0 * (math.log(1 + f / (2000.0 * p)) + math.log(2000.0 / (dl + 2000.0)))
      val expected = if (raw > 0) raw else 0.0
      assert(score == expected, s"doc=$docId engine=$score recomputed=$expected")
      if (score == 0.0) clamped += 1
    }
    // μ=2000 dwarfs these small docs: the log(μ/(dl+μ)) penalty wins for
    // low freqs, so the clamp MUST fire somewhere in this fixture
    assert(clamped > 0, "expected at least one clamped (score==0) match")
    for (hit <- s.search(q, 5, ScoreMode.ExactDouble).scoreDocs) {
      val ex = s.explain(q, hit.docId, ScoreMode.ExactDouble)
      assert(ex.value == hit.score, ex.render)
    }
  }

  test("LM Pitman-Yor exact twin: clamp on real stats, positive regime on small stats") {
    val s = new IndexSearcher(spark, indexPath,
      similarity = new LMPitmanYorProcessSimilarity)
    val q = TermQuery("import")
    // on this corpus sumTokens >> dl+mu → the discount log goes NaN → every
    // match clamps to 0 (reference behavior); docs still MATCH
    val hits = s.scoredDocs(q, ScoreMode.ExactDouble).collect()
    assert(hits.nonEmpty && hits.forall(_.score == 0.0))
    // positive regime: a tiny synthetic collection where the discount term
    // is in-domain — pin the exact formula by hand computation
    val sim = new LMPitmanYorProcessSimilarity
    val cs = CollectionStats("content", maxDoc = 10, docCount = 10,
      sumTotalTermFreq = 50, sumDocFreq = 30)
    val ts = TermStats("content", "t", docFreq = 2, totalTermFreq = 2)
    val sc = sim.exactTermScorer(ts, cs, 1.0)
    val (f, dl) = (10.0, 20.0)
    val deltaD = 0.7f.toDouble
    val p = 3.0 / 51.0
    val fp = math.max(f - deltaD * math.pow(f, deltaD), 0.0)
    val expected = math.log(1 + fp / (2000.0 * p)) + math.log(1.0 - 50.0 / (dl + 2000.0))
    assert(sc.score(f, dl) == (if (expected > 0) expected else 0.0))
    assert(expected > 0, "fixture must exercise the positive regime")
  }
}
