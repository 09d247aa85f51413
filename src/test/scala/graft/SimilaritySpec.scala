package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.SmallFloat
import graft.search._

/** Unit checks for the ranking-model family against hand-computed values of
  * the reference formulas (SURVEY.md §2.5 file:line per model).
  */
class SimilaritySpec extends AnyFunSuite {
  private val cs = CollectionStats("content", maxDoc = 1000, docCount = 1000,
    sumTotalTermFreq = 100000, sumDocFreq = 50000)
  private val ts = TermStats("content", "t", docFreq = 100, totalTermFreq = 400)
  private val norm10 = SmallFloat.encodeNorm(10, 0) // dl = 10

  private def dl(b: Byte): Float = SmallFloat.decodeNormToDocLen(b)

  test("BM25 reference formula (bm25.go:49-58)") {
    val s = new Bm25Similarity().termScorer(ts, cs, 1.0f)
    val idf = math.log(1.0 + (1000.0 - 100 + 0.5) / (100 + 0.5)).toFloat
    val avgdl = 100000f / 1000f
    val norm = dl(norm10) / avgdl
    val exp = idf * ((3f * 2.2f) / (3f + 1.2f * (1 - 0.75f + 0.75f * norm)))
    assert(math.abs(s.score(3f, norm10) - exp) < 1e-6)
  }

  test("BM25 variants order identically but score differently") {
    val models = Seq(new Bm25Similarity(), new Bm25LSimilarity(),
      new Bm25PlusSimilarity(), new AtireBm25Similarity(), new ModBm25Similarity())
    val scores = models.map(_.termScorer(ts, cs, 1.0f).score(3f, norm10))
    assert(scores.forall(s => s > 0 && !s.isNaN))
    assert(scores.distinct.size >= 4) // formulas genuinely differ
    // monotone in freq for each variant
    models.foreach { m =>
      val sc = m.termScorer(ts, cs, 1.0f)
      assert(sc.score(5f, norm10) > sc.score(1f, norm10), m.name)
    }
  }

  test("LM-Dirichlet (lmDirichlet.go:33-47): formula + clamp at 0") {
    val m = new LMDirichletSimilarity()
    val sc = m.termScorer(ts, cs, 1.0f)
    val p = 401f / 100001f
    val exp = (math.log(1 + 3f / (2000f * p)) + math.log(2000.0 / (dl(norm10) + 2000f))).toFloat
    assert(math.abs(sc.score(3f, norm10) - exp) < 1e-6)
    // very common term in long doc → negative raw score → clamp to 0
    val common = TermStats("content", "t", 990, 90000)
    val long = SmallFloat.encodeNorm(4000, 0)
    assert(new LMDirichletSimilarity().termScorer(common, cs, 1f).score(1f, long) >= 0)
  }

  test("LM Jelinek-Mercer (lmJelinek.go:30-44)") {
    val sc = new LMJelinekMercerSimilarity(0.1f).termScorer(ts, cs, 1.0f)
    val p = 401f / 100001f
    val d = dl(norm10)
    val exp = (math.log(1 + (0.9 * 3f / d) / (0.1 * p)) + math.log(0.1)).toFloat
    assert(math.abs(sc.score(3f, norm10) - exp) < 1e-5)
  }

  test("DFI (dfi.go): zero when freq <= expected, positive above") {
    val sc = new DFISimilarity("chi").termScorer(ts, cs, 1.0f)
    val expected = 401f * dl(norm10) / 100001f
    assert(sc.score(expected / 2, norm10) == 0f)
    assert(sc.score(5f, norm10) > 0f)
  }

  test("DFR compositions produce finite positive scores, monotone in tf") {
    for (bm <- Seq("BE", "D", "G", "In", "Ine", "IF", "P");
         ae <- Seq("B", "L", "none");
         nz <- Seq("H1", "H2", "H2Exp", "H3", "BM25", "F", "J", "Jn", "Z", "DP", "none")) {
      val sc = new DFRSimilarity(bm, ae, nz).termScorer(ts, cs, 1.0f)
      val s1 = sc.score(1f, norm10)
      val s5 = sc.score(5f, norm10)
      assert(!s1.isNaN && !s1.isInfinite, s"$bm/$ae/$nz s1=$s1")
      assert(s5 > 0, s"$bm/$ae/$nz s5=$s5")
    }
  }

  test("DFR BE and D reproduce the reference formulas (basicModel.go:50-90)") {
    // hand-computed against the published Bose-Einstein / divergence
    // approximations at tfn=2, ttf=400, N=1000 (stats of `ts`/`cs`)
    def log2(x: Double) = math.log(x) / math.log(2)
    val tfn = 2.0
    val F = 400.0 + 1 + tfn
    val nBE = F + 1000.0
    def f(a: Double, m: Double) = (m + 0.5) * log2(a / m) + (a - m) * log2(a)
    val be = -log2((nBE - 1) * math.E) + f(nBE + F - 1, nBE + F - tfn - 2) - f(F, F - tfn)
    val scBE = new DFRSimilarity("BE", "none", "none").termScorer(ts, cs, 1.0f)
    assert(math.abs(scBE.score(2f, norm10) - be.toFloat) < 1e-4 * math.abs(be))

    val phi = tfn / F
    val nphi = 1 - phi
    val p = 1.0 / 1001.0
    val dD = phi * log2(phi / p) + nphi * log2(nphi / (1 - p))
    val d = dD * F + 0.5 * log2(1 + 2 * math.Pi * tfn * nphi)
    val scD = new DFRSimilarity("D", "none", "none").termScorer(ts, cs, 1.0f)
    assert(math.abs(scD.score(2f, norm10) - d.toFloat) < 1e-4 * math.abs(d))
  }

  test("DFR normalization reference defaults and formulas (normalization.go)") {
    val avg = 100000f / 1000f // sumTTF/maxDoc = avgFieldLength of `cs`
    val len = dl(norm10)
    // BM25 normalization, default c=0.75
    val bm25n = new DFRSimilarity("IF", "none", "BM25").termScorer(ts, cs, 1.0f)
    val ifOnly = new DFRSimilarity("IF", "none", "none").termScorer(ts, cs, 1.0f)
    val tfnBM25 = 3f / (1 - 0.75f + 0.75f * (len / avg))
    // IF is linear in tfn up to the log factor; verify via ratio of scores at
    // matching raw tf values
    assert(math.abs(bm25n.score(3f, norm10) - ifOnly.score(tfnBM25, norm10)) < 1e-4)
    // J normalization, default c=0.20
    val jn = new DFRSimilarity("IF", "none", "J").termScorer(ts, cs, 1.0f)
    val mleC = 401f / 100001f
    val tfnJ = ((1 - 0.20f) * (3f / len) + 0.20f * mleC) * len
    assert(math.abs(jn.score(3f, norm10) - ifOnly.score(tfnJ, norm10)) < 1e-4)
  }

  test("IB models finite and positive") {
    for (d <- Seq("LL", "SPL"); l <- Seq("DF", "TTF")) {
      val sc = new IBSimilarity(d, l).termScorer(ts, cs, 1.0f)
      val s = sc.score(3f, norm10)
      assert(s > 0 && !s.isNaN && !s.isInfinite, s"IB($d,$l)=$s")
    }
  }

  test("TF-IDF (default.go:41-119): tf=√freq, idf=ln(N/(df+1))+1, coord, queryNorm") {
    val m = new TfIdfSimilarity
    val idf = (math.log(1000.0 / 101) + 1).toFloat
    val sc = m.termScorer(ts, cs, 1.0f) // un-normalized (qn=1): value = idf²
    val exp = idf * idf * math.sqrt(3.0).toFloat * SmallFloat.byte315ToFloat(norm10)
    assert(math.abs(sc.score(3f, norm10) - exp) < 1e-4)
    assert(m.coord(2, 3) == 2f / 3f)
    assert(math.abs(m.queryNorm(4f) - 0.5f) < 1e-6)
    val v = m.valueForNormalization(ts, cs, 2.0f)
    assert(math.abs(v - (idf * 2) * (idf * 2)) < 1e-4)
  }

  test("remaining LM family: finite, clamped, monotone where applicable") {
    val models = Seq(new LMHiemstraSimilarity(), new LMAbsoluteDiscountingSimilarity(),
      new LMPitmanYorProcessSimilarity(), new LMTwoStageSimilarity())
    for (m <- models) {
      val sc = m.termScorer(ts, cs, 1.0f)
      val s = sc.score(3f, norm10)
      assert(!s.isNaN && !s.isInfinite && s >= 0, m.name)
    }
    // Hiemstra hand-check: log(1 + (λ f F)/((1-λ) ttf dl))
    val h = new LMHiemstraSimilarity(0.15f).termScorer(ts, cs, 1.0f)
    val exp = math.log(1.0 + (0.15f * 3f * 100000f).toDouble / (0.85f * 400f * dl(norm10)).toDouble).toFloat
    assert(math.abs(h.score(3f, norm10) - exp) < 1e-5)
  }

  test("MultiSimilarity = mean of subs") {
    val subs = Seq(new Bm25Similarity(), new LMDirichletSimilarity())
    val multi = new MultiSimilarity(subs).termScorer(ts, cs, 1.0f)
    val mean = subs.map(_.termScorer(ts, cs, 1.0f).score(3f, norm10)).sum / 2
    assert(math.abs(multi.score(3f, norm10) - mean) < 1e-6)
  }
}
