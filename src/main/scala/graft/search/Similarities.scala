package graft.search

import graft.codec.SmallFloat

/** Pluggable ranking models (reference inventory: /root/repo/SURVEY.md §2.5).
  *
  * A [[Similarity]] builds per-term [[Similarity.Scorer]]s on the driver from
  * broadcast-able statistics; scorers are pure `(freq, normByte) => Float`
  * float32 functions evaluated inside the range-grouped scoring stage.
  * `coord`/`queryNorm` default to 1 (as in the reference's base similarity,
  * /root/reference/core/search/similarities/similarity.go:34-40); only
  * TF-IDF overrides them.
  */
trait Similarity extends Serializable {
  def name: String
  def termScorer(ts: TermStats, cs: CollectionStats, boost: Float): Similarity.Scorer
  /** Multi-term (phrase) scorer fed with phraseFreq. */
  def phraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Float): Similarity.Scorer
  def coord(overlap: Int, maxOverlap: Int): Float = 1.0f
  def queryNorm(valueForNormalization: Float): Float = 1.0f
  /** (idf-ish weight)^2 used for queryNorm accumulation; 0 unless TF-IDF. */
  def valueForNormalization(ts: TermStats, cs: CollectionStats, boost: Float): Float = 0.0f

  // ---- exact-double twins (ScoreMode.ExactDouble, the ANSI-SQL-oracle
  // arithmetic: float64 over TRUE doc lengths). Ref32 stays the
  // reference-parity mode; models without a defined exact twin fall back to
  // reference-default BM25 exact (the driver surface's model). ----

  def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Bm25.exactScorer(ts, cs, boost = boost)

  /** Phrase exact twin: weight = Σ member idf (bm25.go idfExplainPhrase). */
  def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Bm25.ExactScorer(tss.map(t => Bm25.idfExact(t.docFreq, cs.maxDoc)).sum * boost,
      Bm25.avgdlExact(cs), 1.2, 0.75)

  def exactValueForNormalization(ts: TermStats, cs: CollectionStats, boost: Double): Double = 0.0
  def exactQueryNorm(v: Double): Double = 1.0
}

object Similarity {
  trait Scorer extends Serializable {
    def score(freq: Float, normByte: Byte): Float
    /** multiplied in after queryNorm is known (TF-IDF two-phase weighting) */
    def normalize(queryNorm: Float): Scorer = this

    /** WAND range bound: an upper bound on score(f, b') over all f ≤ freq
      * and all docs AT LEAST as long as `normByte` encodes. Defaults to
      * score itself — valid whenever the model is nonincreasing in doc
      * length (every shipped model EXCEPT LM Pitman-Yor, whose discount
      * term ln(1 - sumTokens/(dl+μ)) GROWS with dl; it overrides with a
      * dl-independent bound). Wrappers that COMBINE sub-scorers (mean, sum)
      * must combine the subs' boundScore, not their score.
      */
    def boundScore(freq: Float, normByte: Byte): Float = score(freq, normByte)

    /** Multiplicative factors whose float32 product IN ORDER equals
      * score(freq, normByte) exactly — the reference Explanation's
      * "product of:" composition (explanation.go, term.go:163-193).
      * Models whose score does not factor return the score itself.
      */
    def explainFactors(freq: Float, normByte: Byte): Seq[(String, Float)] =
      Seq(("score", score(freq, normByte)))
  }

  /** Float64 twin of [[Scorer]] over exact doc length (ExactDouble mode —
    * the arithmetic the DuckDB oracle reproduces bit-for-bit).
    * `explainFactors`: float64 product IN ORDER equals score exactly.
    */
  trait ExactScorer extends Serializable {
    def score(freq: Double, dl: Double): Double
    /** multiplied in after the exact queryNorm is known (TF-IDF two-phase) */
    def normalize(queryNorm: Double): ExactScorer = this
    def explainFactors(freq: Double, dl: Double): Seq[(String, Double)] =
      Seq(("score", score(freq, dl)))
    /** WAND range bound (see [[Scorer.boundScore]]): upper bound over all
      * f ≤ freq, dl' ≥ dl; default = score (dl-monotone models).
      */
    def boundScore(freq: Double, dl: Double): Double = score(freq, dl)
  }

  /** phrase exact twin shared by the SimilarityBase family: Σ member exact
    * scorers at phraseFreq (multiSimScorer semantics).
    */
  def sumOf(subs: Seq[ExactScorer]): ExactScorer = new ExactScorer {
    def score(freq: Double, dl: Double): Double = subs.map(_.score(freq, dl)).sum
    override def boundScore(freq: Double, dl: Double): Double =
      subs.map(_.boundScore(freq, dl)).sum
  }

  /** norm byte → decoded doc length 1/f² (shared by BM25 + SimilarityBase). */
  val docLenTable: Array[Float] =
    Array.tabulate(256)(i => SmallFloat.decodeNormToDocLen(i.toByte))
}

/** Reference-default BM25 (k1=1.2, b=0.75), float32 parity
  * (/root/reference/core/search/similarities/bm25.go). Variant hooks for
  * BM25L / BM25+ / ATIRE / modBM25 (bm25l.go:30, bm25plus.go:25,
  * atireBM25.go:23, modBM25.go:23).
  */
class Bm25Similarity(k1: Float = 1.2f, b: Float = 0.75f) extends Similarity {
  def name = "BM25"

  protected def idf(df: Long, n: Long): Float = Bm25.idfRef(df, n)
  protected def tfNorm(freq: Float, norm: Float): Float = {
    val num = freq * (k1 + 1)
    val denom = freq + k1 * (1 - b + b * norm)
    num / denom
  }

  private final class S(weight: Float, avgdl: Float) extends Similarity.Scorer {
    private val cache = Array.tabulate(256)(i => Similarity.docLenTable(i) / avgdl)
    def score(freq: Float, normByte: Byte): Float =
      weight * tfNorm(freq, cache(normByte & 0xff))
    // same expression split at its one multiply: weight × tfNorm == score
    override def explainFactors(freq: Float, normByte: Byte): Seq[(String, Float)] =
      Seq(("queryWeight(idf×boost)", weight),
        ("tfNorm", tfNorm(freq, cache(normByte & 0xff))))
  }

  override def termScorer(ts: TermStats, cs: CollectionStats, boost: Float): Similarity.Scorer =
    new S(idf(ts.docFreq, cs.maxDoc) * boost, Bm25.avgdlRef(cs))

  override def phraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Float): Similarity.Scorer =
    new S(tss.map(t => idf(t.docFreq, cs.maxDoc)).sum * boost, Bm25.avgdlRef(cs))
}

/** BM25L (bm25l.go): idf = ln((N+1)/(df+0.5)); shifted tf normalization. */
class Bm25LSimilarity(k1: Float = 1.2f, b: Float = 0.75f, d: Float = 0.5f)
    extends Bm25Similarity(k1, b) {
  override def name = "BM25L"
  override protected def idf(df: Long, n: Long): Float =
    math.log((n.toDouble + 1) / (df.toDouble + 0.5)).toFloat
  override protected def tfNorm(freq: Float, norm: Float): Float = {
    val c = freq / (1 - b + b * norm)
    ((k1 + 1) * (c + d)) / (k1 + (c + d))
  }

  // ---- exact-double twin (oracle-reproducible): parameters enter as the
  // WIDENED float32 values (SQL: CAST(CAST(1.2 AS REAL) AS DOUBLE)). ----

  private def exactL(w: Double, avg: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val (k1D, bD, dD) = (k1.toDouble, b.toDouble, d.toDouble)
      def score(freq: Double, dl: Double): Double = {
        val c = freq / (1 - bD + bD * (dl / avg))
        w * (((k1D + 1) * (c + dD)) / (k1D + (c + dD)))
      }
    }
  private def idfLD(df: Long, n: Long): Double =
    math.log((n.toDouble + 1) / (df.toDouble + 0.5))

  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    exactL(idfLD(ts.docFreq, cs.maxDoc) * boost, Bm25.avgdlExact(cs))
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    exactL(tss.map(t => idfLD(t.docFreq, cs.maxDoc)).sum * boost, Bm25.avgdlExact(cs))
}

/** BM25+ (bm25plus.go): BM25 tf-norm + 1 (lower-bounding). */
/** Shared exact-double twin shape for the BM25 variants (k1 enters as the
  * WIDENED float32 value; b=0.75 widens exactly): weight × (tfNorm [+1]).
  */
private[search] object Bm25VariantExact {
  def scorer(w: Double, avg: Double, k1F: Float, bF: Float, plus1: Boolean): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val (k1D, bD) = (k1F.toDouble, bF.toDouble)
      def score(freq: Double, dl: Double): Double = {
        val tf = (freq * (k1D + 1)) / (freq + k1D * (1 - bD + bD * (dl / avg)))
        w * (if (plus1) tf + 1 else tf)
      }
    }
}

class Bm25PlusSimilarity(k1: Float = 1.2f, b: Float = 0.75f)
    extends Bm25Similarity(k1, b) {
  override def name = "BM25+"
  override protected def tfNorm(freq: Float, norm: Float): Float =
    super.tfNorm(freq, norm) + 1
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Bm25VariantExact.scorer(Bm25.idfExact(ts.docFreq, cs.maxDoc) * boost,
      Bm25.avgdlExact(cs), k1, b, plus1 = true)
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Bm25VariantExact.scorer(tss.map(t => Bm25.idfExact(t.docFreq, cs.maxDoc)).sum * boost,
      Bm25.avgdlExact(cs), k1, b, plus1 = true)
}

/** ATIRE BM25 (atireBM25.go): idf = ln(N/df). */
class AtireBm25Similarity(k1: Float = 1.2f, b: Float = 0.75f)
    extends Bm25Similarity(k1, b) {
  override def name = "ATIRE-BM25"
  override protected def idf(df: Long, n: Long): Float =
    math.log(n.toDouble / df.toDouble).toFloat
  private def idfD(df: Long, n: Long): Double = math.log(n.toDouble / df.toDouble)
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Bm25VariantExact.scorer(idfD(ts.docFreq, cs.maxDoc) * boost,
      Bm25.avgdlExact(cs), k1, b, plus1 = false)
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Bm25VariantExact.scorer(tss.map(t => idfD(t.docFreq, cs.maxDoc)).sum * boost,
      Bm25.avgdlExact(cs), k1, b, plus1 = false)
}

/** modBM25 (modBM25.go): idf = ln((N+1)/df). */
class ModBm25Similarity(k1: Float = 1.2f, b: Float = 0.75f)
    extends Bm25Similarity(k1, b) {
  override def name = "modBM25"
  override protected def idf(df: Long, n: Long): Float =
    math.log((n.toDouble + 1) / df.toDouble).toFloat
  private def idfD(df: Long, n: Long): Double = math.log((n.toDouble + 1) / df.toDouble)
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Bm25VariantExact.scorer(idfD(ts.docFreq, cs.maxDoc) * boost,
      Bm25.avgdlExact(cs), k1, b, plus1 = false)
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Bm25VariantExact.scorer(tss.map(t => idfD(t.docFreq, cs.maxDoc)).sum * boost,
      Bm25.avgdlExact(cs), k1, b, plus1 = false)
}

/** Base for the SimilarityBase family (similarityBase.go:39-211): one pure
  * `score(stats, freq, docLen)`; phrase = sum of per-term scorers at the same
  * freq (multiSimScorer semantics); coord = queryNorm = 1.
  */
final case class BasicStats(
    numberOfDocuments: Long, numberOfFieldTokens: Long, avgFieldLength: Float,
    docFreq: Long, totalTermFreq: Long, totalBoost: Float)

abstract class SimilarityBase extends Similarity {
  protected def score(stats: BasicStats, freq: Float, docLen: Float): Float

  /** WAND bound hook (see [[Similarity.Scorer.boundScore]]): default = score,
    * valid for every dl-nonincreasing model; LM Pitman-Yor overrides.
    */
  protected def boundScore(stats: BasicStats, freq: Float, docLen: Float): Float =
    score(stats, freq, docLen)

  private def stats(ts: TermStats, cs: CollectionStats, boost: Float) =
    BasicStats(cs.maxDoc, cs.sumTotalTermFreq,
      if (cs.sumTotalTermFreq <= 0) 1.0f else cs.sumTotalTermFreq.toFloat / cs.maxDoc.toFloat,
      ts.docFreq, ts.totalTermFreq, boost)

  private final class S(st: BasicStats, self: SimilarityBase) extends Similarity.Scorer {
    def score(freq: Float, normByte: Byte): Float =
      self.score(st, freq, Similarity.docLenTable(normByte & 0xff))
    override def boundScore(freq: Float, normByte: Byte): Float =
      self.boundScore(st, freq, Similarity.docLenTable(normByte & 0xff))
  }

  override def termScorer(ts: TermStats, cs: CollectionStats, boost: Float): Similarity.Scorer =
    new S(stats(ts, cs, boost), this)

  override def phraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Float): Similarity.Scorer = {
    val subs = tss.map(t => termScorer(t, cs, boost))
    new Similarity.Scorer {
      def score(freq: Float, normByte: Byte): Float =
        subs.map(_.score(freq, normByte)).sum
      override def boundScore(freq: Float, normByte: Byte): Float =
        subs.map(_.boundScore(freq, normByte)).sum
    }
  }
}

/** LM-Dirichlet, μ=2000 (lmDirichlet.go:33-47); collection model
  * p = (ttf+1)/(fieldTokens+1) (lm.go:101-103). Negative scores clamp to 0.
  */
class LMDirichletSimilarity(mu: Float = 2000f) extends SimilarityBase {
  def name = "LMDirichlet"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val p = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
    val s = st.totalBoost * (math.log(1 + (freq / (mu * p)).toDouble) +
      math.log((mu / (docLen + mu)).toDouble)).toFloat
    if (s > 0) s else 0
  }

  // ---- exact-double twin (oracle-reproducible): float64 over true dl,
  // p = (ttf+1)/(fieldTokens+1) in float64; negative clamps to 0 (a clamped
  // doc still matches, scoring 0). ----

  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val muD = mu.toDouble
      private val p = (ts.totalTermFreq + 1).toDouble / (cs.sumTotalTermFreq + 1).toDouble
      def score(freq: Double, dl: Double): Double = {
        val s = boost * (math.log(1 + freq / (muD * p)) + math.log(muD / (dl + muD)))
        if (s > 0) s else 0.0
      }
    }

  /** phrase exact = Σ member exact scorers at phraseFreq (multiSimScorer). */
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** LM Jelinek-Mercer (lmJelinek.go:30-44). */
class LMJelinekMercerSimilarity(lambda: Float = 0.1f) extends SimilarityBase {
  def name = "LMJelinekMercer"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val p = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
    st.totalBoost * (math.log(1 + ((1 - lambda.toDouble) * freq / docLen) / (lambda.toDouble * p)) +
      math.log(lambda.toDouble)).toFloat
  }

  // ---- exact-double twin: λ enters as the widened float32 value (the SQL
  // twin writes CAST(CAST(λ AS REAL) AS DOUBLE)); no clamp — scores go
  // negative via the +ln(λ) background term, as in the reference. ----

  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val lamD = lambda.toDouble
      private val p = (ts.totalTermFreq + 1).toDouble / (cs.sumTotalTermFreq + 1).toDouble
      def score(freq: Double, dl: Double): Double =
        boost * (math.log(1 + ((1 - lamD) * freq / dl) / (lamD * p)) + math.log(lamD))
    }

  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** LM Hiemstra (lmHiemstra.go:25-39, λ=0.15 default): clamped at 0. */
class LMHiemstraSimilarity(lambda: Float = 0.15f) extends SimilarityBase {
  def name = "LMHiemstra"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val s = st.totalBoost * math.log(
      1.0 + (lambda * freq * st.numberOfFieldTokens.toFloat).toDouble /
        ((1 - lambda) * st.totalTermFreq.toFloat * docLen).toDouble).toFloat
    if (s > 0) s else 0
  }

  // exact-double twin: λ enters widened (SQL CAST(CAST(0.15 AS REAL) AS DOUBLE))
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val lamD = lambda.toDouble
      def score(freq: Double, dl: Double): Double = {
        val s = boost * math.log(1.0 + (lamD * freq * cs.sumTotalTermFreq.toDouble) /
          ((1 - lamD) * ts.totalTermFreq.toDouble * dl))
        if (s > 0) s else 0.0
      }
    }
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** LM absolute discounting (lmAbsoluteDiscounting.go:31-45, δ=0.7 default). */
class LMAbsoluteDiscountingSimilarity(delta: Float = 0.7f) extends SimilarityBase {
  def name = "LMAbsoluteDiscounting"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val p = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
    st.totalBoost * (math.log(1.0 + ((freq - delta) / (delta * st.numberOfFieldTokens.toFloat * p)).toDouble) +
      math.log((delta * st.numberOfFieldTokens.toFloat / docLen).toDouble)).toFloat
  }

  // exact-double twin: δ enters widened (SQL CAST(CAST(0.7 AS REAL) AS DOUBLE))
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val dD = delta.toDouble
      private val sumT = cs.sumTotalTermFreq.toDouble
      private val p = (ts.totalTermFreq + 1).toDouble / (cs.sumTotalTermFreq + 1).toDouble
      def score(freq: Double, dl: Double): Double =
        boost * (math.log(1.0 + (freq - dD) / (dD * sumT * p)) +
          math.log(dD * sumT / dl))
    }
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** LM Pitman-Yor process (lmPitmanYorProcess.go:24-40, μ=2000, δ=0.7):
  * reproduces the reference formula including its NaN→0 clamp behavior.
  */
class LMPitmanYorProcessSimilarity(mu: Float = 2000f, delta: Float = 0.7f)
    extends SimilarityBase {
  def name = "LMPitmanYor"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val p = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
    val tw = if (freq > 0) math.pow(freq.toDouble, delta.toDouble) else 0.0
    val freqPrime = math.max(freq.toDouble - delta.toDouble * tw, 0.0)
    val s = st.totalBoost * (math.log(1 + freqPrime / (mu * p).toDouble).toFloat +
      math.log(1 - (st.numberOfFieldTokens.toFloat / (docLen + mu)).toDouble).toFloat)
    if (s > 0) s else 0 // NaN (log of negative) also lands here, as in the reference
  }

  /** WAND bound (advisor round-4 fix): the discount term ln(1-T/(dl+μ))
    * INCREASES with dl, so score(maxFreq, minDl) is NOT an upper bound over
    * the range. The discount is always ≤ 0 (or NaN → clamped), so dropping
    * it yields a dl-INDEPENDENT upper bound: max(0, boost·ln(1+f'/(μp))).
    * A negative boost flips the inequality and the discount is unbounded
    * below — no finite bound exists, so +∞ disables pruning (sound).
    */
  override protected def boundScore(st: BasicStats, freq: Float, docLen: Float): Float = {
    if (st.totalBoost < 0) return Float.PositiveInfinity
    val p = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
    val tw = if (freq > 0) math.pow(freq.toDouble, delta.toDouble) else 0.0
    val fp = math.max(freq.toDouble - delta.toDouble * tw, 0.0)
    val b = st.totalBoost * math.log(1 + fp / (mu * p).toDouble).toFloat
    if (b > 0) b else 0
  }

  // exact-double twin (round-4: every shipped model has one): δ widened
  // (SQL CAST(CAST(0.7 AS REAL) AS DOUBLE)), μ=2000 exact. The reference's
  // discount term ln(1 - sumTokens/(dl+μ)) goes NaN whenever the corpus has
  // more than dl+μ tokens — the clamp lands those at 0, exactly as float32
  // does; the SQL twin models the clamp with an explicit domain CASE.
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val (muD, deltaD) = (mu.toDouble, delta.toDouble)
      private val p = (ts.totalTermFreq + 1).toDouble / (cs.sumTotalTermFreq + 1).toDouble
      def score(freq: Double, dl: Double): Double = {
        val tw = if (freq > 0) math.pow(freq, deltaD) else 0.0
        val fp = math.max(freq - deltaD * tw, 0.0)
        val s = boost * (math.log(1 + fp / (muD * p)) +
          math.log(1.0 - cs.sumTotalTermFreq.toDouble / (dl + muD)))
        if (s > 0) s else 0.0
      }
      // same non-monotone-in-dl story as the float32 twin: drop the (≤ 0)
      // discount term for a dl-independent upper bound; negative boost has
      // no finite bound (discount unbounded below) → +∞ disables pruning
      override def boundScore(freq: Double, dl: Double): Double = {
        if (boost < 0) return Double.PositiveInfinity
        val tw = if (freq > 0) math.pow(freq, deltaD) else 0.0
        val fp = math.max(freq - deltaD * tw, 0.0)
        math.max(boost * math.log(1 + fp / (muD * p)), 0.0)
      }
    }
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** LM two-stage smoothing (lmTwoStage.go:30-46, λ=0.1, μ=2000). */
class LMTwoStageSimilarity(lambda: Float = 0.1f, mu: Float = 2000f)
    extends SimilarityBase {
  def name = "LMTwoStage"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val p = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
    val norm = ((1 - lambda) * docLen + mu) / (docLen + mu)
    val s = st.totalBoost * (math.log(
      1 + (lambda * freq / (((1 - lambda) * docLen + mu) * p)).toDouble) +
      math.log(norm.toDouble)).toFloat
    if (s > 0) s else 0
  }

  // exact-double twin: λ widened (SQL CAST(CAST(0.1 AS REAL) AS DOUBLE)), μ exact
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val (lamD, muD) = (lambda.toDouble, mu.toDouble)
      private val p = (ts.totalTermFreq + 1).toDouble / (cs.sumTotalTermFreq + 1).toDouble
      def score(freq: Double, dl: Double): Double = {
        val s = boost * (math.log(1 + lamD * freq / (((1 - lamD) * dl + muD) * p)) +
          math.log(((1 - lamD) * dl + muD) / (dl + muD)))
        if (s > 0) s else 0.0
      }
    }
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** DFI — divergence from independence (dfi.go:39); independence measures
  * ChiSquared / Saturated / Standardized (independence.go).
  */
class DFISimilarity(measure: String = "chi") extends SimilarityBase {
  def name = s"DFI($measure)"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val expected = (st.totalTermFreq + 1).toFloat * docLen / (st.numberOfFieldTokens + 1).toFloat
    if (freq <= expected) return 0
    val m = measure match {
      case "chi" => (freq - expected) * (freq - expected) / expected
      case "saturated" => (freq - expected) / expected
      case _ => (freq - expected) / math.sqrt(expected.toDouble).toFloat
    }
    st.totalBoost * (math.log(m.toDouble + 1) / math.log(2)).toFloat
  }

  // ---- exact-double twin (oracle-reproducible): float64 over true dl;
  // freq at/below expectation scores 0 but still matches. ----

  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val t1 = ts.totalTermFreq.toDouble + 1
      private val s1 = cs.sumTotalTermFreq.toDouble + 1
      def score(freq: Double, dl: Double): Double = {
        val expected = t1 * dl / s1
        if (freq <= expected) return 0.0
        val m = measure match {
          case "chi" => (freq - expected) * (freq - expected) / expected
          case "saturated" => (freq - expected) / expected
          case _ => (freq - expected) / math.sqrt(expected)
        }
        boost * (math.log(m + 1) / math.log(2))
      }
    }

  /** phrase exact = Σ member exact scorers at phraseFreq (multiSimScorer). */
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** DFR framework (dfr.go:76): basicModel × afterEffect × tf-normalization —
  * the COMPLETE reference inventory. Basic models BE / D / G / I(n) / I(ne)
  * / I(F) / P (basicModel.go:40-230), after-effects B / L / none
  * (afterEffect.go), normalizations H1 / H2 / H2Exp / H3 / BM25 / F / J /
  * Jn / P (alias Z) / DP / none (normalization.go:32-301).
  *
  * `c` defaults to each normalization's reference default (H1/H2/H2Exp 1,
  * H3 1000, BM25 0.75, F 2500, J/Jn 0.20, P/Z 0.30, DP 2500).
  */
class DFRSimilarity(basicModel: String = "IF", afterEffect: String = "L",
    normalization: String = "H2", c0: Float = Float.NaN) extends SimilarityBase {
  def name = s"DFR($basicModel,$afterEffect,$normalization)"
  private val LOG2 = math.log(2)
  private def log2(x: Double): Double = math.log(x) / LOG2

  private val c: Float =
    if (!c0.isNaN) c0
    else normalization match {
      case "H3" => 1000f
      case "BM25" => 0.75f
      case "F" | "DP" => 2500f
      case "J" | "Jn" => 0.20f
      case "P" | "Z" => 0.30f
      case _ => 1.0f
    }

  private def tfn(st: BasicStats, tf: Float, len: Float): Float = normalization match {
    case "H1" => tf * c * st.avgFieldLength / len
    case "H2" => (tf * log2(1 + (c * st.avgFieldLength / len).toDouble)).toFloat
    case "H2Exp" => (tf * math.log(1 + (c * st.avgFieldLength / len).toDouble)).toFloat
    case "H3" => c * (tf + c * (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat) / (len + c)
    case "BM25" => tf / (1 - c + c * (len / st.avgFieldLength))
    case "F" => tf * (c * len / st.avgFieldLength)
    case "J" =>
      val mleC = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
      ((1 - c) * (tf / len) + c * mleC) * len
    case "Jn" =>
      val mleC = (st.docFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
      ((1 - c) * (tf / len) + c * mleC) * len
    case "P" | "Z" => // Pareto (Lucene's NormalizationZ; Terrier's P)
      (tf * math.pow((st.avgFieldLength / len).toDouble, c.toDouble)).toFloat
    case "DP" =>
      val mleC = (st.totalTermFreq + 1).toFloat / (st.numberOfFieldTokens + 1).toFloat
      c * (tf + c * mleC) / (len + c)
    case _ => tf
  }

  private def basic(st: BasicStats, tfn: Float): Float = basicModel match {
    case "BE" => // Bose-Einstein (basicModel.go:50-64): F,N shifted so the
      // approximation's F << N precondition cannot produce NaN
      val fF = st.totalTermFreq.toDouble + 1 + tfn
      val n = fF + st.numberOfDocuments.toDouble
      def f(a: Double, m: Double): Double = (m + 0.5) * log2(a / m) + (a - m) * log2(a)
      (-log2((n - 1) * math.E) + f(n + fF - 1, n + fF - tfn - 2) - f(fF, fF - tfn)).toFloat
    case "D" => // divergence approximation of the binomial (basicModel.go:76-90)
      val fF = st.totalTermFreq.toDouble + 1 + tfn
      val phi = tfn / fF
      val nphi = 1 - phi
      val p = 1.0 / (st.numberOfDocuments.toDouble + 1)
      val dD = phi * log2(phi / p) + nphi * log2(nphi / (1 - p))
      (dD * fF + 0.5 * log2(1 + 2 * math.Pi * tfn * nphi)).toFloat
    case "G" =>
      val f = st.totalTermFreq.toDouble + 1
      val n = st.numberOfDocuments.toDouble
      val lambda = f / (n + f)
      (log2(lambda + 1) + tfn * log2((1 + lambda) / lambda)).toFloat
    case "In" =>
      (tfn * log2((st.numberOfDocuments.toDouble + 1) / (st.docFreq.toDouble + 0.5))).toFloat
    case "Ine" =>
      val n = st.numberOfDocuments.toDouble
      val f = st.totalTermFreq.toDouble
      val ne = n * (1 - math.pow((n - 1) / n, f))
      (tfn * log2((n + 1) / (ne + 0.5))).toFloat
    case "P" =>
      val lambda = (st.totalTermFreq + 1).toDouble / (st.numberOfDocuments + 1).toDouble
      (tfn * log2(tfn / lambda) +
        (lambda + 1 / (12 * tfn.toDouble) - tfn) * (1 / LOG2) +
        0.5 * log2(2 * math.Pi * tfn)).toFloat
    case _ => // "IF"
      (tfn * log2(1 + (st.numberOfDocuments.toDouble + 1) / (st.totalTermFreq.toDouble + 0.5))).toFloat
  }

  private def after(st: BasicStats, tfn: Float): Float = afterEffect match {
    case "B" => ((st.totalTermFreq + 1).toFloat + 1) / ((st.docFreq + 1).toFloat * (tfn + 1))
    case "L" => 1 / (tfn + 1)
    case _ => 1
  }

  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val t = tfn(st, freq, docLen)
    st.totalBoost * basic(st, t) * after(st, t)
  }

  // ---- exact-double twin (oracle-reproducible): the same model family
  // evaluated entirely in float64 over true doc lengths; log2(x) stays
  // ln(x)/ln(2) so the SQL twin can reproduce it term for term. ----

  private def tfnD(cs: CollectionStats, ts: TermStats, tf: Double, len: Double): Double = {
    val avg = Bm25.avgdlExact(cs)
    val cD = c.toDouble
    val sumT1 = cs.sumTotalTermFreq.toDouble + 1
    normalization match {
      case "H1" => tf * cD * avg / len
      case "H2" => tf * (math.log(1 + cD * avg / len) / LOG2)
      case "H2Exp" => tf * math.log(1 + cD * avg / len)
      case "H3" => cD * (tf + cD * (ts.totalTermFreq.toDouble + 1) / sumT1) / (len + cD)
      case "BM25" => tf / (1 - cD + cD * (len / avg))
      case "F" => tf * (cD * len / avg)
      case "J" =>
        val mleC = (ts.totalTermFreq.toDouble + 1) / sumT1
        ((1 - cD) * (tf / len) + cD * mleC) * len
      case "Jn" =>
        val mleC = (ts.docFreq.toDouble + 1) / sumT1
        ((1 - cD) * (tf / len) + cD * mleC) * len
      case "P" | "Z" => tf * math.pow(avg / len, cD)
      case "DP" =>
        val mleC = (ts.totalTermFreq.toDouble + 1) / sumT1
        cD * (tf + cD * mleC) / (len + cD)
      case _ => tf
    }
  }

  private def basicD(cs: CollectionStats, ts: TermStats, tfn: Double): Double = {
    val nDocs = cs.maxDoc.toDouble
    basicModel match {
      case "BE" =>
        val fF = ts.totalTermFreq.toDouble + 1 + tfn
        val n = fF + nDocs
        def f(a: Double, m: Double): Double = (m + 0.5) * log2(a / m) + (a - m) * log2(a)
        -log2((n - 1) * math.E) + f(n + fF - 1, n + fF - tfn - 2) - f(fF, fF - tfn)
      case "D" =>
        val fF = ts.totalTermFreq.toDouble + 1 + tfn
        val phi = tfn / fF
        val nphi = 1 - phi
        val p = 1.0 / (nDocs + 1)
        val dD = phi * log2(phi / p) + nphi * log2(nphi / (1 - p))
        dD * fF + 0.5 * log2(1 + 2 * math.Pi * tfn * nphi)
      case "G" =>
        val f = ts.totalTermFreq.toDouble + 1
        val lambda = f / (nDocs + f)
        log2(lambda + 1) + tfn * log2((1 + lambda) / lambda)
      case "In" => tfn * log2((nDocs + 1) / (ts.docFreq.toDouble + 0.5))
      case "Ine" =>
        val f = ts.totalTermFreq.toDouble
        val ne = nDocs * (1 - math.pow((nDocs - 1) / nDocs, f))
        tfn * log2((nDocs + 1) / (ne + 0.5))
      case "P" =>
        val lambda = (ts.totalTermFreq.toDouble + 1) / (nDocs + 1)
        tfn * log2(tfn / lambda) + (lambda + 1 / (12 * tfn) - tfn) * (1 / LOG2) +
          0.5 * log2(2 * math.Pi * tfn)
      case _ => tfn * log2(1 + (nDocs + 1) / (ts.totalTermFreq.toDouble + 0.5))
    }
  }

  private def afterD(ts: TermStats, tfn: Double): Double = afterEffect match {
    case "B" => (ts.totalTermFreq.toDouble + 1 + 1) / ((ts.docFreq.toDouble + 1) * (tfn + 1))
    case "L" => 1 / (tfn + 1)
    case _ => 1.0
  }

  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      def score(freq: Double, dl: Double): Double = {
        val t = tfnD(cs, ts, freq, dl)
        boost * basicD(cs, ts, t) * afterD(ts, t)
      }
    }

  /** phrase exact = Σ member exact scorers at phraseFreq (multiSimScorer). */
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** Information-based models (ib.go:70): distribution LL/SPL × lambda DF/TTF
  * × normalization (H2 default).
  */
class IBSimilarity(distribution: String = "LL", lambdaKind: String = "DF",
    c: Float = 1.0f) extends SimilarityBase {
  def name = s"IB($distribution,$lambdaKind)"
  override protected def score(st: BasicStats, freq: Float, docLen: Float): Float = {
    val tfn = (freq * (math.log(1 + (c * st.avgFieldLength / docLen).toDouble) / math.log(2))).toFloat
    val lambda0 = lambdaKind match {
      case "TTF" => (st.totalTermFreq.toFloat + 1) / (st.numberOfDocuments.toFloat + 1)
      case _ => (st.docFreq.toFloat + 1) / (st.numberOfDocuments.toFloat + 1)
    }
    val d = distribution match {
      case "SPL" =>
        val l = if (lambda0 == 1) 0.99f else lambda0
        (-math.log((math.pow(l.toDouble, (tfn / (tfn + 1)).toDouble) - l) / (1 - l))).toFloat
      case _ => (-math.log((lambda0 / (tfn + lambda0)).toDouble)).toFloat
    }
    st.totalBoost * d
  }

  // ---- exact-double twin (oracle-reproducible): float64 over true dl. ----

  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new Similarity.ExactScorer {
      private val cD = c.toDouble
      private val lambda0 = lambdaKind match {
        case "TTF" => (ts.totalTermFreq.toDouble + 1) / (cs.maxDoc.toDouble + 1)
        case _ => (ts.docFreq.toDouble + 1) / (cs.maxDoc.toDouble + 1)
      }
      def score(freq: Double, dl: Double): Double = {
        val tfn = freq * (math.log(1 + cD * Bm25.avgdlExact(cs) / dl) / math.log(2))
        val d = distribution match {
          case "SPL" =>
            val l = if (lambda0 == 1) 0.99 else lambda0
            -math.log((math.pow(l, tfn / (tfn + 1)) - l) / (1 - l))
          case _ => -math.log(lambda0 / (tfn + lambda0))
        }
        boost * d
      }
    }

  /** phrase exact = Σ member exact scorers at phraseFreq (multiSimScorer). */
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    Similarity.sumOf(tss.map(t => exactTermScorer(t, cs, boost)))
}

/** Classic TF-IDF (DefaultSimilarity, default.go:41-119 / tfidf.go):
  * tf = √freq, idf = ln(N/(df+1)) + 1, norm = byte315 decode (not 1/f²),
  * coord = overlap/maxOverlap, queryNorm = 1/√(Σ weights²).
  */
class TfIdfSimilarity extends Similarity {
  def name = "TFIDF"

  private def idf(df: Long, n: Long): Float =
    (math.log(n.toDouble / (df.toDouble + 1)) + 1.0).toFloat

  override def coord(overlap: Int, maxOverlap: Int): Float =
    overlap.toFloat / maxOverlap.toFloat

  override def queryNorm(v: Float): Float =
    (1.0 / math.sqrt(v.toDouble)).toFloat

  override def valueForNormalization(ts: TermStats, cs: CollectionStats, boost: Float): Float = {
    val w = idf(ts.docFreq, cs.maxDoc) * boost
    w * w
  }

  private final class S(idfVal: Float, boost: Float) extends Similarity.Scorer {
    private var queryWeight = idfVal * boost
    private var value = queryWeight * idfVal // weight*idf (normalize(1) default)
    def score(freq: Float, normByte: Byte): Float =
      value * math.sqrt(freq.toDouble).toFloat * SmallFloat.byte315ToFloat(normByte)
    // left-assoc product mirrors score(): (value × tf) × fieldNorm
    override def explainFactors(freq: Float, normByte: Byte): Seq[(String, Float)] =
      Seq(("queryWeight×idf", value),
        ("tf=sqrt(freq)", math.sqrt(freq.toDouble).toFloat),
        ("fieldNorm", SmallFloat.byte315ToFloat(normByte)))
    override def normalize(qn: Float): Similarity.Scorer = {
      val s = new S(idfVal, boost)
      s.queryWeight = idfVal * boost * qn
      s.value = s.queryWeight * idfVal
      s
    }
  }

  override def termScorer(ts: TermStats, cs: CollectionStats, boost: Float): Similarity.Scorer =
    new S(idf(ts.docFreq, cs.maxDoc), boost)

  override def phraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Float): Similarity.Scorer =
    new S(tss.map(t => idf(t.docFreq, cs.maxDoc)).sum, boost)

  // ---- exact-double twin (oracle-reproducible): idf = ln(N/(df+1)) + 1 in
  // float64, fieldNorm = 1/√dl over the TRUE doc length (no byte315 loss),
  // score = ((idf×boost×qn)×idf) × √freq × (1/√dl) left-assoc. ----

  private def idfExactD(df: Long, n: Long): Double =
    math.log(n.toDouble / (df.toDouble + 1)) + 1.0

  override def exactValueForNormalization(ts: TermStats, cs: CollectionStats, boost: Double): Double = {
    val w = idfExactD(ts.docFreq, cs.maxDoc) * boost
    w * w
  }
  override def exactQueryNorm(v: Double): Double = 1.0 / math.sqrt(v)

  private final class ExactS(idfVal: Double, boost: Double, qn: Double)
      extends Similarity.ExactScorer {
    private val value = (idfVal * boost * qn) * idfVal
    def score(freq: Double, dl: Double): Double =
      value * math.sqrt(freq) * (1.0 / math.sqrt(dl))
    override def explainFactors(freq: Double, dl: Double): Seq[(String, Double)] =
      Seq(("queryWeight×idf", value),
        ("tf=sqrt(freq)", math.sqrt(freq)),
        ("fieldNorm=1/sqrt(dl)", 1.0 / math.sqrt(dl)))
    override def normalize(qn2: Double): Similarity.ExactScorer =
      new ExactS(idfVal, boost, qn2)
  }

  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new ExactS(idfExactD(ts.docFreq, cs.maxDoc), boost, 1.0)
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    new ExactS(tss.map(t => idfExactD(t.docFreq, cs.maxDoc)).sum, boost, 1.0)
}

/** Per-field similarity routing (reference PerFieldSimilarityWrapper,
  * perFieldSimilarityWrapper.go): each leaf scores with its field's model.
  * Routing rides on the statistics' `field` tag, so the searcher needs no
  * special-casing; query-level coord/queryNorm come from the default model.
  */
class PerFieldSimilarityWrapper(default: Similarity,
    perField: Map[String, Similarity]) extends Similarity {
  def name = s"PerField(${default.name})"
  def forField(f: String): Similarity = perField.getOrElse(f, default)
  override def termScorer(ts: TermStats, cs: CollectionStats, boost: Float): Similarity.Scorer =
    forField(ts.field).termScorer(ts, cs, boost)
  override def phraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Float): Similarity.Scorer =
    forField(cs.field).phraseScorer(tss, cs, boost)
  override def coord(overlap: Int, maxOverlap: Int): Float = default.coord(overlap, maxOverlap)
  override def queryNorm(v: Float): Float = default.queryNorm(v)
  override def valueForNormalization(ts: TermStats, cs: CollectionStats, boost: Float): Float =
    forField(ts.field).valueForNormalization(ts, cs, boost)
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    forField(ts.field).exactTermScorer(ts, cs, boost)
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer =
    forField(cs.field).exactPhraseScorer(tss, cs, boost)
  override def exactValueForNormalization(ts: TermStats, cs: CollectionStats, boost: Double): Double =
    forField(ts.field).exactValueForNormalization(ts, cs, boost)
  override def exactQueryNorm(v: Double): Double = default.exactQueryNorm(v)
}

/** Arithmetic mean of sub-similarities (multiSimilarity.go:14). */
class MultiSimilarity(subs: Seq[Similarity]) extends Similarity {
  def name = s"Multi(${subs.map(_.name).mkString(",")})"
  override def termScorer(ts: TermStats, cs: CollectionStats, boost: Float): Similarity.Scorer = {
    val ss = subs.map(_.termScorer(ts, cs, boost))
    new Similarity.Scorer {
      def score(freq: Float, normByte: Byte): Float =
        ss.map(_.score(freq, normByte)).sum / ss.size
      override def boundScore(freq: Float, normByte: Byte): Float =
        ss.map(_.boundScore(freq, normByte)).sum / ss.size
    }
  }
  override def phraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Float): Similarity.Scorer = {
    val ss = subs.map(_.phraseScorer(tss, cs, boost))
    new Similarity.Scorer {
      def score(freq: Float, normByte: Byte): Float =
        ss.map(_.score(freq, normByte)).sum / ss.size
      override def boundScore(freq: Float, normByte: Byte): Float =
        ss.map(_.boundScore(freq, normByte)).sum / ss.size
    }
  }
  override def exactTermScorer(ts: TermStats, cs: CollectionStats, boost: Double): Similarity.ExactScorer = {
    val ss = subs.map(_.exactTermScorer(ts, cs, boost))
    new Similarity.ExactScorer {
      def score(freq: Double, dl: Double): Double = ss.map(_.score(freq, dl)).sum / ss.size
      override def boundScore(freq: Double, dl: Double): Double =
        ss.map(_.boundScore(freq, dl)).sum / ss.size
    }
  }
  override def exactPhraseScorer(tss: Seq[TermStats], cs: CollectionStats, boost: Double): Similarity.ExactScorer = {
    val ss = subs.map(_.exactPhraseScorer(tss, cs, boost))
    new Similarity.ExactScorer {
      def score(freq: Double, dl: Double): Double = ss.map(_.score(freq, dl)).sum / ss.size
      override def boundScore(freq: Double, dl: Double): Double =
        ss.map(_.boundScore(freq, dl)).sum / ss.size
    }
  }
}
