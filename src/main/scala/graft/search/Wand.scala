package graft.search

import org.apache.spark.sql.functions._

import graft.codec.SmallFloat

/** Block-max-WAND-style pruned top-k (north-star requirement; additive over
  * the reference — Lucene 4.10 predates impacts, /root/repo/SURVEY.md §4.2).
  *
  * Every posting row carries block-max metadata (maxFreq, minDl). For a flat
  * boolean of term leaves, a docId range's score is upper-bounded by the sum
  * of its rows' per-term bounds; additionally a range can only contain a
  * match if EVERY MUST term has a row there and enough SHOULD terms do (the
  * reference's leapfrog cost-ordering of conjunctionScorer.go:16-40,
  * restated range-wise). Two phases:
  *
  *  1. evaluate the B highest-bound eligible ranges → candidate top-k →
  *     threshold τ = kth score;
  *  2. evaluate only the remaining eligible ranges whose bound reaches τ
  *     (>= — an exactly-attainable bound can hide a tie-break winner).
  *
  * Ranges skipped in phase 2 provably contain no top-k doc, so the returned
  * top-k (docIds AND scores) is identical to the exhaustive search — verified
  * by WandSpec against the exact path. Only totalHits degrades to a lower
  * bound. Both phases read row *metadata* without payloads (Parquet column
  * pruning); payload decode happens only for surviving ranges.
  *
  * Scale: the bounds aggregation shuffles metadata rows only (bytes per row),
  * phase selection is a distributed top-B (TakeOrdered), and surviving-range
  * selection collects at most [[SurvivorCollectMax]] ids — beyond that the
  * survivor set stays distributed and reaches the postings scan as a
  * broadcast LEFT SEMI join, so nothing driver-side grows with the corpus.
  */
object Wand {

  /** Survivor sets up to this size are collected and pushed down as an
    * `isin` (parquet row-group pruning on rangeId); larger sets stay
    * distributed (broadcast semi-join). Bounded constant — never O(corpus).
    */
  val SurvivorCollectMax = 256

  /** Safe per-row upper bound for one term's score within the row's range:
    * freq ≤ maxFreq and dl ≥ minDl. byte315 is monotone INCREASING: a larger
    * byte decodes to a larger norm float, i.e. a SMALLER decoded doc length
    * and a HIGHER BM25 score. Docs in the range carry bytes ≤
    * encode(1/√minDl) = b, so stepping UP one bucket (b+1) upper-bounds the
    * Ref32 score of any byte ≤ b (encode rounds down: decode(b) ≤ 1/√minDl <
    * decode(b+1), hence decodedLen(b+1) < minDl ≤ decodedLen(b)).
    */
  private[search] def rowBound(scorer: Similarity.Scorer, maxFreq: Int, minDl: Int): Float = {
    val b = SmallFloat.floatToByte315(
      (1.0 / math.sqrt(math.max(minDl, 1).toDouble)).toFloat)
    val safeByte = math.min((b & 0xff) + 1, 255).toByte
    scorer.score(maxFreq.toFloat, safeByte)
  }

  /** Mode-matched bound evaluator (advisor round-3 fix: tau and bounds must
    * live in the SAME arithmetic — a float32 bound one ulp below a float64
    * tau could wrongly prune a tie-break winner when the norm-quantization
    * margin vanishes, e.g. b=0).
    */
  private sealed trait BScorer extends Serializable {
    def bound(maxFreq: Int, minDl: Int): Double
  }
  private final case class FloatB(s: Similarity.Scorer) extends BScorer {
    def bound(maxFreq: Int, minDl: Int): Double = rowBound(s, maxFreq, minDl).toDouble
  }
  /** ExactDouble bound: every shipped similarity's exact scorer is monotone
    * nondecreasing in freq and nonincreasing in dl (BM25 family, TF-IDF
    * 1/√dl, LM/DFR/IB length penalties, DFI expectation growth), so
    * score(maxFreq, minDl) bounds score(freq ≤ maxFreq, dl ≥ minDl) in the
    * same float64 arithmetic the evaluation uses.
    */
  private final case class ExactB(s: Similarity.ExactScorer) extends BScorer {
    def bound(maxFreq: Int, minDl: Int): Double =
      s.score(maxFreq.toDouble, math.max(minDl, 1).toDouble)
  }

  /** One scoring clause for range-bound evaluation. Term clauses bound by
    * summing their key's per-row bounds; phrase clauses bound by the phrase
    * scorer at (min over members of the range's maxFreq, max over members of
    * the range's minDl) — a phrase occurrence cannot outnumber its rarest
    * member, and a doc containing every member has dl ≥ each member row's
    * minDl. SHOULD bounds clamp at 0 (a non-matching clause contributes 0);
    * MUST bounds sum raw (negative-scoring LM models).
    */
  private final case class TClause(fkey: String, scorer: BScorer, must: Boolean)
  private final case class PClause(fkeys: Array[String], scorer: BScorer, must: Boolean)

  /** Flat boolean of term AND phrase leaves — the shapes WAND covers. */
  private final case class FlatBool(
      must: Seq[TermQuery], should: Seq[TermQuery], mustNot: Seq[TermQuery], msm: Int,
      mustPhrases: Seq[PhraseQuery] = Nil, shouldPhrases: Seq[PhraseQuery] = Nil)

  /** Pruned top-k for term queries and flat booleans of term/phrase leaves
    * (MUST/SHOULD/MUST_NOT, any minShouldMatch; phrases in MUST/SHOULD).
    * Falls back to [[IndexSearcher.search]] for shapes WAND does not cover
    * (nested booleans, MUST_NOT phrases).
    */
  def searchTopK(searcher: IndexSearcher, q0: Query, k: Int,
      mode: ScoreMode = ScoreMode.Ref32, phase1Ranges: Int = 64): TopDocs = {
    val q = Query.rewrite(q0)
    flatten(q) match {
      case None => searcher.search(q, k, mode)
      case Some(fb) =>
        // every present term df==1 → the searcher's singleton-pulsing path
        // answers with ZERO postings reads; WAND's metadata scan would be
        // strictly more work (stats are cached, so this check is free)
        val keys = Query.leafKeys(q, searcher.field)
        if (searcher.termStats(keys).values.forall(_.docFreq == 1) && keys.nonEmpty)
          searcher.search(q, k, mode)
        else pruned(searcher, q, fb, k, mode, phase1Ranges)
    }
  }

  private def flatten(q: Query): Option[FlatBool] = q match {
    case t: TermQuery => Some(FlatBool(Nil, Seq(t), Nil, 0))
    case p: PhraseQuery => Some(FlatBool(Nil, Nil, Nil, 0, Nil, Seq(p)))
    case BooleanQuery(clauses, msm, boost)
        if clauses.forall(c => c.query.isInstanceOf[TermQuery] ||
          (c.query.isInstanceOf[PhraseQuery] && c.occur != Occur.MUST_NOT)) =>
      def of(o: Occur): Seq[TermQuery] = clauses.collect {
        case BooleanClause(`o`, t: TermQuery) => TermQuery(t.term, t.boost * boost, t.field)
      }
      def pOf(o: Occur): Seq[PhraseQuery] = clauses.collect {
        case BooleanClause(`o`, p: PhraseQuery) => PhraseQuery(p.terms, p.boost * boost, p.field)
      }
      Some(FlatBool(of(Occur.MUST), of(Occur.SHOULD), of(Occur.MUST_NOT), msm,
        pOf(Occur.MUST), pOf(Occur.SHOULD)))
    case _ => None
  }

  private def pruned(searcher: IndexSearcher, q: Query, fb: FlatBool,
      k: Int, mode: ScoreMode, phase1Count: Int): TopDocs = {
    val spark = searcher.sparkSession
    import spark.implicits._
    def key(tq: TermQuery): (String, String) = (tq.field.getOrElse(searcher.field), tq.term)
    def pkeys(p: PhraseQuery): Seq[(String, String)] =
      p.terms.map(t => (p.field.getOrElse(searcher.field), t))
    val termScoring = fb.must ++ fb.should
    val phrases = fb.mustPhrases ++ fb.shouldPhrases
    val allKeys = (termScoring.map(key) ++ phrases.flatMap(pkeys)).distinct
    val stats = searcher.termStats(allKeys)
    def phrasePresent(p: PhraseQuery): Boolean = pkeys(p).forall(stats.contains)

    // a missing MUST term / phrase member => zero matches anywhere
    if (fb.must.exists(t => !stats.contains(key(t))))
      return TopDocs(0, Array.empty)
    if (fb.mustPhrases.exists(p => !phrasePresent(p)))
      return TopDocs(0, Array.empty)
    // more SHOULD matches demanded than matchable SHOULD clauses => zero
    if (fb.msm > fb.should.count(t => stats.contains(key(t))) +
        fb.shouldPhrases.count(phrasePresent))
      return TopDocs(0, Array.empty)

    val sim = searcher.similarity
    val exactMode = mode == ScoreMode.ExactDouble
    def cs(f: String) = searcher.collectionStats(f)
    def phraseMemberStats(p: PhraseQuery): Seq[TermStats] = {
      val fn = p.field.getOrElse(searcher.field)
      p.terms.map(t => stats((fn, t)))
    }
    // the searcher compiles a phrase's normalization weight from composite
    // stats (min member df, summed ttf) -- replicate exactly (compile.v/vD)
    def phraseCompositeStats(p: PhraseQuery): TermStats = {
      val ms = phraseMemberStats(p)
      TermStats(p.field.getOrElse(searcher.field), p.terms.mkString(" "),
        ms.map(_.docFreq).min, ms.map(_.totalTermFreq).sum)
    }
    // replicate the searcher's queryNorm so TF-IDF-style similarities (qn !=
    // 1) cannot score above an unnormalized bound; coord <= 1 only lowers
    // evaluated scores, so summing unscaled leaf bounds stays safe
    val qn = sim.queryNorm(math.max(
      termScoring.flatMap(tq => stats.get(key(tq)).map(ts =>
        sim.valueForNormalization(ts, cs(key(tq)._1), tq.boost))).sum +
        phrases.filter(phrasePresent).map(p =>
          sim.valueForNormalization(phraseCompositeStats(p),
            cs(p.field.getOrElse(searcher.field)), p.boost)).sum,
      Float.MinPositiveValue))
    val qnD = sim.exactQueryNorm(math.max(
      termScoring.flatMap(tq => stats.get(key(tq)).map(ts =>
        sim.exactValueForNormalization(ts, cs(key(tq)._1), tq.boost.toDouble))).sum +
        phrases.filter(phrasePresent).map(p =>
          sim.exactValueForNormalization(phraseCompositeStats(p),
            cs(p.field.getOrElse(searcher.field)), p.boost.toDouble)).sum,
      Double.MinPositiveValue))

    // mode-matched bounds (advisor round-3 fix): ExactDouble evaluation gets
    // float64 bounds from the exact scorers; Ref32 keeps the safe-byte
    // float32 bound. tau and bound then share one arithmetic.
    def termB(tq: TermQuery): BScorer = {
      val kk = key(tq)
      if (exactMode)
        ExactB(sim.exactTermScorer(stats(kk), cs(kk._1), tq.boost.toDouble).normalize(qnD))
      else FloatB(sim.termScorer(stats(kk), cs(kk._1), tq.boost).normalize(qn))
    }
    def phraseB(p: PhraseQuery): BScorer = {
      val fn = p.field.getOrElse(searcher.field)
      if (exactMode)
        ExactB(sim.exactPhraseScorer(phraseMemberStats(p), cs(fn), p.boost.toDouble).normalize(qnD))
      else FloatB(sim.phraseScorer(phraseMemberStats(p), cs(fn), p.boost).normalize(qn))
    }

    // NUL-joined (field, term) key (an escaped literal, NOT a raw byte --
    // keeps the source text); NUL stays unambiguous even when keyword-field
    // values contain spaces
    val sep = "\u0000"
    def fkey(kk: (String, String)): String = kk._1 + sep + kk._2
    // one clause descriptor PER CLAUSE: a term duplicated across clauses
    // ('+merge merge', repeated SHOULDs with distinct boosts) scores once
    // per clause in Eval, so the range bound must SUM its clauses' bounds.
    // Occur matters for SOUNDNESS with negative-scoring models (LM family:
    // the +ln lambda background term): MUST bounds sum raw, SHOULD bounds
    // clamp at 0 (a non-matching clause contributes 0 -- a common term's
    // negative bound must not drag the range below a real doc matching only
    // the rare term).
    val tClauses: Seq[TClause] =
      fb.must.filter(t => stats.contains(key(t)))
        .map(t => TClause(fkey(key(t)), termB(t), must = true)) ++
        fb.should.filter(t => stats.contains(key(t)))
          .map(t => TClause(fkey(key(t)), termB(t), must = false))
    val pClauses: Seq[PClause] =
      fb.mustPhrases.map(p => PClause(pkeys(p).map(fkey).toArray, phraseB(p), must = true)) ++
        fb.shouldPhrases.filter(phrasePresent)
          .map(p => PClause(pkeys(p).map(fkey).toArray, phraseB(p), must = false))
    if (tClauses.isEmpty && pClauses.isEmpty) return TopDocs(0, Array.empty)
    val msm = fb.msm
    val noMust = fb.must.isEmpty && fb.mustPhrases.isEmpty

    // per-range bound + eligibility in ONE pass over the range's metadata
    // rows, collected per range: <= #query keys x #live waves entries of a
    // few bytes each -- a bounded buffer, never O(docs). Eligibility: every
    // MUST term / phrase member present IN THIS RANGE (terms cannot match
    // from another range), enough SHOULD clauses matchable, and -- with no
    // MUST -- at least one scoring clause matchable.
    val sepNum = "\u0001"
    val evalUdf = udf((rows: Seq[String]) => {
      val byKey = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(Int, Int)]]
      rows.foreach { enc =>
        val j2 = enc.lastIndexOf(sepNum)
        val j1 = enc.lastIndexOf(sepNum, j2 - 1)
        byKey.getOrElseUpdate(enc.substring(0, j1),
          scala.collection.mutable.ArrayBuffer.empty) +=
          ((enc.substring(j1 + 1, j2).toInt, enc.substring(j2 + 1).toInt))
      }
      var bound = 0.0
      var eligible = true
      var satisfiable = 0
      tClauses.foreach { c =>
        byKey.get(c.fkey) match {
          case Some(rs) =>
            val b = rs.iterator.map(e => c.scorer.bound(e._1, e._2)).sum
            bound += (if (c.must) b else math.max(0.0, b))
            if (!c.must) satisfiable += 1
          case None => if (c.must) eligible = false
        }
      }
      // phrase range bound: phraseFreq <= min over members of the range's
      // maxFreq; a doc containing EVERY member has dl >= each member's
      // row-min, so max over members' minDl is a valid dl lower bound
      pClauses.foreach { c =>
        if (c.fkeys.forall(byKey.contains)) {
          val maxF = c.fkeys.iterator.map(fk => byKey(fk).iterator.map(_._1).max).min
          val minDl = c.fkeys.iterator.map(fk => byKey(fk).iterator.map(_._2).min).max
          val b = c.scorer.bound(maxF, minDl)
          bound += (if (c.must) b else math.max(0.0, b))
          if (!c.must) satisfiable += 1
        } else if (c.must) eligible = false
      }
      if (satisfiable < msm) eligible = false
      if (noMust && satisfiable == 0) eligible = false
      (bound, eligible)
    })

    val meta = searcher.postingRowsMeta(allKeys.filter(stats.contains))
    val eligible = meta
      .withColumn("enc", concat_ws(sepNum,
        concat_ws(sep, col("field"), col("term")), col("maxFreq"), col("minDl")))
      .groupBy("rangeId")
      .agg(collect_list(col("enc")).as("rows"))
      .select(col("rangeId"), evalUdf(col("rows")).as("be"))
      .where(col("be._2"))
      .select(col("rangeId"), col("be._1").as("rangeBound"))

    // phase 1: best-bound eligible ranges (distributed TakeOrdered, tiny)
    val phase1 = eligible.orderBy(col("rangeBound").desc, col("rangeId"))
      .limit(phase1Count).as[(Long, Double)].collect()
    if (phase1.isEmpty) return TopDocs(0, Array.empty)
    val phase1Set = phase1.map(_._1).toSet
    val r1 = searcher.evalRanges(q, mode, RangeSel.Ids(phase1Set.toSeq), k)
    if (r1.scoreDocs.length < k) {
      // not enough candidates among the best ranges → exhaustive (rare:
      // k larger than phase-1 coverage)
      return searcher.search(q, k, mode)
    }
    val tau = r1.scoreDocs.last.score

    // phase 2: only eligible ranges that can still beat τ. Collect a BOUNDED
    // prefix: small survivor sets get isin pushdown, anything larger stays a
    // distributed DataFrame feeding a broadcast semi-join.
    // bound >= τ, NOT strict >: for norm-insensitive scorers (b=0) the bound
    // is exactly attainable, and a doc scoring exactly τ with a smaller docId
    // wins the (score desc, docId asc) tie-break — strict > would prune it
    // and break 'pruned ≡ exhaustive' (advisor round-2 fix, WandSpec case)
    val survivorsDF = eligible
      .where(col("rangeBound") >= tau && !col("rangeId").isin(phase1Set.toSeq: _*))
      .select("rangeId")
    val probe = survivorsDF.limit(SurvivorCollectMax + 1).as[Long].collect()
    val merged = new BoundedHitQueue(k)
    r1.scoreDocs.foreach(d => merged.insert(d.docId, d.score))
    var total = r1.totalHits
    if (probe.nonEmpty) {
      val sel =
        if (probe.length <= SurvivorCollectMax) RangeSel.Ids(probe.toSeq)
        else RangeSel.Df(survivorsDF)
      val r2 = searcher.evalRanges(q, mode, sel, k)
      r2.scoreDocs.foreach(d => merged.insert(d.docId, d.score))
      total += r2.totalHits
    }
    TopDocs(total, merged.toSortedArray, totalHitsIsLowerBound = true)
  }
}
