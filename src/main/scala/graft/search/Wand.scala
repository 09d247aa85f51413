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
    * encode(1/√minDl) = b, so stepping UP one bucket (b+1) upper-bounds both
    * the Ref32 score of any byte ≤ b and the ExactDouble score of any dl ≥
    * minDl (encode rounds down: decode(b) ≤ 1/√minDl < decode(b+1), hence
    * decodedLen(b+1) < minDl ≤ decodedLen(b)).
    */
  private[search] def rowBound(scorer: Similarity.Scorer, maxFreq: Int, minDl: Int): Float = {
    val b = SmallFloat.floatToByte315(
      (1.0 / math.sqrt(math.max(minDl, 1).toDouble)).toFloat)
    val safeByte = math.min((b & 0xff) + 1, 255).toByte
    scorer.score(maxFreq.toFloat, safeByte)
  }

  /** Flat boolean of term leaves — the shapes WAND covers. */
  private final case class FlatBool(
      must: Seq[TermQuery], should: Seq[TermQuery], mustNot: Seq[TermQuery], msm: Int)

  /** Pruned top-k for term queries and flat booleans of term leaves
    * (MUST/SHOULD/MUST_NOT, any minShouldMatch). Falls back to
    * [[IndexSearcher.search]] for shapes WAND does not cover (phrases,
    * nested booleans).
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
    case BooleanQuery(clauses, msm, boost)
        if clauses.forall(_.query.isInstanceOf[TermQuery]) =>
      def of(o: Occur): Seq[TermQuery] = clauses.collect {
        case BooleanClause(`o`, t: TermQuery) => TermQuery(t.term, t.boost * boost, t.field)
      }
      Some(FlatBool(of(Occur.MUST), of(Occur.SHOULD), of(Occur.MUST_NOT), msm))
    case _ => None
  }

  private def pruned(searcher: IndexSearcher, q: Query, fb: FlatBool,
      k: Int, mode: ScoreMode, phase1Count: Int): TopDocs = {
    val spark = searcher.sparkSession
    import spark.implicits._
    def key(tq: TermQuery): (String, String) = (tq.field.getOrElse(searcher.field), tq.term)
    val scoring = fb.must ++ fb.should
    val stats = searcher.termStats(scoring.map(key).distinct)

    // a missing MUST term ⇒ zero matches anywhere
    if (fb.must.exists(t => !stats.contains(key(t))))
      return TopDocs(0, Array.empty)
    // more SHOULD matches demanded than indexed SHOULD clauses ⇒ zero matches
    if (fb.msm > fb.should.count(t => stats.contains(key(t))))
      return TopDocs(0, Array.empty)

    val sim = searcher.similarity
    // replicate the searcher's queryNorm so TF-IDF-style similarities (qn ≠
    // 1) cannot score above an unnormalized bound; coord ≤ 1 only lowers
    // evaluated scores, so summing unscaled leaf bounds stays safe
    val vSum = scoring.flatMap(tq =>
      stats.get(key(tq)).map(ts =>
        sim.valueForNormalization(ts, searcher.collectionStats(key(tq)._1), tq.boost))).sum
    val qn = sim.queryNorm(math.max(vSum, Float.MinPositiveValue))
    // one scorer PER CLAUSE, grouped by key: a term duplicated across clauses
    // ('+merge merge', repeated SHOULDs with distinct boosts) scores once per
    // clause in Eval, so the per-key bound must SUM its clauses' bounds.
    // Occur matters for SOUNDNESS with negative-scoring models (LM family:
    // the +ln λ background term): a doc matches every MUST clause, so MUST
    // bounds sum raw — but a doc need not match a SHOULD clause, and a
    // non-match contributes 0, so each SHOULD bound clamps at 0 (otherwise a
    // common term's negative bound drags the range below a real doc that
    // matches only the rare term, and the range is wrongly pruned).
    def clauseScorers(tqs: Seq[TermQuery]): Map[(String, String), Seq[Similarity.Scorer]] =
      tqs.filter(tq => stats.contains(key(tq)))
        .groupBy(key)
        .map { case (kk, ts) =>
          kk -> ts.map(tq =>
            sim.termScorer(stats(kk), searcher.collectionStats(kk._1), tq.boost).normalize(qn))
        }
    val mustScorers = clauseScorers(fb.must)
    val shouldScorers = clauseScorers(fb.should)
    val scorers: Map[(String, String), Seq[Similarity.Scorer]] =
      (mustScorers.keySet ++ shouldScorers.keySet).map(kk =>
        kk -> (mustScorers.getOrElse(kk, Nil) ++ shouldScorers.getOrElse(kk, Nil))).toMap
    if (scorers.isEmpty) return TopDocs(0, Array.empty)

    val boundUdf = udf((field: String, term: String, maxFreq: Int, minDl: Int) => {
      val kk = (field, term)
      mustScorers.getOrElse(kk, Nil).map(s => rowBound(s, maxFreq, minDl).toDouble).sum +
        shouldScorers.getOrElse(kk, Nil)
          .map(s => math.max(0.0, rowBound(s, maxFreq, minDl).toDouble)).sum
    })

    // NUL-joined (field, term) key for set membership in column space (an
    // escaped literal, NOT a raw byte — keeps the source text); NUL stays
    // unambiguous even when keyword-field values contain spaces
    val sep = "\u0000"
    def fkey(ks: Seq[(String, String)]): Seq[String] =
      ks.distinct.map { case (f, t) => f + sep + t }
    val mustKeys = fkey(fb.must.map(key))
    val presentShould = fb.should.map(key).filter(stats.contains)
    val shouldKeys = fkey(presentShould)
    // minimum DISTINCT should-keys a doc matching msm CLAUSES must touch:
    // greedy cover by clause multiplicity (all multiplicities 1 → msm itself)
    val minShouldKeys = {
      val mult = presentShould.groupBy(identity).map(_._2.size).toSeq.sortBy(m => -m)
      var covered = 0
      var t = 0
      while (covered < fb.msm && t < mult.size) { covered += mult(t); t += 1 }
      t
    }
    val meta = searcher.postingRowsMeta(scorers.keys.toSeq)
    val byRange = meta
      .withColumn("bound", boundUdf(col("field"), col("term"), col("maxFreq"), col("minDl")))
      .withColumn("fkey", concat_ws(sep, col("field"), col("term")))
      .groupBy("rangeId")
      .agg(
        sum("bound").as("rangeBound"),
        count_distinct(when(col("fkey").isin(mustKeys: _*), col("fkey"))).as("mustPresent"),
        count_distinct(when(col("fkey").isin(shouldKeys: _*), col("fkey"))).as("shouldPresent"))
    // eligibility: a match needs every MUST term and enough SHOULD terms IN
    // THIS RANGE (terms can't match from another range) — conjunction-shape
    // pruning before any τ is known
    val eligible = byRange
      .where(col("mustPresent") === mustKeys.size && col("shouldPresent") >= minShouldKeys)
      .select(col("rangeId"), col("rangeBound"))

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
