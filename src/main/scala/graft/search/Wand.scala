package graft.search

import org.apache.spark.sql.functions._

import graft.codec.SmallFloat

/** Block-max-WAND-style pruned top-k (north-star requirement; additive over
  * the reference — Lucene 4.10 predates impacts, /root/repo/SURVEY.md §4.2).
  *
  * Every posting row carries block-max metadata (maxFreq, minDl). For a
  * disjunctive term query, a docId range's score is upper-bounded by the sum
  * of its rows' per-term bounds. Two phases:
  *
  *  1. evaluate the B highest-bound ranges → candidate top-k → threshold τ =
  *     kth score;
  *  2. evaluate only the remaining ranges whose bound exceeds τ.
  *
  * Ranges skipped in phase 2 provably contain no top-k doc, so the returned
  * top-k (docIds AND scores) is identical to the exhaustive search — verified
  * by WandSpec against the exact path. Only totalHits degrades to a lower
  * bound. Both phases read row *metadata* without payloads (Parquet column
  * pruning); payload decode happens only for surviving ranges.
  *
  * Scale: the bounds aggregation shuffles metadata rows only (bytes per row),
  * phase selection is a distributed top-B (TakeOrdered), and surviving-range
  * selection is a broadcast semi-join — nothing driver-side grows with the
  * corpus except the B-entry range list.
  */
object Wand {

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

  /** Pure-disjunction (or single-term) pruned top-k. Falls back to
    * [[IndexSearcher.search]] for query shapes WAND does not cover.
    */
  def searchTopK(searcher: IndexSearcher, q0: Query, k: Int,
      mode: ScoreMode = ScoreMode.Ref32, phase1Ranges: Int = 64): TopDocs = {
    val q = Query.rewrite(q0)
    disjunctionTerms(q) match {
      case None => searcher.search(q, k, mode)
      case Some(termQs) => pruned(searcher, q, termQs, k, mode, phase1Ranges)
    }
  }

  /** Some(term queries) iff q is a TermQuery or a pure SHOULD-of-terms
    * boolean with minShouldMatch ≤ 1 (the shapes where per-range score
    * upper bounds are simply additive).
    */
  private def disjunctionTerms(q: Query): Option[Seq[TermQuery]] = q match {
    case t: TermQuery => Some(Seq(t))
    case BooleanQuery(clauses, msm, boost) if msm <= 1 &&
      clauses.forall(c => c.occur == Occur.SHOULD && c.query.isInstanceOf[TermQuery]) =>
      Some(clauses.map(c => {
        val t = c.query.asInstanceOf[TermQuery]
        TermQuery(t.term, t.boost * boost)
      }))
    case _ => None
  }

  private def pruned(searcher: IndexSearcher, q: Query, termQs: Seq[TermQuery],
      k: Int, mode: ScoreMode, phase1Count: Int): TopDocs = {
    val spark = searcher.sparkSession
    import spark.implicits._
    val cs = searcher.collectionStats
    val stats = searcher.termStats(termQs.map(_.term))
    // per-term scorers for the bound (the ref32 scorer bounds both modes to
    // within quantization; safeByte stepping covers the gap)
    val scorers: Map[String, Similarity.Scorer] = termQs.flatMap { tq =>
      stats.get(tq.term).map(ts =>
        tq.term -> searcher.similarity.termScorer(ts, cs, tq.boost))
    }.toMap
    if (scorers.isEmpty) return TopDocs(0, Array.empty)

    val boundUdf = udf((term: String, maxFreq: Int, minDl: Int) =>
      rowBound(scorers(term), maxFreq, minDl).toDouble)

    val meta = searcher.postingRowsMeta(termQs.map(_.term))
    val bounds = meta
      .withColumn("bound", boundUdf(col("term"), col("maxFreq"), col("minDl")))
      .groupBy("rangeId")
      .agg(sum("bound").as("rangeBound"), sum("docFreq").as("rangePostings"))

    // phase 1: best-bound ranges (distributed TakeOrdered, tiny result)
    val phase1 = bounds.orderBy(col("rangeBound").desc, col("rangeId"))
      .limit(phase1Count).select("rangeId", "rangeBound").as[(Long, Double)].collect()
    val phase1Set = phase1.map(_._1).toSet
    val r1 = searcher.evalRanges(q, mode, Some(phase1Set.toSeq), k)
    if (r1.scoreDocs.length < k) {
      // not enough candidates among the best ranges → exhaustive (rare:
      // k larger than phase-1 coverage)
      return searcher.search(q, k, mode)
    }
    val tau = r1.scoreDocs.last.score

    // phase 2: only ranges that can still beat τ
    val survivors = bounds
      .where(col("rangeBound") > tau && !col("rangeId").isin(phase1Set.toSeq: _*))
      .select("rangeId").as[Long].collect()
    val merged = new BoundedHitQueue(k)
    r1.scoreDocs.foreach(d => merged.insert(d.docId, d.score))
    var total = r1.totalHits
    if (survivors.nonEmpty) {
      val r2 = searcher.evalRanges(q, mode, Some(survivors.toSeq), k)
      r2.scoreDocs.foreach(d => merged.insert(d.docId, d.score))
      total += r2.totalHits
    }
    TopDocs(total, merged.toSortedArray, totalHitsIsLowerBound = true)
  }
}
