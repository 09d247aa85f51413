package graft.search

/** Per-term statistics (reference: /root/reference/core/search/statistics.go:3-25). */
final case class TermStats(field: String, term: String, docFreq: Long, totalTermFreq: Long)

/** Per-field collection statistics. */
final case class CollectionStats(
    field: String,
    maxDoc: Long,
    docCount: Long,
    sumTotalTermFreq: Long,
    sumDocFreq: Long)

/** Scoring models. Each is a pure function family; instances are broadcast
  * into executor-side scoring closures.
  *
  * Two arithmetic modes are provided:
  *  - `Ref` (float32 + byte-quantized norms): bit-parity with the reference
  *    (/root/reference/core/search/similarities/bm25.go:49-58,244-254) — the
  *    rank-identity target.
  *  - `Exact` (float64 + exact doc lengths): the arithmetic an ANSI-SQL
  *    oracle (DuckDB) can reproduce; used by the driver-verified query
  *    surface.
  */
object Bm25 {
  val DefaultK1: Float = 1.2f
  val DefaultB: Float = 0.75f

  /** float32 idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (bm25.go:49-51). */
  def idfRef(docFreq: Long, maxDoc: Long): Float =
    math.log(1.0 + (maxDoc.toDouble - docFreq.toDouble + 0.5) / (docFreq.toDouble + 0.5)).toFloat

  def idfExact(docFreq: Long, maxDoc: Long): Double =
    math.log(1.0 + (maxDoc.toDouble - docFreq.toDouble + 0.5) / (docFreq.toDouble + 0.5))

  /** float32 avgdl = sumTotalTermFreq / maxDoc (bm25.go:98-106; <=0 → 1). */
  def avgdlRef(cs: CollectionStats): Float =
    if (cs.sumTotalTermFreq <= 0) 1.0f else cs.sumTotalTermFreq.toFloat / cs.maxDoc.toFloat

  def avgdlExact(cs: CollectionStats): Double =
    if (cs.sumTotalTermFreq <= 0) 1.0 else cs.sumTotalTermFreq.toDouble / cs.maxDoc.toDouble

  // (the float32 reference-parity scorer lives in Bm25Similarity — see
  // Similarities.scala; this object keeps the shared formula primitives)

  /** Exact-arithmetic scorer over true doc length — ANSI-SQL-reproducible:
    * idf * (freq*(k1+1)) / (freq + k1*(1 - b + b*dl/avgdl)).
    */
  final class ExactScorer(val weight: Double, avgdl: Double, k1: Double, b: Double)
      extends Similarity.ExactScorer {
    def score(freq: Double, dl: Double): Double =
      weight * ((freq * (k1 + 1)) / (freq + k1 * (1 - b + b * dl / avgdl)))
    /** Factors whose float64 product IN ORDER equals score() exactly
      * (Explanation composition): weight × tfNorm.
      */
    override def explainFactors(freq: Double, dl: Double): Seq[(String, Double)] =
      Seq(("queryWeight(idf×boost)", weight),
        ("tfNorm", (freq * (k1 + 1)) / (freq + k1 * (1 - b + b * dl / avgdl))))
  }

  def exactScorer(ts: TermStats, cs: CollectionStats, k1: Double = 1.2,
      b: Double = 0.75, boost: Double = 1.0): ExactScorer =
    new ExactScorer(idfExact(ts.docFreq, cs.maxDoc) * boost, avgdlExact(cs), k1, b)
}
