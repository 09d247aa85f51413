package graft

import graft.analysis.Analyzer
import graft.codec.SmallFloat
import graft.search._

/** Independent scalar (non-Spark) BM25 oracle: brute-force per-document
  * evaluation straight from the §1.4 SURVEY formulas. Deliberately does NOT
  * share the engine's posting/eval code — only the SmallFloat primitive
  * (itself pinned by its own unit tests) so byte-norm quantization matches.
  */
object Oracle {
  final case class ODoc(docId: Long, freqs: Map[String, Int],
      positions: Map[String, Array[Int]], dl: Int, norm: Byte)

  final class OIndex(val docs: Seq[ODoc]) {
    val maxDoc: Long = docs.size.toLong
    val df: Map[String, Long] =
      docs.flatMap(_.freqs.keys).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val sumTtf: Long = docs.map(_.dl.toLong).sum
    val avgdl: Float = if (sumTtf <= 0) 1.0f else sumTtf.toFloat / maxDoc.toFloat

    def idf(term: String): Float = {
      val d = df.getOrElse(term, 0L).toDouble
      math.log(1.0 + (maxDoc.toDouble - d + 0.5) / (d + 0.5)).toFloat
    }

    private val k1 = 1.2f
    private val b = 0.75f

    private def bm25(weight: Float, freq: Float, normByte: Byte): Float = {
      val dlDecoded = {
        val f = SmallFloat.byte315ToFloat(normByte)
        1.0f / (f * f)
      }
      val norm = dlDecoded / avgdl
      weight * ((freq * (k1 + 1)) / (freq + k1 * (1 - b + b * norm)))
    }

    /** NaN = no match. */
    def score(q: Query, d: ODoc): Float = q match {
      case TermQuery(t, boost, _) =>
        d.freqs.get(t) match {
          case Some(f) => bm25(idf(t) * boost, f.toFloat, d.norm)
          case None => Float.NaN
        }
      case PhraseQuery(ts, boost, _, _) =>
        val pf = phraseFreq(ts, d)
        if (pf > 0) bm25(ts.map(idf).sum * boost, pf.toFloat, d.norm) else Float.NaN
      case BooleanQuery(clauses, msm, boost) =>
        val mustNot = clauses.filter(_.occur == Occur.MUST_NOT)
        if (mustNot.exists(c => !score(scale(c.query, boost), d).isNaN)) return Float.NaN
        var s = 0.0f
        for (c <- clauses.filter(_.occur == Occur.MUST)) {
          val cs = score(scale(c.query, boost), d)
          if (cs.isNaN) return Float.NaN
          s += cs
        }
        var matched = 0
        for (c <- clauses.filter(_.occur == Occur.SHOULD)) {
          val cs = score(scale(c.query, boost), d)
          if (!cs.isNaN) { matched += 1; s += cs }
        }
        if (matched < msm) return Float.NaN
        if (!clauses.exists(_.occur == Occur.MUST) && matched == 0) return Float.NaN
        s
    }

    private def scale(q: Query, b: Float): Query = q match {
      case TermQuery(t, b0, f) => TermQuery(t, b0 * b, f)
      case PhraseQuery(ts, b0, f, sl) => PhraseQuery(ts, b0 * b, f, sl)
      case BooleanQuery(cs, m, b0) => BooleanQuery(cs, m, b0 * b)
    }

    private def phraseFreq(ts: Seq[String], d: ODoc): Int = {
      if (!ts.forall(d.positions.contains)) return 0
      val first = d.positions(ts.head)
      first.count { p =>
        ts.zipWithIndex.tail.forall { case (t, i) => d.positions(t).contains(p + i) }
      }
    }

    def topK(q: Query, k: Int): (Long, Seq[(Long, Float)]) = {
      val hits = docs.flatMap { d =>
        val s = score(q, d)
        if (s.isNaN) None else Some((d.docId, s))
      }
      val sorted = hits.sortWith((a, b) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      (hits.size.toLong, sorted.take(k))
    }
  }

  /** Build the oracle index from (docId, content) pairs with an analyzer. */
  def index(docsWithIds: Seq[(Long, String)], analyzer: Analyzer): OIndex = {
    val odocs = docsWithIds.map { case (id, content) =>
      val a = analyzer(content)
      val freqs = a.tokens.groupBy(_.term).map { case (t, xs) => t -> xs.length }
      val poss = a.tokens.groupBy(_.term).map { case (t, xs) => t -> xs.map(_.pos).sorted }
      val dl = a.length - a.numOverlap
      ODoc(id, freqs, poss, dl, SmallFloat.encodeNorm(a.length, a.numOverlap))
    }
    new OIndex(odocs.sortBy(_.docId))
  }
}
